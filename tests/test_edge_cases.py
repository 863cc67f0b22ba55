"""Edge cases: periodic boundary conditions end-to-end, no-energy
training, force-only datasets, single-geometry predict, CLI resume."""

import numpy as np
import pytest

from sgdml_tpu.datasets.synthetic import generate_md_dataset
from sgdml_tpu.predict import GDMLPredict
from sgdml_tpu.train import GDMLTrain
from sgdml_tpu.utils import io


@pytest.fixture(scope='module')
def ds():
    return generate_md_dataset(n_atoms=5, n_frames=300, seed=12)


def test_pbc_large_box_matches_open_boundary(ds):
    """With a box much larger than the molecule, min-image results must
    equal open-boundary results — exercises the full PBC path."""
    ds_pbc = dict(ds)
    ds_pbc['lattice'] = np.eye(3) * 500.0
    ds_pbc['md5'] = io.dataset_md5(ds_pbc)

    trainer = GDMLTrain()
    np.random.seed(5)
    task_open = trainer.create_task(ds, 25, ds, 10, sig=5.0, use_sym=False)
    np.random.seed(5)
    task_pbc = trainer.create_task(
        ds_pbc, 25, ds_pbc, 10, sig=5.0, use_sym=False
    )
    assert 'lattice' in task_pbc

    m_open = trainer.train(task_open, solver='analytic')
    m_pbc = trainer.train(task_pbc, solver='analytic')
    assert 'lattice' in m_pbc

    R_test = ds['R'][100:110].reshape(10, -1)
    E1, F1 = GDMLPredict(m_open).predict(R_test)
    E2, F2 = GDMLPredict(m_pbc).predict(R_test)
    np.testing.assert_allclose(E2, E1, rtol=1e-8)
    np.testing.assert_allclose(F2, F1, rtol=1e-7, atol=1e-10)


def test_train_without_energy_labels(ds):
    """use_E=False: model predicts forces; energies carry an unknown
    integration constant (c stays 0)."""
    trainer = GDMLTrain()
    np.random.seed(6)
    task = trainer.create_task(
        ds, 30, ds, 10, sig=5.0, use_sym=False, use_E=False
    )
    assert 'E_train' not in task
    model = trainer.train(task, solver='analytic')
    assert not model['use_E']
    assert 'e_err' not in model

    pred = GDMLPredict(model)
    ti = np.setdiff1d(np.arange(len(ds['R'])), task['idxs_train'])[:20]
    _, F = pred.predict(ds['R'][ti].reshape(len(ti), -1))
    f_ref = ds['F'][ti].reshape(len(ti), -1)
    assert np.abs(F - f_ref).mean() < 0.1 * np.abs(f_ref).mean()


def test_dataset_without_energies(ds):
    """Datasets lacking E entirely use random (non-stratified) sampling."""
    ds_noE = {k: v for k, v in ds.items() if k != 'E'}
    ds_noE['md5'] = io.dataset_md5(ds_noE)
    trainer = GDMLTrain()
    np.random.seed(7)
    task = trainer.create_task(
        ds_noE, 20, ds_noE, 10, sig=5.0, use_sym=False, use_E=False
    )
    model = trainer.train(task, solver='analytic')
    _, F = GDMLPredict(model).predict(ds['R'][:5].reshape(5, -1))
    assert np.isfinite(F).all()


def test_single_geometry_prediction(ds):
    trainer = GDMLTrain()
    np.random.seed(8)
    task = trainer.create_task(ds, 20, ds, 10, sig=5.0, use_sym=False)
    model = trainer.train(task, solver='analytic')
    pred = GDMLPredict(model)
    # (3N,) raveled single geometry, like the ASE calculator path.
    E, F = pred.predict(ds['R'][42].ravel())
    assert E.shape == (1,) and F.shape == (1, 15)


def test_cli_resume_roundtrip(ds, tmp_path, monkeypatch):
    """Train a CG model, resume it via the CLI, confirm it stays converged
    and provenance-checked."""
    from sgdml_tpu import cli

    monkeypatch.chdir(tmp_path)
    ds_path = str(tmp_path / 'ds.npz')
    io.save_dict(ds_path, ds)

    trainer = GDMLTrain()
    np.random.seed(9)
    task = trainer.create_task(ds, 30, ds, 10, sig=6.0, use_sym=False)
    model = trainer.train(task, solver='cg')
    model_path = str(tmp_path / 'model.npz')
    io.save_dict(model_path, model)

    cli.main(['resume', model_path, ds_path, '--out',
              str(tmp_path / 'resumed.npz')])
    resumed = io.load_dict(str(tmp_path / 'resumed.npz'))
    assert resumed['solver_resid'] <= resumed['solver_tol'] * resumed[
        'norm_y_train'
    ]

    # Wrong dataset -> provenance rejection.
    ds_other = generate_md_dataset(n_atoms=5, n_frames=50, seed=99)
    other_path = str(tmp_path / 'other.npz')
    io.save_dict(other_path, ds_other)
    with pytest.raises(ValueError, match='fingerprint'):
        cli.main(['resume', model_path, other_path])
