"""End-to-end training tests: split parity, alpha parity with the
reference's analytic solve, and full train->predict accuracy."""

import pathlib

import numpy as np
import pytest

from sgdml_tpu.train import GDMLTrain
from sgdml_tpu.utils import io

GOLDEN = pathlib.Path(__file__).parent / 'golden'


def _fixture():
    fix = GOLDEN / 'train_predict_ref.npz'
    if not fix.exists():
        pytest.skip('golden fixture not generated')
    return np.load(fix, allow_pickle=True)


def _dataset(data):
    ds = {
        'type': 'd',
        'name': np.array('synth5'),
        'theory': np.array('morse'),
        'z': data['z'],
        'R': data['R'],
        'E': data['E'],
        'F': data['F'],
    }
    ds['md5'] = io.dataset_md5(ds)
    return ds


def test_stratified_split_parity_with_reference():
    """Same seed -> identical train split as the reference sampler."""
    data = _fixture()
    ds = _dataset(data)
    trainer = GDMLTrain()
    np.random.seed(7)
    task = trainer.create_task(
        ds, 30, ds, 20, sig=4.0, lam=1e-10, use_sym=False, use_E=True
    )
    np.testing.assert_array_equal(
        np.sort(task['idxs_train']), np.sort(data['idxs_train'])
    )
    # Exact order parity too (same RNG call sequence).
    np.testing.assert_array_equal(task['idxs_train'], data['idxs_train'])


def test_train_alpha_and_prediction_parity():
    """Full train on the fixture's split reproduces the reference's
    coefficients, std, integration constant and predictions."""
    data = _fixture()
    ds = _dataset(data)
    trainer = GDMLTrain()
    np.random.seed(7)
    task = trainer.create_task(
        ds, 30, ds, 20, sig=4.0, lam=1e-10, use_sym=False, use_E=True
    )
    model = trainer.train(task, solver='analytic')

    np.testing.assert_allclose(model['std'], data['std'], rtol=1e-12)
    # Alphas: ill-conditioned system (lam=1e-10) -> compare predictions,
    # which are the well-conditioned observable, plus loose alpha check.
    ref_alphas = data['alphas_F']
    scale = np.abs(ref_alphas).max()
    assert np.abs(model['alphas_F'] - ref_alphas).max() / scale < 1e-4

    np.testing.assert_allclose(model['c'], data['c'], rtol=1e-5)

    from sgdml_tpu.predict import GDMLPredict

    pred = GDMLPredict(model)
    E, F = pred.predict(data['R_test'])
    np.testing.assert_allclose(E, data['e_pred'], rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(F, data['f_pred'], rtol=1e-5, atol=1e-7)


def test_train_force_accuracy_on_holdout():
    """Trained model must actually reconstruct the synthetic force field."""
    data = _fixture()
    ds = _dataset(data)
    trainer = GDMLTrain()
    np.random.seed(11)
    task = trainer.create_task(
        ds, 40, ds, 20, sig=4.0, lam=1e-12, use_sym=False, use_E=True
    )
    model = trainer.train(task, solver='analytic')

    from sgdml_tpu.predict import GDMLPredict

    pred = GDMLPredict(model)
    test_idxs = np.setdiff1d(np.arange(len(ds['R'])), task['idxs_train'])[:50]
    E, F = pred.predict(ds['R'][test_idxs].reshape(len(test_idxs), -1))

    f_ref = ds['F'][test_idxs].reshape(len(test_idxs), -1)
    f_mae = np.abs(F - f_ref).mean()
    f_scale = np.abs(f_ref).mean()
    assert f_mae < 0.05 * f_scale, f'force MAE {f_mae} vs scale {f_scale}'

    e_mae = np.abs(E - ds['E'][test_idxs]).mean()
    assert e_mae < 0.02, f'energy MAE {e_mae}'


def test_use_E_cstr_training_runs():
    data = _fixture()
    ds = _dataset(data)
    trainer = GDMLTrain()
    np.random.seed(3)
    task = trainer.create_task(
        ds, 25, ds, 10, sig=4.0, lam=1e-10, use_sym=False, use_E=True,
        use_E_cstr=True,
    )
    model = trainer.train(task, solver='analytic')
    assert 'alphas_E' in model
    from sgdml_tpu.predict import GDMLPredict

    pred = GDMLPredict(model)
    E, F = pred.predict(data['R_test'])
    e_mae = np.abs(E - data['E'][100:120]).mean()
    assert e_mae < 0.1, f'energy MAE with E constraints {e_mae}'


def test_model_npz_roundtrip(tmp_path):
    data = _fixture()
    ds = _dataset(data)
    trainer = GDMLTrain()
    np.random.seed(5)
    task = trainer.create_task(
        ds, 20, ds, 10, sig=4.0, use_sym=False, use_E=True
    )
    model = trainer.train(task, solver='analytic')

    path = str(tmp_path / 'model.npz')
    io.save_dict(path, model)
    model2 = io.load_dict(path)
    assert io.is_model(model2)

    from sgdml_tpu.predict import GDMLPredict

    p1 = GDMLPredict(model)
    p2 = GDMLPredict(model2)
    E1, F1 = p1.predict(data['R_test'][:4])
    E2, F2 = p2.predict(data['R_test'][:4])
    np.testing.assert_allclose(E1, E2, rtol=1e-12)
    np.testing.assert_allclose(F1, F2, rtol=1e-12)
