"""Iterative (Nystrom-pCG) solver tests: agreement with the analytic
solver's predictions, convergence, and warm-started resume."""

import numpy as np
import pytest

from sgdml_tpu.datasets.synthetic import generate_md_dataset
from sgdml_tpu.predict import GDMLPredict
from sgdml_tpu.train import GDMLTrain


@pytest.fixture(scope='module')
def ds():
    return generate_md_dataset(n_atoms=6, n_frames=400, seed=4)


@pytest.fixture(scope='module')
def models(ds):
    trainer = GDMLTrain()
    np.random.seed(21)
    task = trainer.create_task(
        ds, 60, ds, 20, sig=8.0, lam=1e-10, use_sym=False, use_E=True
    )
    m_analytic = trainer.train(dict(task), solver='analytic')
    np.random.seed(22)
    m_cg = trainer.train(dict(task), solver='cg')
    return task, m_analytic, m_cg


def test_cg_converges(models):
    _, _, m_cg = models
    assert m_cg['solver_resid'] <= m_cg['solver_tol'] * m_cg['norm_y_train']


def test_cg_matches_analytic_predictions(ds, models):
    task, m_analytic, m_cg = models
    ti = np.setdiff1d(np.arange(len(ds['R'])), task['idxs_train'])[:40]
    R_test = ds['R'][ti].reshape(len(ti), -1)

    Ea, Fa = GDMLPredict(m_analytic).predict(R_test)
    Ec, Fc = GDMLPredict(m_cg).predict(R_test)

    f_scale = np.abs(Fa).mean()
    assert np.abs(Fc - Fa).mean() / f_scale < 5e-3
    assert np.abs((Ec - Ec.mean()) - (Ea - Ea.mean())).mean() < 1e-2


def test_cg_force_accuracy(ds, models):
    task, _, m_cg = models
    ti = np.setdiff1d(np.arange(len(ds['R'])), task['idxs_train'])[:40]
    _, F = GDMLPredict(m_cg).predict(ds['R'][ti].reshape(len(ti), -1))
    f_ref = ds['F'][ti].reshape(len(ti), -1)
    mae = np.abs(F - f_ref).mean()
    assert mae < 0.08 * np.abs(f_ref).mean(), mae


def test_resume_warm_start(ds, models):
    """create_task_from_model -> train continues from stored alphas and
    converges in fewer iterations than from scratch."""
    task, _, m_cg = models
    trainer = GDMLTrain()
    resumed_task = trainer.create_task_from_model(m_cg, ds)
    assert 'alphas0_F' in resumed_task
    np.random.seed(23)
    m2 = trainer.train(resumed_task, solver='cg')
    # Warm-started from a converged solution: should converge immediately.
    assert m2['solver_iters'] - m_cg['solver_iters'] <= 5
    assert m2['solver_resid'] <= m2['solver_tol'] * m2['norm_y_train']


def test_column_assembly_with_E_rows(ds):
    """K[:, force cols] with energy rows appended matches the full
    E-constrained assembly."""
    import jax.numpy as jnp

    from sgdml_tpu.ops import descriptor as desc_ops, kernel as ker
    from sgdml_tpu.train import desc_perm_table

    n_atoms = 6
    R = ds['R'][:8].reshape(8, -1)
    X, Jc = desc_ops.descriptor_batch(jnp.asarray(R), n_atoms)
    dperms = desc_perm_table(np.arange(n_atoms)[None])
    sig = 6.0
    K = np.asarray(
        ker.assemble_kernel(X, Jc, dperms, sig, n_atoms, use_E_cstr=True)
    )
    cols = np.array([0, 17, 55, 100, 143])
    K_cols = np.asarray(
        ker.assemble_kernel_columns(
            X, Jc, dperms, sig, n_atoms, cols, use_E_cstr=True
        )
    )
    np.testing.assert_allclose(K_cols, K[:, cols], rtol=1e-9, atol=1e-12)


def test_cg_with_energy_constraints(ds):
    """Iterative solve with use_E_cstr matches the analytic E-constrained
    solution's predictions."""
    from sgdml_tpu.predict import GDMLPredict
    from sgdml_tpu.train import GDMLTrain

    trainer = GDMLTrain()
    np.random.seed(31)
    task = trainer.create_task(
        ds, 40, ds, 10, sig=8.0, lam=1e-10, use_sym=False, use_E=True,
        use_E_cstr=True,
    )
    m_a = trainer.train(dict(task), solver='analytic')
    np.random.seed(32)
    m_c = trainer.train(dict(task), solver='cg')
    assert 'alphas_E' in m_c

    ti = np.setdiff1d(np.arange(len(ds['R'])), task['idxs_train'])[:30]
    R_test = ds['R'][ti].reshape(len(ti), -1)
    Ea, Fa = GDMLPredict(m_a).predict(R_test)
    Ec, Fc = GDMLPredict(m_c).predict(R_test)
    assert np.abs(Fc - Fa).mean() / np.abs(Fa).mean() < 1e-2
    assert np.abs(Ec - Ea).mean() < 5e-2
