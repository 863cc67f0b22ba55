"""Multi-device tests on the virtual 8-device CPU mesh: sharded assembly
equals single-device assembly; sharded prediction equals single-device
prediction; the full multi-chip training step runs and solves."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sgdml_tpu.datasets.synthetic import generate_md_dataset
from sgdml_tpu.ops import descriptor as desc_ops
from sgdml_tpu.ops import kernel as ker
from sgdml_tpu.parallel.mesh import default_mesh
from sgdml_tpu.parallel import spmd
from sgdml_tpu.predict import build_tables, predict_from_tables
from sgdml_tpu.train import desc_perm_table


@pytest.fixture(scope='module')
def mesh():
    assert jax.device_count() >= 8, 'conftest must provide 8 virtual devices'
    return default_mesh(8)


@pytest.fixture(scope='module')
def setup():
    ds = generate_md_dataset(n_atoms=5, n_frames=60, seed=9)
    n_atoms = 5
    R = ds['R'][:20].reshape(20, -1)
    X, Jc = desc_ops.descriptor_batch(jnp.asarray(R), n_atoms)
    perms = np.stack([np.arange(n_atoms), [1, 0, 2, 3, 4]])
    dperms = desc_perm_table(perms)
    return ds, n_atoms, X, Jc, perms, dperms


def test_sharded_assembly_matches_single(mesh, setup):
    ds, n_atoms, X, Jc, perms, dperms = setup
    sig = 5.0
    K1 = np.asarray(ker.assemble_kernel(X, Jc, dperms, sig, n_atoms))
    K8 = np.asarray(
        spmd.assemble_kernel_sharded(X, Jc, dperms, sig, n_atoms, mesh, tile_j=4)
    )
    np.testing.assert_allclose(K8, K1, rtol=1e-12, atol=1e-14)


def test_sharded_predict_matches_single(mesh, setup):
    ds, n_atoms, X, Jc, perms, dperms = setup
    sig, std, c = 5.0, 1.3, -2.0
    rng = np.random.default_rng(0)
    JA_flat = jnp.asarray(rng.normal(size=(X.shape[0], X.shape[1])))
    Xt, JA = build_tables(X, JA_flat, dperms)

    E1, F1 = predict_from_tables(
        X, Jc, Xt, JA, None, sig, std, c, n_atoms=n_atoms
    )
    E8, F8 = spmd.predict_sharded(X, Jc, Xt, JA, sig, std, c, n_atoms, mesh)
    np.testing.assert_allclose(np.asarray(E8), np.asarray(E1), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(F8), np.asarray(F1), rtol=1e-12)


def test_multichip_train_step(mesh, setup):
    """Full sharded training step: runs, converges, and its model tables
    reproduce the labels (training-set fit)."""
    ds, n_atoms, X, Jc, perms, dperms = setup
    m = 24
    R = ds['R'][:m]
    F = ds['F'][:m]
    out = spmd.train_step_sharded(
        R, F, perms, sig=5.0, lam=1e-10, n_atoms=n_atoms, mesh=mesh,
        cg_iters=400,
    )
    assert np.isfinite(np.asarray(out['alphas_F'])).all()

    # Training-set forces should be reproduced by the fitted model.
    Xt, JA = build_tables(out['R_desc'], out['R_d_desc_alpha'], dperms)
    Xq, Jcq = desc_ops.descriptor_batch(jnp.asarray(R.reshape(m, -1)), n_atoms)
    E, F_pred = predict_from_tables(
        Xq, Jcq, Xt, JA, None, 5.0, out['std'], 0.0, n_atoms=n_atoms
    )
    f_ref = F.reshape(m, -1)
    rel = np.abs(np.asarray(F_pred) - f_ref).mean() / np.abs(f_ref).mean()
    assert rel < 0.05, rel


def test_multichip_train_step_cholesky(mesh, setup):
    """Distributed blocked-Cholesky training step matches the CG step."""
    ds, n_atoms, X, Jc, perms, dperms = setup
    m = 16
    out = spmd.train_step_sharded(
        ds['R'][:m], ds['F'][:m], perms, sig=5.0, lam=1e-10,
        n_atoms=n_atoms, mesh=mesh, solver='cholesky',
    )
    a1 = np.asarray(out['alphas_F'])
    assert np.isfinite(a1).all()

    # Exact single-device reference: assemble + dense Cholesky solve.
    import jax.numpy as jnp

    from sgdml_tpu.ops import descriptor as desc_ops
    from sgdml_tpu.ops import kernel as ker
    from sgdml_tpu.solvers.analytic import _cho_solve_neg

    Xm, Jcm = desc_ops.descriptor_batch(
        jnp.asarray(ds['R'][:m].reshape(m, -1)), n_atoms
    )
    K = ker.assemble_kernel(Xm, Jcm, dperms, 5.0, n_atoms)
    y = ds['F'][:m].reshape(-1)
    y = y / y.std()
    a_ref, ok = _cho_solve_neg(K, jnp.asarray(y), 1e-10)
    assert bool(ok)
    a_ref = np.asarray(a_ref)
    rel = np.abs(a1 - a_ref).max() / np.abs(a_ref).max()
    assert rel < 1e-6, rel
