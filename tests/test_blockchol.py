"""Block-grid packed Cholesky (ops/blockchol.py)."""

import jax.numpy as jnp
import numpy as np
import pytest
import scipy.linalg as sla

from sgdml_tpu.ops import blockchol as bc


def _spd(n, seed=0, cond=1e4):
    rng = np.random.default_rng(seed)
    q, _ = np.linalg.qr(rng.normal(size=(n, n)))
    eigs = np.logspace(0, -np.log10(cond), n)
    return (q * eigs) @ q.T


@pytest.mark.parametrize('n,k', [(24, 2), (60, 5), (63, 3), (128, 4)])
def test_pack_roundtrip(n, k):
    spec = bc.GridSpec(n, k)
    a = _spd(n, seed=1)
    g = bc.grid_from_dense(jnp.asarray(a), spec)
    back = bc.grid_to_dense(g, spec, full=True)
    np.testing.assert_allclose(back, np.tril(a) + np.tril(a, -1).T)


@pytest.mark.parametrize('n,k', [(24, 2), (60, 5), (63, 3), (120, 4)])
def test_chol_grid_matches_numpy(n, k):
    spec = bc.GridSpec(n, k)
    a = _spd(n, seed=2)
    lg = bc.chol_grid(bc.grid_from_dense(jnp.asarray(a), spec))
    assert bool(bc.grid_isfinite(lg))
    np.testing.assert_allclose(
        bc.grid_to_dense(lg, spec), np.linalg.cholesky(a),
        rtol=1e-10, atol=1e-12,
    )


def test_solve_grid_matches_scipy():
    n, k = 90, 3
    spec = bc.GridSpec(n, k)
    a = _spd(n, seed=3)
    y = np.random.default_rng(4).normal(size=n)
    lg = bc.chol_grid(bc.grid_from_dense(jnp.asarray(a), spec))
    x = np.asarray(bc.solve_grid(lg, jnp.asarray(y)))
    np.testing.assert_allclose(
        x, sla.cho_solve(sla.cho_factor(a, lower=True), y),
        rtol=1e-8, atol=1e-10,
    )


def test_solve_grid_multi_rhs_and_matvec():
    n, k = 64, 4
    spec = bc.GridSpec(n, k)
    a = _spd(n, seed=5)
    y = np.random.default_rng(6).normal(size=(n, 3))
    g = bc.grid_from_dense(jnp.asarray(a), spec)
    np.testing.assert_allclose(
        np.asarray(bc.matvec_grid(g, jnp.asarray(y))), a @ y,
        rtol=1e-10, atol=1e-12,
    )
    lg = bc.chol_grid(g)
    x = np.asarray(bc.solve_grid(lg, jnp.asarray(y)))
    np.testing.assert_allclose(x, np.linalg.solve(a, y), rtol=1e-8, atol=1e-10)


def test_diag_add_and_nan_detection():
    n, k = 32, 2
    spec = bc.GridSpec(n, k)
    a = _spd(n, seed=9) - 0.5 * np.eye(n)
    g = bc.grid_from_dense(jnp.asarray(a), spec)
    bad = bc.chol_grid(bc.grid_from_dense(jnp.asarray(a), spec))
    assert not bool(bc.grid_isfinite(bad))
    ok = bc.chol_grid(bc.grid_diag_add(g, 1.0))
    assert bool(bc.grid_isfinite(ok))


def test_grid_spec_alignment():
    spec = bc.grid_spec(63 * 24, target_block=200, align=63)
    assert spec.n == 63 * 24 and spec.b % 63 == 0 and spec.k * spec.b == spec.n


def test_assemble_grid_matches_dense():
    from sgdml_tpu.datasets.synthetic import generate_md_dataset
    from sgdml_tpu.ops.descriptor import descriptor_batch
    from sgdml_tpu.ops.kernel import assemble_kernel, assemble_kernel_grid

    n_atoms, m, sig = 5, 14, 4.0
    ds = generate_md_dataset(n_atoms=n_atoms, n_frames=m + 4, seed=3)
    X, Jc = descriptor_batch(jnp.asarray(ds['R'][:m].reshape(m, -1)), n_atoms)
    dperms = np.arange((n_atoms * (n_atoms - 1)) // 2)[None, :]
    dim_i = 3 * n_atoms
    m_pad = 16
    spec = bc.GridSpec(m_pad * dim_i, 4)  # blocks of 4 points
    G = assemble_kernel_grid(
        X, Jc, dperms, sig, n_atoms, spec, dtype=jnp.float64,
        tile_i=3, tile_j=5,  # non-dividing tiles (clamp regression)
    )
    A = bc.grid_to_dense(G, spec, full=True)
    K = np.asarray(assemble_kernel(X, Jc, dperms, sig, n_atoms))
    n = m * dim_i
    np.testing.assert_allclose(A[:n, :n], -K, rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(A[n:, n:], np.eye(m_pad * dim_i - n))
    assert np.all(A[n:, :n] == 0)
