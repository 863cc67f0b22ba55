"""Tree-packed triangle storage + recursive Cholesky (ops/treechol.py)."""

import jax.numpy as jnp
import numpy as np
import pytest
import scipy.linalg as sla

from sgdml_tpu.ops import treechol as tc


def _spd(n, seed=0, cond=1e4, dtype=np.float64):
    rng = np.random.default_rng(seed)
    q, _ = np.linalg.qr(rng.normal(size=(n, n)))
    eigs = np.logspace(0, -np.log10(cond), n)
    return (q * eigs) @ q.T


@pytest.mark.parametrize('n,leaf,align', [(16, 4, 1), (60, 16, 4), (63, 9, 9), (128, 32, 8)])
def test_pack_roundtrip(n, leaf, align):
    spec = tc.tree_spec(n, leaf_size=leaf, align=align)
    a = _spd(n, seed=1)
    t = tc.tree_from_dense(jnp.asarray(a), spec)
    back = tc.tree_to_dense(t, spec, full=True)
    np.testing.assert_allclose(back, np.tril(a) + np.tril(a, -1).T, rtol=0, atol=0)


@pytest.mark.parametrize('n,leaf,align', [(16, 4, 1), (60, 16, 4), (63, 9, 9), (120, 24, 8)])
def test_chol_tree_matches_scipy(n, leaf, align):
    spec = tc.tree_spec(n, leaf_size=leaf, align=align)
    a = _spd(n, seed=2)
    t = tc.tree_from_dense(jnp.asarray(a), spec)
    lt = tc.chol_tree(t)
    assert bool(tc.tree_isfinite(lt))
    l_dense = tc.tree_to_dense(lt, spec)
    l_ref = np.linalg.cholesky(a)
    np.testing.assert_allclose(l_dense, l_ref, rtol=1e-10, atol=1e-12)


def test_solve_tree_matches_scipy():
    n, leaf, align = 90, 20, 3
    spec = tc.tree_spec(n, leaf_size=leaf, align=align)
    a = _spd(n, seed=3)
    y = np.random.default_rng(4).normal(size=n)
    t = tc.tree_from_dense(jnp.asarray(a), spec)
    lt = tc.chol_tree(t)
    x = np.asarray(tc.solve_tree(lt, jnp.asarray(y)))
    x_ref = sla.cho_solve(sla.cho_factor(a, lower=True), y)
    np.testing.assert_allclose(x, x_ref, rtol=1e-8, atol=1e-10)


def test_solve_tree_multi_rhs():
    n = 64
    spec = tc.tree_spec(n, leaf_size=16)
    a = _spd(n, seed=5)
    y = np.random.default_rng(6).normal(size=(n, 3))
    lt = tc.chol_tree(tc.tree_from_dense(jnp.asarray(a), spec))
    x = np.asarray(tc.solve_tree(lt, jnp.asarray(y)))
    np.testing.assert_allclose(x, np.linalg.solve(a, y), rtol=1e-8, atol=1e-10)


def test_matvec_tree():
    n = 72
    spec = tc.tree_spec(n, leaf_size=24, align=8)
    a = _spd(n, seed=7)
    v = np.random.default_rng(8).normal(size=n)
    t = tc.tree_from_dense(jnp.asarray(a), spec)
    np.testing.assert_allclose(
        np.asarray(tc.matvec_tree(t, jnp.asarray(v))), a @ v, rtol=1e-10, atol=1e-12
    )


def test_diag_add_and_nan_detection():
    n = 32
    spec = tc.tree_spec(n, leaf_size=8)
    # Indefinite matrix: plain Cholesky must produce NaNs, shifted must work.
    a = _spd(n, seed=9) - 0.5 * np.eye(n)
    t = tc.tree_from_dense(jnp.asarray(a), spec)
    lt_bad = tc.chol_tree(tc.tree_from_dense(jnp.asarray(a), spec))
    assert not bool(tc.tree_isfinite(lt_bad))
    t_shift = tc.tree_diag_add(t, 1.0)
    lt_ok = tc.chol_tree(t_shift)
    assert bool(tc.tree_isfinite(lt_ok))
    x = np.asarray(tc.solve_tree(lt_ok, jnp.ones(n)))
    np.testing.assert_allclose(
        (a + np.eye(n)) @ x, np.ones(n), rtol=1e-8, atol=1e-10
    )


def test_f32_factor_solves_f64_system_via_refinement():
    """The production pattern: f32 factor as preconditioner, f64 residual
    refinement recovers (near-)f64 accuracy when cond is moderate."""
    n = 96
    spec = tc.tree_spec(n, leaf_size=32)
    a = _spd(n, seed=10, cond=1e5)
    y = np.random.default_rng(11).normal(size=n)
    t32 = tc.tree_from_dense(jnp.asarray(a, dtype=jnp.float32), spec)
    l32 = tc.chol_tree(t32)

    x = np.zeros(n)
    for _ in range(8):
        r = y - a @ x  # f64 residual
        dx = np.asarray(
            tc.solve_tree(l32, jnp.asarray(r, dtype=jnp.float32))
        ).astype(np.float64)
        x = x + dx
    x_ref = np.linalg.solve(a, y)
    err = np.linalg.norm(x - x_ref) / np.linalg.norm(x_ref)
    assert err < 1e-9, err


def test_nbytes():
    spec = tc.tree_spec(1024, leaf_size=128)
    dense = 1024 * 1024 * 4
    packed = tc.tree_nbytes(spec, 4)
    assert packed < 0.6 * dense
