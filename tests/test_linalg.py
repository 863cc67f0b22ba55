"""Blocked Cholesky / triangular-solve tests, single-device and sharded."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sgdml_tpu.ops import linalg


def _spd(rng, n):
    A = rng.normal(size=(n, n))
    return A @ A.T + n * np.eye(n)


def test_blocked_cholesky_matches_dense(rng):
    A = jnp.asarray(_spd(rng, 96))
    L1 = np.asarray(jnp.linalg.cholesky(A))
    L2 = np.asarray(linalg.blocked_cholesky(A, nb=32))
    np.testing.assert_allclose(L2, L1, rtol=1e-10, atol=1e-10)


def test_blocked_tri_solve(rng):
    A = jnp.asarray(_spd(rng, 64))
    L = jnp.linalg.cholesky(A)
    b = jnp.asarray(rng.normal(size=64))
    y1 = np.asarray(jax.scipy.linalg.solve_triangular(L, b, lower=True))
    y2 = np.asarray(linalg.blocked_tri_solve(L, b, nb=16))
    np.testing.assert_allclose(y2, y1, rtol=1e-10)

    z1 = np.asarray(
        jax.scipy.linalg.solve_triangular(L.T, b, lower=False)
    )
    z2 = np.asarray(linalg.blocked_tri_solve(L, b, nb=16, trans=True))
    np.testing.assert_allclose(z2, z1, rtol=1e-10)


def test_cho_solve_blocked_unaligned(rng):
    n = 70  # not a multiple of nb
    A = jnp.asarray(_spd(rng, n))
    b = jnp.asarray(rng.normal(size=n))
    x1 = np.asarray(jnp.linalg.solve(A, b))
    x2 = np.asarray(linalg.cho_solve_blocked(A, b, nb=32))
    np.testing.assert_allclose(x2, x1, rtol=1e-8)


def test_blocked_cholesky_sharded(rng):
    """Row-sharded input over the 8-device mesh gives the identical factor."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from sgdml_tpu.parallel.mesh import default_mesh

    mesh = default_mesh(8)
    n = 128
    A = jnp.asarray(_spd(rng, n))
    A_sharded = jax.device_put(A, NamedSharding(mesh, P('dev', None)))

    L_ref = np.asarray(linalg.blocked_cholesky(A, nb=16))
    L_sh = np.asarray(linalg.blocked_cholesky(A_sharded, nb=16))
    np.testing.assert_allclose(L_sh, L_ref, rtol=1e-11, atol=1e-11)

    b = jnp.asarray(rng.normal(size=n))
    x_ref = np.asarray(jnp.linalg.solve(A, b))
    x_sh = np.asarray(linalg.cho_solve_blocked(A_sharded, b, nb=16))
    np.testing.assert_allclose(x_sh, x_ref, rtol=1e-8)


def test_cho_solve_blocked_2d_mesh():
    """Blocked Cholesky under a 2-D mesh sharding (P('r','c') matrix):
    GSPMD partitions the panel solves and rank-nb updates over both axes
    — the layout groundwork for beyond-pod-slice solves (mesh_2d)."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from sgdml_tpu.parallel.mesh import mesh_2d

    rng = np.random.default_rng(11)
    n = 64
    B = rng.normal(size=(n, n))
    A = B @ B.T + n * np.eye(n)
    b = rng.normal(size=(n,))

    mesh = mesh_2d(2, 4)
    A_sh = jax.device_put(jnp.asarray(A), NamedSharding(mesh, P('r', 'c')))
    b_sh = jax.device_put(jnp.asarray(b), NamedSharding(mesh, P('r')))
    x = np.asarray(linalg.cho_solve_blocked(A_sh, b_sh, nb=16))
    x_ref = np.linalg.solve(A, b)
    np.testing.assert_allclose(x, x_ref, rtol=1e-10, atol=1e-10)


def test_init_distributed_noop_by_default():
    from sgdml_tpu.parallel.mesh import init_distributed

    assert init_distributed() is False  # flag off -> no-op
