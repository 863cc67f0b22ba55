"""Block-cyclic distributed Cholesky (ops/cyclic.py) vs dense reference.

The cyclic factorization must match ``jnp.linalg.cholesky`` to roundoff
for any SPD input, for every (nb, n_dev) tiling, including the padded
solve path — the shrinking-update unrolled program takes different
slice/update paths at every step, so tilings with ragged trailing sets
(n_blocks not aligned to step boundaries) are the interesting cases.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sgdml_tpu.ops import cyclic
from sgdml_tpu.parallel.mesh import default_mesh


def _spd(n, seed=0):
    rng = np.random.default_rng(seed)
    B = rng.standard_normal((n, n))
    return B @ B.T + n * np.eye(n)


@pytest.mark.parametrize('n_dev,nb,n_blocks', [
    (1, 16, 4),   # degenerate mesh: pure shrinking-update check
    (4, 16, 8),   # two slots per device
    (8, 8, 16),   # full virtual mesh
    (8, 16, 8),   # one slot per device (u_k ragged edge every step)
])
def test_factor_matches_dense(n_dev, nb, n_blocks):
    n = nb * n_blocks
    A = _spd(n)
    mesh = default_mesh(n_dev)
    L = np.asarray(cyclic.blocked_cholesky_cyclic(jnp.asarray(A), nb, mesh))
    L_ref = np.linalg.cholesky(A)
    assert np.allclose(L, L_ref, atol=1e-9 * n)
    # Strictly lower-triangular output (upper zeroed, not garbage).
    assert np.allclose(L, np.tril(L))


def test_cho_solve_cyclic_padded():
    """n not a multiple of nb*n_dev exercises the identity extension."""
    n = 150
    A = _spd(n, seed=3)
    b = np.random.default_rng(4).standard_normal(n)
    mesh = default_mesh(8)
    x = np.asarray(
        cyclic.cho_solve_cyclic(jnp.asarray(A), jnp.asarray(b), 8, mesh)
    )
    assert np.allclose(x, np.linalg.solve(A, b), atol=1e-8)


def test_cyclic_row_perm_is_permutation():
    perm = cyclic.cyclic_row_perm(n_blocks=8, nb=4, n_dev=4)
    assert sorted(perm.tolist()) == list(range(32))
    # Device 1's shard (rows 8..15 of storage) holds logical blocks 1, 5.
    assert perm[8:16].tolist() == list(range(4, 8)) + list(range(20, 24))


def test_solve_interleaved_cyclic_layout():
    """The production mesh f64 solve accepts layout='cyclic' and matches
    the masked full-width path on a real sharded kernel system."""
    from sgdml_tpu.datasets.synthetic import generate_md_dataset
    from sgdml_tpu.ops import descriptor
    from sgdml_tpu.parallel import spmd

    ds = generate_md_dataset(n_atoms=5, n_frames=12, seed=2)
    n_atoms, m = 5, 12
    R = jnp.asarray(ds['R'][:m].reshape(m, -1))
    X, Jc = descriptor.descriptor_batch(R, n_atoms)
    dperms = np.arange(n_atoms * (n_atoms - 1) // 2)[None]
    mesh = default_mesh(8)
    K8, lay = spmd.assemble_kernel_sharded(
        X, Jc, dperms, 5.0, n_atoms, mesh
    )
    y = np.random.default_rng(8).standard_normal(lay.n)
    a_masked = spmd.solve_interleaved(K8, y, 1e-10, lay)
    a_cyclic = spmd.solve_interleaved(K8, y, 1e-10, lay, layout='cyclic')
    rel = np.abs(a_cyclic - a_masked).max() / np.abs(a_masked).max()
    assert rel < 1e-9, rel
