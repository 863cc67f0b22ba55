"""f32 block-grid analytic path: assembly edge cases + end-to-end PCG solve.

(Successor of the retired tree-packed layout tests; the production path is
the block-grid solver, ops/blockchol.py + Analytic._solve_grid_pcg.)
"""

import jax.numpy as jnp
import numpy as np
import pytest

from sgdml_tpu.datasets.synthetic import generate_md_dataset
from sgdml_tpu.ops import blockchol as bc
from sgdml_tpu.ops.descriptor import descriptor_batch
from sgdml_tpu.ops.kernel import assemble_kernel, assemble_kernel_grid
from sgdml_tpu.solvers.analytic import Analytic


def _setup(m=14, n_atoms=5, seed=3):
    ds = generate_md_dataset(n_atoms=n_atoms, n_frames=m + 4, seed=seed)
    R = ds['R'][:m].reshape(m, -1)
    F = ds['F'][:m]
    X, Jc = descriptor_batch(jnp.asarray(R), n_atoms)
    dperms = np.arange((n_atoms * (n_atoms - 1)) // 2)[None, :]
    return X, Jc, dperms, F


def test_assemble_grid_nondividing_tiles():
    """Edge tiles extend past blocks and past the padded point count; the
    over-padded tables must prevent dynamic_slice start clamping (which
    would compute wrong rows but write them at the intended offset —
    regression: corrupted bottom rows at M=200 on TPU)."""
    n_atoms, m, sig = 5, 20, 4.0
    X, Jc, dperms, _ = _setup(m, n_atoms)
    dim_i = 3 * n_atoms
    m_pad = 24
    spec = bc.grid_spec(m_pad * dim_i, target_block=6 * dim_i, align=dim_i)
    A_grid = assemble_kernel_grid(
        X, Jc, dperms, sig, n_atoms, spec, dtype=jnp.float64,
        tile_i=5, tile_j=7,
    )
    A_dense = bc.grid_to_dense(A_grid, spec, full=True)
    K = np.asarray(assemble_kernel(X, Jc, dperms, sig, n_atoms))
    n = m * dim_i
    np.testing.assert_allclose(A_dense[:n, :n], -K, rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(A_dense[n:, n:], np.eye(m_pad * dim_i - n))
    assert np.all(A_dense[n:, :n] == 0)


@pytest.mark.parametrize('use_sym', [False])
def test_grid_pcg_matches_dense_f64_solve(use_sym):
    """Force the grid path with a tiny memory budget; alphas must match the
    dense f64 analytic solve to CG tolerance."""
    n_atoms, m, sig, lam = 5, 20, 4.0, 1e-10
    X, Jc, dperms, F = _setup(m, n_atoms)
    y = F.reshape(-1) / np.std(F)

    task = {
        'sig': sig,
        'lam': lam,
        'R_train': np.zeros((m, n_atoms, 3)),
        'use_E_cstr': False,
    }

    a_small = Analytic(max_memory=1e-9)  # everything "too big" -> grid path
    alphas_grid = a_small.solve(task, np.asarray(X), np.asarray(Jc), dperms, y)
    assert a_small.pcg_iters > 0

    a_big = Analytic(max_memory=64)
    alphas_dense = a_big.solve(task, np.asarray(X), np.asarray(Jc), dperms, y)

    # Alphas are the ill-conditioned object (cond ~ lmax/lam); what matters
    # is parity of the PREDICTED FORCES, i.e. K @ alphas. Evaluate both
    # through the matrix-free matvec (lam term cancels in the comparison).
    from sgdml_tpu.solvers.iterative import _matvec_A

    perms_key = (
        np.ascontiguousarray(dperms.astype(np.int64)).tobytes(), dperms.shape
    )

    def forces(a):
        return np.asarray(
            _matvec_A(
                jnp.asarray(-a), X, Jc, X, Jc, sig, 0.0,
                n_atoms=n_atoms, desc_perms_key=perms_key, use_E_cstr=False,
            )
        )

    f_grid, f_dense = forces(alphas_grid), forces(alphas_dense)
    f_dev = np.linalg.norm(f_grid - f_dense) / np.linalg.norm(f_dense)
    assert f_dev < 1e-7, f_dev

    denom = np.linalg.norm(alphas_dense)
    assert np.linalg.norm(alphas_grid - alphas_dense) / denom < 1e-3
