"""Closed-form solver: on-device Cholesky factorization of the assembled
kernel system (reference behavior: sgdml/solvers/analytic.py:49-151).

The assembled kernel K is negated to make the system convex, ridge-
regularized, and factorized in float64 on device. Fallback ladder mirrors
the reference: Cholesky -> LU -> least squares (for non-square systems).
On TPU/XLA, a failed Cholesky surfaces as NaNs in the factor rather than an
exception, so the ladder is NaN-triggered.
"""

from __future__ import annotations

import logging
import timeit

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.kernel import assemble_kernel

log = logging.getLogger(__name__)


@jax.jit
def _cho_solve_neg(K, y, lam):
    """alphas = -cho_solve(-K + lam I, y); also returns a PSD-failure flag."""
    Kc = -K
    n = Kc.shape[0]
    Kc = Kc + lam * jnp.eye(n, dtype=Kc.dtype)
    L = jnp.linalg.cholesky(Kc)
    ok = jnp.all(jnp.isfinite(L))
    z = jax.scipy.linalg.solve_triangular(L, y, lower=True)
    alphas = -jax.scipy.linalg.solve_triangular(L.T, z, lower=False)
    return alphas, ok


@jax.jit
def _lu_solve_neg(K, y, lam):
    Kc = -K + lam * jnp.eye(K.shape[0], dtype=K.dtype)
    return -jnp.linalg.solve(Kc, y)


class Analytic:
    """Closed-form training on device.

    Parameters
    ----------
    desc: unused placeholder kept for API parity with the iterative solver.
    callback: optional progress callback (current, total, ...).
    """

    def __init__(self, gdml_train=None, desc=None, callback=None, mesh=None):
        self.gdml_train = gdml_train
        self.callback = callback
        self.mesh = mesh

    def solve(self, task, R_desc, R_d_desc, desc_perms, y):
        sig = float(np.squeeze(task['sig']))
        lam = float(np.squeeze(task['lam']))
        use_E_cstr = bool(task.get('use_E_cstr', False))

        n_train, dim_d = R_d_desc.shape[:2]
        n_atoms = int((1 + np.sqrt(8 * dim_d + 1)) / 2)

        if self.mesh is not None:
            return self._solve_sharded(
                R_desc, R_d_desc, desc_perms, y, sig, lam, n_atoms,
                use_E_cstr,
            )

        t0 = timeit.default_timer()
        K = assemble_kernel(
            jnp.asarray(R_desc),
            jnp.asarray(R_d_desc),
            desc_perms,
            sig,
            n_atoms,
            use_E_cstr=use_E_cstr,
        )
        K.block_until_ready()
        t_assemble = timeit.default_timer() - t0
        log.info(
            'Assembled %dx%d kernel in %.2f s', K.shape[0], K.shape[1], t_assemble
        )

        y_dev = jnp.asarray(y, dtype=K.dtype)

        t0 = timeit.default_timer()
        if K.shape[0] == K.shape[1]:
            alphas, ok = _cho_solve_neg(K, y_dev, lam)
            if not bool(ok):
                log.warning(
                    'Cholesky factorization failed (not PSD at lam=%g); '
                    'falling back to LU.',
                    lam,
                )
                alphas = _lu_solve_neg(K, y_dev, lam)
        else:
            alphas = -jnp.linalg.lstsq(-K, y_dev)[0]
        alphas.block_until_ready()
        t_solve = timeit.default_timer() - t0
        log.info('Solved %d-dim linear system in %.2f s', K.shape[0], t_solve)

        self.t_assemble = t_assemble
        self.t_solve = t_solve
        return np.asarray(alphas)

    def _solve_sharded(
        self, R_desc, R_d_desc, desc_perms, y, sig, lam, n_atoms, use_E_cstr
    ):
        """Multi-chip closed-form solve: row-sharded interleaved assembly +
        distributed blocked Cholesky over the mesh (parallel/spmd.py).
        Replaces the reference's multi-GPU DataParallel assembly
        (sgdml/train.py:1464-1466) with ICI-collective SPMD."""
        from ..parallel import spmd

        t0 = timeit.default_timer()
        K, lay = spmd.assemble_kernel_sharded(
            jnp.asarray(R_desc),
            jnp.asarray(R_d_desc),
            desc_perms,
            sig,
            n_atoms,
            self.mesh,
            use_E_cstr=use_E_cstr,
        )
        K.block_until_ready()
        t_assemble = timeit.default_timer() - t0
        log.info(
            'Assembled %dx%d kernel (row-sharded over %d devices) in %.2f s',
            lay.n, lay.n, lay.n_dev, t_assemble,
        )

        t0 = timeit.default_timer()
        alphas = spmd.solve_interleaved(K, np.asarray(y), lam, lay)
        t_solve = timeit.default_timer() - t0
        log.info(
            'Solved %d-dim linear system (blocked Cholesky over %d devices) '
            'in %.2f s', lay.n, lay.n_dev, t_solve,
        )
        self.t_assemble = t_assemble
        self.t_solve = t_solve
        return np.asarray(alphas)

    @staticmethod
    def est_memory_requirement(n_train, n_atoms):
        """Bytes needed on device: K + Cholesky factor + solve scratch
        (reference formula: sgdml/solvers/analytic.py:153-159)."""
        n = n_train * 3 * n_atoms
        return 3 * n**2 * 8 + n * 8
