"""Blocked dense linear algebra, single-chip and mesh-distributed.

``jnp.linalg.cholesky`` is a single-device op; the (3NM)^2 GDML kernel
matrix outgrows one chip's HBM well before it outgrows a pod slice. This
module implements right-looking *blocked* Cholesky and blocked triangular
solves whose primitive steps are (N, nb) panel operations and rank-nb
full-width updates — shapes that partition cleanly when the matrix is
row-sharded over a 1-D mesh (GSPMD inserts one panel all-gather per step;
everything else stays device-local).

The masked full-width update does ~3x the minimal Cholesky flops in
exchange for static shapes (XLA cannot express a shrinking trailing
matrix); on >=4 chips this is already a net win over single-chip, and it
is the only way past single-chip HBM. Accuracy is identical to the
unblocked factorization (verified to 1e-12 in tests).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

__all__ = ['blocked_cholesky', 'blocked_tri_solve', 'cho_solve_blocked']


@functools.partial(jax.jit, static_argnames=('nb',))
def blocked_cholesky(A, nb: int):
    """Lower-triangular Cholesky factor of SPD ``A (N, N)``; ``N % nb == 0``.

    Right-looking algorithm: at step k, factorize the (nb, nb) diagonal
    block, triangular-solve the full block column (rows above the diagonal
    masked), and apply a masked rank-nb update to the rest of the matrix.
    Row-sharded inputs distribute: the diagonal block and panel are
    broadcast (all-gather), the update is local per row shard.
    """
    n = A.shape[0]
    assert n % nb == 0, 'pad the matrix to a multiple of the block size'
    n_blocks = n // nb
    row_idx = jnp.arange(n)

    def body(k, A):
        k0 = k * nb
        Akk = jax.lax.dynamic_slice(A, (k0, k0), (nb, nb))
        Lkk = jnp.linalg.cholesky(Akk)

        # Full block column; rows <= k0 are masked out of the panel.
        col = jax.lax.dynamic_slice(A, (0, k0), (n, nb))
        panel = jax.scipy.linalg.solve_triangular(
            Lkk, col.T, lower=True
        ).T  # (n, nb) = col @ Lkk^{-T}
        below = (row_idx >= k0 + nb)[:, None]
        panel_below = jnp.where(below, panel, 0.0)

        # Trailing update (masked full width): A -= panel_below panel_below^T.
        A = A - panel_below @ panel_below.T

        # Write the factored panel into column k: Lkk on the diagonal,
        # panel strictly below, zeros above.
        in_diag = ((row_idx >= k0) & (row_idx < k0 + nb))[:, None]
        Lkk_full = jnp.zeros((n, nb), dtype=A.dtype)
        Lkk_full = jax.lax.dynamic_update_slice(Lkk_full, Lkk, (k0, 0))
        new_col = jnp.where(in_diag, Lkk_full, panel_below)
        A = jax.lax.dynamic_update_slice(A, new_col, (0, k0))
        return A

    A = jax.lax.fori_loop(0, n_blocks, body, A)
    return jnp.tril(A)


@functools.partial(jax.jit, static_argnames=('nb', 'trans'))
def blocked_tri_solve(L, b, nb: int, trans: bool = False):
    """Solve ``L y = b`` (or ``L^T y = b`` with ``trans``) by block
    substitution; ``L`` lower-triangular, ``b (N,)`` or ``(N, K)``."""
    n = L.shape[0]
    assert n % nb == 0
    n_blocks = n // nb
    b_was_vec = b.ndim == 1
    if b_was_vec:
        b = b[:, None]
    y0 = jnp.zeros_like(b)
    row_idx = jnp.arange(n)

    def fwd_body(k, y):
        k0 = k * nb
        Lkk = jax.lax.dynamic_slice(L, (k0, k0), (nb, nb))
        L_row = jax.lax.dynamic_slice(L, (k0, 0), (nb, n))
        rhs = jax.lax.dynamic_slice(b, (k0, 0), (nb, b.shape[1]))
        rhs = rhs - L_row @ y  # y has zeros at blocks >= k
        yk = jax.scipy.linalg.solve_triangular(Lkk, rhs, lower=True)
        return jax.lax.dynamic_update_slice(y, yk, (k0, 0))

    def bwd_body(i, y):
        k = n_blocks - 1 - i
        k0 = k * nb
        Lkk = jax.lax.dynamic_slice(L, (k0, k0), (nb, nb))
        # Column k of L below the diagonal == row k of L^T right of diag.
        L_col = jax.lax.dynamic_slice(L, (0, k0), (n, nb))
        rhs = jax.lax.dynamic_slice(b, (k0, 0), (nb, b.shape[1]))
        rhs = rhs - L_col.T @ y  # y has zeros at blocks <= k
        yk = jax.scipy.linalg.solve_triangular(
            Lkk, rhs, lower=True, trans='T'
        )
        return jax.lax.dynamic_update_slice(y, yk, (k0, 0))

    y = jax.lax.fori_loop(0, n_blocks, bwd_body if trans else fwd_body, y0)
    return y[:, 0] if b_was_vec else y


def cho_solve_blocked(A, b, nb: int = 1024):
    """Solve SPD ``A x = b`` via blocked Cholesky (mesh-distributable).

    Pads to a multiple of ``nb`` with an identity extension so callers
    don't need aligned sizes.
    """
    n = A.shape[0]
    nb = min(nb, n)
    n_pad = -(-n // nb) * nb
    if n_pad != n:
        A = jnp.pad(A, ((0, n_pad - n), (0, n_pad - n)))
        A = A.at[jnp.arange(n, n_pad), jnp.arange(n, n_pad)].set(1.0)
        b = jnp.pad(b, ((0, n_pad - n),) + ((0, 0),) * (b.ndim - 1))
    L = blocked_cholesky(A, nb)
    y = blocked_tri_solve(L, b, nb, trans=False)
    x = blocked_tri_solve(L, y, nb, trans=True)
    return x[:n]
