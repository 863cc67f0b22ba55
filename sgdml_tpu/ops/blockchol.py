"""Block-grid packed Cholesky for HBM-scale SPD systems, TPU-native.

A single-program recursive factorization (a superseded design
iteration) at n = 63k demanded ~9 GB of XLA scheduling temporaries on
top of the 8 GB matrix — over HBM. This module instead keeps the lower triangle as a flat
``k x k`` grid of equal ``(b, b)`` blocks (a list-of-lists pytree) and
drives a right-looking blocked Cholesky FROM THE HOST: every step is a
small jitted kernel (leaf Cholesky / triangular solve / GEMM-subtract)
with its target block donated, so peak memory is the packed storage plus
a couple of block-sized temporaries, and only three program shapes ever
compile. Dispatch is asynchronous — the ~k^3/6 kernel launches pipeline
on device without host round-trips.

The block-triangular solves (preconditioner application) are pure
functions over the same pytree and stay INSIDE the jitted CG loop.

Reference counterpart: scipy ``cho_factor/cho_solve`` on a dense host
matrix (sgdml/solvers/analytic.py:94-99).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    'GridSpec',
    'grid_spec',
    'grid_from_dense',
    'grid_to_dense',
    'grid_diag_add',
    'grid_isfinite',
    'chol_grid',
    'solve_grid',
    'matvec_grid',
]


class GridSpec:
    """Static description: side ``n = k * b``, ``k`` block rows of ``b``."""

    def __init__(self, n: int, k: int):
        if n % k != 0:
            raise ValueError('n must be divisible by k')
        self.n = n
        self.k = k
        self.b = n // k


def grid_spec(n: int, target_block: int = 8192, align: int = 1) -> GridSpec:
    """Pick ``k`` so blocks are ~``target_block`` and ``b % align == 0``."""
    if n % align != 0:
        raise ValueError('n must be a multiple of align')
    units = n // align
    k = max(1, -(-n // target_block))
    while units % k != 0:
        k += 1
    return GridSpec(n, k)


def grid_from_dense(A, spec: GridSpec):
    b = spec.b
    return [
        [A[i * b : (i + 1) * b, j * b : (j + 1) * b] for j in range(i + 1)]
        for i in range(spec.k)
    ]


def grid_to_dense(G, spec: GridSpec, full: bool = False):
    b = spec.b
    out = np.zeros((spec.n, spec.n), dtype=np.asarray(G[0][0]).dtype)
    for i in range(spec.k):
        for j in range(i + 1):
            blk = np.asarray(G[i][j])
            if i == j:
                blk = np.tril(blk)
            out[i * b : (i + 1) * b, j * b : (j + 1) * b] = blk
    if full:
        out = out + np.tril(out, -1).T
    return out


def grid_diag_add(G, delta):
    k = len(G)
    eye = None
    out = []
    for i in range(k):
        row = list(G[i])
        if eye is None:
            eye = jnp.eye(row[i].shape[0], dtype=row[i].dtype)
        row[i] = row[i] + delta * eye
        out.append(row)
    return out


def grid_isfinite(G):
    ok = jnp.bool_(True)
    for row in G:
        for blk in row:
            ok = ok & jnp.all(jnp.isfinite(blk))
    return ok


# -- per-block kernels (three program shapes total) --------------------------


@functools.partial(jax.jit, donate_argnums=(0,))
def _chol_blk(a):
    with jax.default_matmul_precision('highest'):
        return jnp.linalg.cholesky(a)


def _largest_divisor(n: int, cap: int) -> int:
    for d in range(min(cap, n), 0, -1):
        if n % d == 0:
            return d
    return 1


@functools.partial(jax.jit, donate_argnums=(1,), static_argnames=('q',))
def _rsolve_blk(l, b, q=None):
    """B <- B @ L^{-T} by blocked forward substitution over column panels.

    XLA:TPU's one-shot TriangularSolve transiently demands ~n^2-scale
    workspace at (8k, 8k) (measured: an ~8 GB spike for a 248 MB solve),
    which OOMs exactly when the packed matrix already fills HBM. The
    panel loop keeps temporaries at O(n*q): one masked full-width GEMM
    per panel (columns right of the panel are zero in L, columns left
    already hold the solution) plus a (q, q) triangular solve.
    """
    n = l.shape[0]
    if q is None:
        q = _largest_divisor(n, 512)
    n_pan = n // q
    col = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)

    def body(p, b_):
        c0 = p * q
        lpp = jax.lax.dynamic_slice(l, (c0, c0), (q, q))
        lrow = jax.lax.dynamic_slice(l, (c0, 0), (q, n))  # L[panel, :]
        # Keep only columns strictly left of the panel (solved already).
        lrow = jnp.where(col < c0, lrow, 0.0)
        bp = jax.lax.dynamic_slice(b_, (0, c0), (n, q))
        with jax.default_matmul_precision('highest'):
            rhs = bp - jnp.einsum('nc,pc->np', b_, lrow)
            xp = jax.scipy.linalg.solve_triangular(lpp, rhs.T, lower=True).T
        return jax.lax.dynamic_update_slice(b_, xp, (0, c0))

    return jax.lax.fori_loop(0, n_pan, body, b)


@functools.partial(jax.jit, donate_argnums=(0,))
def _gemm_sub_blk(c, a, b):
    """C <- C - A @ B^T."""
    with jax.default_matmul_precision('highest'):
        return c - jnp.dot(a, b.T, preferred_element_type=c.dtype)


def sync(x):
    """Force completion of everything enqueued before ``x`` was produced.

    Through the axon tunnel ``block_until_ready`` does not reliably block;
    a host transfer does. Used to throttle the dispatch queue: each
    enqueued execution holds its scratch allocation until it runs, so an
    unbounded queue of block-sized programs exhausts HBM on its own.
    """
    np.asarray(jax.device_get(x.ravel()[0]))


def chol_grid(G, sync_every: int = 8):
    """Right-looking blocked Cholesky over the grid (host-sequenced).

    Consumes ``G`` (every block is donated at its factorization/update
    step); returns the factor in the same layout. Failure (not PSD at
    this precision) yields NaNs — check :func:`grid_isfinite`.
    """
    k = len(G)
    L = [list(row) for row in G]
    pending = 0
    for j in range(k):
        L[j][j] = _chol_blk(L[j][j])
        for i in range(j + 1, k):
            L[i][j] = _rsolve_blk(L[j][j], L[i][j])
        for c in range(j + 1, k):
            for r in range(c, k):
                L[r][c] = _gemm_sub_blk(L[r][c], L[r][j], L[c][j])
                pending += 1
                if pending >= sync_every:
                    sync(L[r][c])
                    pending = 0
        sync(L[j][j])
    return L


# -- solves / matvec (pure; usable inside jit) --------------------------------


def _split(y, k, b):
    return [jax.lax.dynamic_slice_in_dim(y, i * b, b, 0) for i in range(k)]


def solve_grid(L, y):
    """Solve ``(L L^T) x = y``; y ``(n,)`` or ``(n, m)``. Pure function of
    the pytree ``L`` — call inside jit (e.g. the CG preconditioner)."""
    k = len(L)
    b = L[0][0].shape[0]
    was_vec = y.ndim == 1
    if was_vec:
        y = y[:, None]
    with jax.default_matmul_precision('highest'):
        yb = _split(y, k, b)
        z = []
        for j in range(k):
            rhs = yb[j]
            for c in range(j):
                rhs = rhs - L[j][c] @ z[c]
            z.append(
                jax.scipy.linalg.solve_triangular(L[j][j], rhs, lower=True)
            )
        x = [None] * k
        for j in reversed(range(k)):
            rhs = z[j]
            for r in range(j + 1, k):
                # einsum contracting the FIRST axis — `.T @` inside a CG
                # while_loop would be hoisted by XLA into persistent
                # transposed copies of every off-diagonal block.
                rhs = rhs - jnp.einsum('rc,rm->cm', L[r][j], x[r])
            x[j] = jax.scipy.linalg.solve_triangular(
                L[j][j], rhs, lower=True, trans='T'
            )
    out = jnp.concatenate(x, axis=0)
    return out[:, 0] if was_vec else out


def matvec_grid(G, v):
    """Symmetric matvec from the lower-triangle grid."""
    k = len(G)
    b = G[0][0].shape[0]
    was_vec = v.ndim == 1
    if was_vec:
        v = v[:, None]
    with jax.default_matmul_precision('highest'):
        vb = _split(v, k, b)
        out = [jnp.zeros_like(vb[i]) for i in range(k)]
        for i in range(k):
            for j in range(i + 1):
                blk = G[i][j]
                if i == j:
                    lo = jnp.tril(blk)
                    out[i] = (
                        out[i]
                        + lo @ vb[i]
                        + jnp.einsum('rc,rm->cm', jnp.tril(blk, -1), vb[i])
                    )
                else:
                    out[i] = out[i] + blk @ vb[j]
                    out[j] = out[j] + jnp.einsum('rc,rm->cm', blk, vb[i])
    res = jnp.concatenate(out, axis=0)
    return res[:, 0] if was_vec else res
