"""Tree-packed triangular storage and recursive Cholesky, TPU-native.

A dense SPD matrix of side ``n`` costs ``n^2`` elements; its Cholesky
factor only needs the lower triangle. On a 16 GB-HBM chip that factor of
two decides whether aspirin-M=1000 (n = 63k, 15.9 GB f32 dense) is
solvable at all. LAPACK solves this with *packed* formats whose index
arithmetic is scatter/gather-hostile on TPU; here the triangle is instead
a **static pytree of contiguous rectangles**:

    triangle(n) =  leaf (m, m) dense square           if n <= leaf_size
                |  (triangle(n1), R (n2, n1), triangle(n2))   otherwise

Every operation on this structure decomposes into operations on whole
contiguous buffers — recursive Cholesky (LAPACK DPOTRF's recursive
variant, cf. Andersen et al.'s RFP format), triangular solves and SYRK
updates become a short static tree of large MXU GEMMs, with the 2x-flops
waste of a masked full-width update (see linalg.blocked_cholesky) paid
only inside the small leaves. Total memory = n^2/2 + O(leaf * n); the
largest single buffer is the top-level (n2, n1) rectangle — which also
dodges single-allocation limits that a dense (n, n) would hit.

Reference counterpart: scipy ``cho_factor/cho_solve`` inside
sgdml/solvers/analytic.py:94-99 (dense, f64, host memory).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    'TreeSpec',
    'tree_spec',
    'tree_from_dense',
    'tree_to_dense',
    'tree_diag_add',
    'tree_isfinite',
    'chol_tree',
    'solve_tree',
    'cho_solve_tree',
    'matvec_tree',
    'tree_nbytes',
]


class TreeSpec:
    """Static shape/offset description of a tree-packed triangle.

    Attributes
    ----------
    n: side of this (sub)triangle.
    off: row/col offset of this subtriangle in the full matrix.
    leaf: True if stored as one dense (n, n) square.
    left/right: child specs (when not a leaf); split sizes (n1, n2).
    """

    def __init__(self, n: int, off: int, leaf_size: int, align: int):
        self.n = n
        self.off = off
        if n <= leaf_size:
            self.leaf = True
            self.left = self.right = None
            self.n1 = self.n2 = None
        else:
            self.leaf = False
            half = -(-n // 2)
            n1 = -(-half // align) * align
            n1 = min(n1, n - align)
            self.n1, self.n2 = n1, n - n1
            self.left = TreeSpec(self.n1, off, leaf_size, align)
            self.right = TreeSpec(self.n2, off + self.n1, leaf_size, align)

    def __repr__(self):
        if self.leaf:
            return f'Leaf({self.n}@{self.off})'
        return f'Tri({self.n}@{self.off}: {self.left!r}, {self.right!r})'


def tree_spec(n: int, leaf_size: int = 2048, align: int = 1) -> TreeSpec:
    """Spec for an ``n x n`` triangle; all split boundaries are multiples
    of ``align`` (use the per-point row block size so kernel assembly can
    fill buffers along whole training points)."""
    if n % align != 0:
        raise ValueError('n must be a multiple of align')
    leaf_size = max(leaf_size, align)
    return TreeSpec(n, 0, leaf_size, align)


def tree_from_dense(A, spec: TreeSpec):
    """Pack the lower triangle of dense ``A`` into tree storage."""
    i0 = spec.off
    if spec.leaf:
        return A[i0 : i0 + spec.n, i0 : i0 + spec.n]
    r = A[i0 + spec.n1 : i0 + spec.n, i0 : i0 + spec.n1]
    return (
        tree_from_dense(A, spec.left),
        r,
        tree_from_dense(A, spec.right),
    )


def tree_to_dense(T, spec: TreeSpec, full: bool = False):
    """Unpack to a dense (n, n) lower triangle (or symmetrized if full)."""

    def fill(T, spec, out):
        i0 = spec.off - spec_root.off
        if spec.leaf:
            out[i0 : i0 + spec.n, i0 : i0 + spec.n] = np.tril(np.asarray(T))
            return
        t1, r, t2 = T
        out[i0 + spec.n1 : i0 + spec.n, i0 : i0 + spec.n1] = np.asarray(r)
        fill(t1, spec.left, out)
        fill(t2, spec.right, out)

    spec_root = spec
    first = T
    while isinstance(first, tuple):
        first = first[0]
    out = np.zeros((spec.n, spec.n), dtype=first.dtype)
    fill(T, spec, out)
    if full:
        out = out + np.tril(out, -1).T
    return out


def tree_nbytes(spec: TreeSpec, itemsize: int = 4) -> int:
    if spec.leaf:
        return spec.n * spec.n * itemsize
    return (
        spec.n1 * spec.n2 * itemsize
        + tree_nbytes(spec.left, itemsize)
        + tree_nbytes(spec.right, itemsize)
    )


def tree_diag_add(T, delta):
    """T + delta * I, applied down the diagonal leaves."""
    if not isinstance(T, tuple):
        n = T.shape[0]
        return T + delta * jnp.eye(n, dtype=T.dtype)
    t1, r, t2 = T
    return (tree_diag_add(t1, delta), r, tree_diag_add(t2, delta))


def tree_isfinite(T):
    if not isinstance(T, tuple):
        return jnp.all(jnp.isfinite(T))
    t1, r, t2 = T
    return tree_isfinite(t1) & jnp.all(jnp.isfinite(r)) & tree_isfinite(t2)


# -- factorization -----------------------------------------------------------


def _rsolve(L, B):
    """X = B @ L^{-T} for tree-packed lower-triangular ``L``; B (k, n).

    Updates ``B`` slice-wise (dynamic_update_slice) instead of
    concatenating, so XLA can overwrite the buffer in place — the top-level
    call works on the largest rectangle of the tree, where an extra copy
    would cost n^2/4 elements of HBM.
    """
    if not isinstance(L, tuple):
        return jax.scipy.linalg.solve_triangular(L, B.T, lower=True).T
    l1, r, l2 = L
    n1 = r.shape[1]
    x1 = _rsolve(l1, B[:, :n1])
    x2 = _rsolve(l2, B[:, n1:] - x1 @ r.T)
    B = jax.lax.dynamic_update_slice(B, x1, (0, 0))
    return jax.lax.dynamic_update_slice(B, x2, (0, n1))


def _syrk_sub(T, B):
    """T - tril(B @ B^T) down the tree; B (n, k)."""
    if not isinstance(T, tuple):
        return T - B @ B.T
    t1, r, t2 = T
    n1 = r.shape[1]
    ba, bb = B[:n1], B[n1:]
    return (_syrk_sub(t1, ba), r - bb @ ba.T, _syrk_sub(t2, bb))


def _chol(T):
    if not isinstance(T, tuple):
        return jnp.linalg.cholesky(T)
    t1, r, t2 = T
    l1 = _chol(t1)
    rl = _rsolve(l1, r)
    l2 = _chol(_syrk_sub(t2, rl))
    return (l1, rl, l2)


@functools.partial(jax.jit, donate_argnums=(0,))
def chol_tree(T):
    """Cholesky factor of a tree-packed SPD triangle, in tree storage.

    The input buffers are donated (the factor overwrites the matrix, as
    LAPACK does) — do not reuse ``T`` afterwards. A failed factorization
    (not PSD at this precision) yields NaNs; check ``tree_isfinite``.

    Matmul precision is pinned to HIGHEST: TPU default-precision f32 dots
    use bf16 passes (~1e-3 relative), which destroys the factorization of
    any moderately conditioned matrix; HIGHEST gives true-f32 products at
    ~30 TFLOP/s on v5e — still two orders faster than emulated f64.
    """
    with jax.default_matmul_precision('highest'):
        return _chol(T)


# -- solves ------------------------------------------------------------------


def _fwd(L, y):
    """L z = y."""
    if not isinstance(L, tuple):
        return jax.scipy.linalg.solve_triangular(L, y, lower=True)
    l1, r, l2 = L
    n1 = r.shape[1]
    z1 = _fwd(l1, y[:n1])
    z2 = _fwd(l2, y[n1:] - r @ z1)
    return jnp.concatenate([z1, z2], axis=0)


def _bwd(L, z):
    """L^T x = z."""
    if not isinstance(L, tuple):
        return jax.scipy.linalg.solve_triangular(L, z, lower=True, trans='T')
    l1, r, l2 = L
    n1 = r.shape[1]
    x2 = _bwd(l2, z[n1:])
    x1 = _bwd(l1, z[:n1] - r.T @ x2)
    return jnp.concatenate([x1, x2], axis=0)


@jax.jit
def solve_tree(L, y):
    """Solve ``(L L^T) x = y`` for tree-packed ``L``; y (n,) or (n, k)."""
    was_vec = y.ndim == 1
    if was_vec:
        y = y[:, None]
    with jax.default_matmul_precision('highest'):
        x = _bwd(L, _fwd(L, y))
    return x[:, 0] if was_vec else x


def cho_solve_tree(T, y):
    """Factor + solve in one call (small-problem convenience)."""
    return solve_tree(chol_tree(T), y)


@jax.jit
def matvec_tree(T, v):
    """Symmetric matvec ``A v`` from the lower-triangle tree of ``A``."""

    def mv(T, v):
        if not isinstance(T, tuple):
            lo = jnp.tril(T)
            return lo @ v + jnp.tril(T, -1).T @ v
        t1, r, t2 = T
        n1 = r.shape[1]
        v1, v2 = v[:n1], v[n1:]
        return jnp.concatenate(
            [mv(t1, v1) + r.T @ v2, mv(t2, v2) + r @ v1], axis=0
        )

    was_vec = v.ndim == 1
    if was_vec:
        v = v[:, None]
    with jax.default_matmul_precision('highest'):
        out = mv(T, v)
    return out[:, 0] if was_vec else out
