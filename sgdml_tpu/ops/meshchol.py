"""Mesh-shardable pair-precision blocked Cholesky (flat-array form).

The single-chip pair solver (ops/pairchol.py) keeps the triangle as a
host-sequenced block grid because a 16 GB chip cannot hold one flat
``(n, n)`` array at interesting n. On a **mesh**, the flat form comes
back: ``hi (f32)`` and ``lo (bf16)`` row-sharded over devices (6 bytes
per element, ~``6 n^2 / D`` per device), and the whole factorization is
ONE jitted program whose per-step structure GSPMD partitions
automatically:

* diagonal ``(nb, nb)`` block: gathered + factorized in f64 (replicated
  work, negligible);
* panel ``(n, nb)``: f32 triangular solve + Ozaki-residual iterative
  refinement — row-local on each device once the (small) diagonal
  factor is broadcast;
* trailing update: masked full-width rank-nb update through the Ozaki
  int8-slice GEMM (exact int32 accumulation; the all-gather of the
  panel's int8 slices is the step's only collective, 7 B/element).

Like ops/linalg.py's f64 version this does ~3x the minimal flops for
static shapes; the int8 MXU rate (~12.8 effective TFLOP/s at 7 slices)
makes that a bargain against emulated f64 (2.0). Accuracy matches the
pair-storage floor (~2^-32 relative), so the analytic solver's lam'
ladder can sit ~100x below the f32 floor — same contract as pairchol,
now past single-chip HBM.

Reference counterpart: scipy ``cho_factor/cho_solve`` on a dense f64
host matrix (sgdml/solvers/analytic.py:94-99); the reference has no
distributed equivalent at all.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from . import ozaki

__all__ = [
    'blocked_cholesky_pair',
    'tri_solve_pair',
    'cho_solve_pair',
]

LO_DTYPE = jnp.bfloat16
N_REFINE = 3


def _split(x64, lo_dtype=LO_DTYPE):
    hi = x64.astype(jnp.float32)
    lo = (x64 - hi.astype(jnp.float64)).astype(lo_dtype)
    return hi, lo


def _join(hi, lo):
    return hi.astype(jnp.float64) + lo.astype(jnp.float64)


def _ozaki_nt_64(a64, b64):
    """Ozaki ``a @ b.T`` for f64 operands (split to (f32, f32) pairs)."""
    ah = a64.astype(jnp.float32)
    al = (a64 - ah.astype(jnp.float64)).astype(jnp.float32)
    bh = b64.astype(jnp.float32)
    bl = (b64 - bh.astype(jnp.float64)).astype(jnp.float32)
    return ozaki.ozaki_gemm_nt(ah, bh, lo_a=al, lo_b=bl)


@functools.partial(jax.jit, static_argnames=('nb',))
def blocked_cholesky_pair(Ahi, Alo, nb: int):
    """Pair-precision right-looking blocked Cholesky of ``A (n, n)``.

    ``Ahi``/``Alo`` hold the pair representation (f32 + bf16) of an SPD
    matrix; ``n % nb == 0``. Returns the factor in the same pair form
    (full lower triangle; upper garbage masked by the solves). A
    non-SPD input yields NaNs. Works on replicated or row-sharded
    inputs — under a mesh, GSPMD keeps the panel math row-local and
    all-gathers only the panel slices for the trailing update.
    """
    n = Ahi.shape[0]
    assert n % nb == 0, 'pad the matrix to a multiple of the block size'
    n_blocks = n // nb
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)

    def body(k, carry):
        Ahi, Alo = carry
        kb = k * nb

        dh = jax.lax.dynamic_slice(Ahi, (kb, kb), (nb, nb))
        dl = jax.lax.dynamic_slice(Alo, (kb, kb), (nb, nb))
        Lkk64 = jnp.linalg.cholesky(_join(dh, dl))
        Lkk32 = Lkk64.astype(jnp.float32)

        ch = jax.lax.dynamic_slice(Ahi, (0, kb), (n, nb))
        cl = jax.lax.dynamic_slice(Alo, (0, kb), (n, nb))
        c64 = _join(ch, cl)

        # Panel X = C L_kk^{-T} by f32 solve + Ozaki-residual refinement
        # (convergence factor eps32 * cond(L_kk); see ops/pairchol.py).
        with jax.default_matmul_precision('highest'):
            x64 = jax.scipy.linalg.solve_triangular(
                Lkk32, ch.T, lower=True
            ).T.astype(jnp.float64)
            for _ in range(N_REFINE):
                r64 = c64 - _ozaki_nt_64(x64, Lkk64)
                x64 = x64 + jax.scipy.linalg.solve_triangular(
                    Lkk32, r64.astype(jnp.float32).T, lower=True
                ).T.astype(jnp.float64)

        # Rows [0, kb): already-factored region, keep zeros out of the
        # update. Rows [kb, kb+nb): the diagonal factor itself.
        below = row_ids >= kb + nb
        in_diag = (row_ids >= kb) & (row_ids < kb + nb)
        Lkk_pad = jax.lax.dynamic_update_slice(
            jnp.zeros((n, nb), jnp.float64), Lkk64, (kb, 0)
        )
        panel64 = jnp.where(below, x64, jnp.where(in_diag, Lkk_pad, 0.0))

        ph, pl = _split(panel64)
        Ahi = jax.lax.dynamic_update_slice(Ahi, ph, (0, kb))
        Alo = jax.lax.dynamic_update_slice(Alo, pl, (0, kb))

        # Masked full-width trailing update on columns > kb + nb - 1:
        # A -= P P^T (exact Ozaki product; update only the lower-right).
        pb64 = jnp.where(below, panel64, 0.0)
        upd = _ozaki_nt_64(pb64, pb64)
        live = (col_ids >= kb + nb) & (row_ids >= kb + nb)
        a64 = jnp.where(live, _join(Ahi, Alo) - upd, _join(Ahi, Alo))
        Ahi, Alo = _split(a64)
        return (Ahi, Alo)

    return jax.lax.fori_loop(0, n_blocks, body, (Ahi, Alo))


@functools.partial(jax.jit, static_argnames=('nb', 'trans'))
def tri_solve_pair(Lhi, Llo, b, nb: int, trans: bool = False):
    """``L y = b`` (or ``L^T y = b``) at pair accuracy.

    Left-looking block substitution (structure of
    ops/linalg.py:blocked_tri_solve): y starts at zero, each step reads
    ONE pair strip of L, joins it to f64 on the fly (the dynamic slice
    index defeats loop-invariant hoisting — no persistent f64 copy of
    the factor), and solves the (nb, nb) diagonal in f64.
    """
    n = Lhi.shape[0]
    assert n % nb == 0
    n_blocks = n // nb
    was_vec = b.ndim == 1
    if was_vec:
        b = b[:, None]
    b = b.astype(jnp.float64)
    y0 = jnp.zeros_like(b)

    def fwd_body(k, y):
        k0 = k * nb
        Lkk = _join(
            jax.lax.dynamic_slice(Lhi, (k0, k0), (nb, nb)),
            jax.lax.dynamic_slice(Llo, (k0, k0), (nb, nb)),
        )
        row64 = _join(
            jax.lax.dynamic_slice(Lhi, (k0, 0), (nb, n)),
            jax.lax.dynamic_slice(Llo, (k0, 0), (nb, n)),
        )
        rhs = jax.lax.dynamic_slice(b, (k0, 0), (nb, b.shape[1]))
        rhs = rhs - row64 @ y  # y has zeros at blocks >= k
        yk = jax.scipy.linalg.solve_triangular(Lkk, rhs, lower=True)
        return jax.lax.dynamic_update_slice(y, yk, (k0, 0))

    def bwd_body(i, y):
        k = n_blocks - 1 - i
        k0 = k * nb
        Lkk = _join(
            jax.lax.dynamic_slice(Lhi, (k0, k0), (nb, nb)),
            jax.lax.dynamic_slice(Llo, (k0, k0), (nb, nb)),
        )
        # Column k of L below the diagonal == row k of L^T right of it.
        col64 = _join(
            jax.lax.dynamic_slice(Lhi, (0, k0), (n, nb)),
            jax.lax.dynamic_slice(Llo, (0, k0), (n, nb)),
        )
        rhs = jax.lax.dynamic_slice(b, (k0, 0), (nb, b.shape[1]))
        rhs = rhs - jnp.einsum('rc,rm->cm', col64, y)  # zeros at <= k
        yk = jax.scipy.linalg.solve_triangular(
            Lkk, rhs, lower=True, trans='T'
        )
        return jax.lax.dynamic_update_slice(y, yk, (k0, 0))

    y = jax.lax.fori_loop(0, n_blocks, bwd_body if trans else fwd_body, y0)
    return y[:, 0] if was_vec else y


def cho_solve_pair(Lhi, Llo, b, nb: int):
    """Solve ``(L L^T) x = b`` from the pair factor."""
    y = tri_solve_pair(Lhi, Llo, b, nb=nb)
    return tri_solve_pair(Lhi, Llo, y, nb=nb, trans=True)
