"""Ozaki-scheme exact-accumulation GEMM on the int8 MXU.

The TPU's int8 systolic path runs at ~12x the f32-HIGHEST rate and ~180x
the emulated-f64 rate (measured, BENCH_NOTES.md), and — unlike every
float mode — accumulates in int32 **exactly**. The Ozaki scheme exploits
this: split each operand row into power-of-two-scaled int8 mantissa
slices, multiply slice pairs on the MXU (each product exact), and
recombine the level sums with their scales in f64. The result is a
matmul with ~``q * n_slices``-bit effective mantissas whose only error
is the a-priori-bounded slice truncation — no accumulation-order noise,
no sqrt(K) error growth.

This backs the pair-precision block Cholesky (ops/pairchol.py) that
replaces an emulated-f64 factorization; the reference counterpart of
that solver stack is scipy ``cho_factor`` on a dense f64 host matrix
(sgdml/solvers/analytic.py:94-99).

Operands are "pair floats": ``(hi, lo)`` with ``hi`` f32 and ``lo`` a
lower-precision correction (f32, bf16, or None), representing
``hi + lo`` at up to ~47 significant bits.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    'DEFAULT_SLICES',
    'Q_BITS',
    'split_pair_int8',
    'split_global_int8',
    'matvec_sliced',
    'matvec_sliced_long',
    'matvec_sliced_long_t',
    'ozaki_gemm_nt',
    'max_contraction_dim',
]

# q bits of mantissa per int8 slice. q=6 keeps |first slice| <= 64 and
# |later slices| <= 32, so any slice-pair product is <= 2^12 and an
# int32 level accumulation over K terms stays exact for K <= 2^18.
Q_BITS = 6
# 7 slices = 42-bit coverage below the row scale. Elements down to
# 2^-9 of their row max keep every bit a (f32, f32-or-bf16) pair
# carries; smaller elements truncate at 2^-42 of the row scale, so a
# K-length dot accumulates only ~sqrt(K) * 2^-42 incoherent truncation
# noise (measured: sqrt(K) * 2^-37 at 6 slices — one slice below the
# pair-storage floor costs 28 vs 21 MXU products and buys 5 bits).
DEFAULT_SLICES = 7

_INT32_MAX = 2**31


def max_contraction_dim(n_slices: int = DEFAULT_SLICES, q: int = Q_BITS):
    """Largest inner dimension with provably exact int32 level sums.

    Slice values are bounded by ``2^q`` except the first lo-continuation
    slice, which carries the folded-in lo part and can reach ``1.5 *
    2^q``; the guard uses the worst product ``(1.5 * 2^q)^2``."""
    worst = int(1.5 * 2**q) ** 2
    return _INT32_MAX // (n_slices * worst)


def _row_scale(hi):
    """Per-row power-of-two scale sigma >= max|row| (exact in f32)."""
    rowmax = jnp.max(jnp.abs(hi), axis=1, keepdims=True)
    _, e = jnp.frexp(jnp.maximum(rowmax, jnp.finfo(jnp.float32).tiny))
    return jnp.exp2(e.astype(jnp.float32))  # 2^e >= rowmax, power of two


def _extract_slices(t, n, q):
    """n int8 slices of t in [-1, 1]; slice s has weight 2^-q(s+1).

    All arithmetic is exact in f32: t * 2^q is a power-of-two scaling,
    the rounded value is a small integer, and their difference fits the
    mantissa (|t * 2^q - round| <= 0.5 with <= 17 significant bits).
    """
    out = []
    two_q = jnp.float32(2.0**q)
    for _ in range(n):
        v = jnp.round(t * two_q)
        out.append(v.astype(jnp.int8))
        t = t * two_q - v
    return out, t


def split_pair_int8(hi, lo=None, n_slices: int = DEFAULT_SLICES,
                    q: int = Q_BITS):
    """Slice a pair-float matrix ``(m, k)`` along its last (contraction)
    axis into ``n_slices`` row-scaled int8 mantissa planes.

    Returns ``(slices, sigma)``: ``slices`` is ``(n_slices, m, k)`` int8,
    ``sigma`` is ``(m, 1)`` f32 powers of two, and

        hi + lo  ~=  sigma * sum_s slices[s] * 2^{-q (s+1)}

    with truncation error below ``sigma * 2^{-q * n_slices}`` per entry.
    The first four slices (q=6) reproduce an f32 ``hi`` exactly; ``lo``
    is folded into the residual stream for the remaining slices.
    """
    hi = hi.astype(jnp.float32)
    sigma = _row_scale(hi)
    t = hi / sigma
    n_hi = min(n_slices, 4)
    slices, t = _extract_slices(t, n_hi, q)
    if n_slices > n_hi:
        if lo is not None:
            # The residual stream is pre-scaled by 2^{q n_hi}; bring lo
            # to the same scale before folding it in (|lo| <= ulp(hi)/2,
            # so the sum stays within [-1.5, 1.5]).
            t = t + (lo.astype(jnp.float32) / sigma) * jnp.float32(
                2.0 ** (q * n_hi)
            )
        more, _ = _extract_slices(t, n_slices - n_hi, q)
        slices += more
    return jnp.stack(slices), sigma


@functools.partial(
    jax.jit, static_argnames=('q', 'out_dtype', 'precision_levels')
)
def _gemm_from_slices(sa, siga, sb, sigb, *, q, out_dtype,
                      precision_levels):
    n_slices = sa.shape[0]
    levels = [None] * precision_levels
    for i in range(n_slices):
        for j in range(n_slices):
            lv = i + j
            if lv >= precision_levels:
                continue
            p = jax.lax.dot_general(
                sa[i], sb[j],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            levels[lv] = p if levels[lv] is None else levels[lv] + p
    acc = jnp.zeros(levels[0].shape, dtype=jnp.float64)
    for lv in reversed(range(precision_levels)):
        if levels[lv] is not None:
            acc = acc + levels[lv].astype(jnp.float64) * (
                2.0 ** (-q * (lv + 2))
            )
    out = acc * siga.astype(jnp.float64) * sigb.astype(jnp.float64).T
    return out.astype(out_dtype)


def split_global_int8(x64, n_slices: int = 8, q: int = Q_BITS):
    """Globally-scaled int8 slice decomposition of an f64 matrix.

    One power-of-two scale for the whole array (instead of per-row)
    makes the slices valid for contraction along EITHER axis — one
    stored decomposition serves both ``A v`` and ``A^T v``. Truncation
    is ``2^{-q n_slices}`` of the global max (8 slices = 48 bits; used
    for the Cholesky leaf inverses, whose application error is
    amplified by cond(L_jj) and needs the extra headroom —
    ops/pairchol.py). Returns ``(slices (S, m, k) int8, sigma scalar)``.
    """
    hi = x64.astype(jnp.float32)
    lo = (x64 - hi.astype(jnp.float64)).astype(jnp.float32)
    gmax = jnp.max(jnp.abs(hi))
    _, e = jnp.frexp(jnp.maximum(gmax, jnp.finfo(jnp.float32).tiny))
    sigma = jnp.exp2(e.astype(jnp.float32))
    t = hi / sigma
    n_hi = min(n_slices, 4)
    slices, t = _extract_slices(t, n_hi, q)
    if n_slices > n_hi:
        t = t + (lo / sigma) * jnp.float32(2.0 ** (q * n_hi))
        more, _ = _extract_slices(t, n_slices - n_hi, q)
        slices += more
    return jnp.stack(slices), sigma


def matvec_sliced(sa, sigma, v, *, q: int = Q_BITS, transpose: bool = False):
    """``A @ v`` (or ``A^T @ v``) from a global-scale slice stack.

    v: f64 ``(k,)`` or ``(k, m)``; sliced on the fly (8 slices, global
    scale). All slice products accumulate exactly in int32; level sums
    recombine in f64. No f64 dot ever runs — nothing for XLA's f64
    emulation to stage (the whole point: resident f64 leaf matrices had
    their ~8x f32-split staging hoisted across the solve program).
    """
    n_a = sa.shape[0]
    was_vec = v.ndim == 1
    if was_vec:
        v = v[:, None]
    sv, sigv = split_global_int8(v, n_slices=8, q=q)
    n_v = sv.shape[0]
    keep = max(n_a, n_v)
    levels = [None] * keep
    for i in range(n_a):
        for j in range(n_v):
            lv = i + j
            if lv >= keep:
                continue
            if transpose:
                # (v^T A)^T: transpose the SMALL v-slice, keep the
                # resident matrix stack in standard orientation — a dot
                # contracting the stack's first axis makes XLA hoist a
                # persistent transposed copy of the whole stack.
                p = jax.lax.dot_general(
                    sv[j].T, sa[i],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32,
                )
            else:
                p = jax.lax.dot_general(
                    sa[i], sv[j],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32,
                )
            levels[lv] = p if levels[lv] is None else levels[lv] + p
    acc = jnp.zeros(levels[0].shape, dtype=jnp.float64)
    for lv in reversed(range(keep)):
        if levels[lv] is not None:
            acc = acc + levels[lv].astype(jnp.float64) * (
                2.0 ** (-q * (lv + 2))
            )
    if transpose:
        acc = acc.T
    out = acc * sigma.astype(jnp.float64) * sigv.astype(jnp.float64)
    return out[:, 0] if was_vec else out


def matvec_sliced_long(sa, sigma, v, *, q: int = Q_BITS, chunk: int = 16384,
                       vary_axis=None):
    """``A @ v`` from a global- or per-chunk-scale slice stack whose
    contraction axis exceeds the exact-int32 bound (~29k at 8 slices):
    the contraction is split into ``chunk``-wide pieces — each piece's
    int32 level sums are exact — and the pieces accumulate in f64.

    ``sa``: ``(S, m, n)`` int8 with ``n`` a multiple of ``chunk`` (pad the
    stack with zero columns at build time; zero slices contribute
    nothing). ``sigma``: scalar, or ``(n_chunks,)`` when each column chunk
    was sliced with its own scale. ``v``: f64 ``(n,)``.
    """
    S, m, n = sa.shape
    if n % chunk != 0:
        raise ValueError('slice stack columns must be a chunk multiple')
    if chunk > max_contraction_dim(8, q):
        raise ValueError('chunk overflows exact int32 accumulation')
    sv, sigv = split_global_int8(v[:, None], n_slices=8, q=q)  # (8, n, 1)
    n_v = sv.shape[0]
    keep = max(S, n_v)
    n_ch = n // chunk
    per_chunk = getattr(sigma, 'ndim', 0) > 0

    def body(c, acc):
        c0 = c * chunk
        levels = [None] * keep
        for i in range(S):
            sa_c = jax.lax.dynamic_slice(sa, (i, 0, c0), (1, m, chunk))[0]
            for j in range(n_v):
                lv = i + j
                if lv >= keep:
                    continue
                sv_c = jax.lax.dynamic_slice(sv, (j, c0, 0), (1, chunk, 1))[0]
                p = jax.lax.dot_general(
                    sa_c, sv_c,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32,
                )
                levels[lv] = p if levels[lv] is None else levels[lv] + p
        part = jnp.zeros(levels[0].shape, dtype=jnp.float64)
        for lv in reversed(range(keep)):
            if levels[lv] is not None:
                part = part + levels[lv].astype(jnp.float64) * (
                    2.0 ** (-q * (lv + 2))
                )
        if per_chunk:
            part = part * jax.lax.dynamic_index_in_dim(
                sigma, c, keepdims=False
            ).astype(jnp.float64)
        return acc + part

    acc0 = jnp.zeros((m, 1), dtype=jnp.float64)
    if vary_axis is not None:
        # Inside a shard_map over device-varying stacks the loop carry
        # must be marked varying too (shard_map VMA typing).
        acc0 = jax.lax.pcast(acc0, vary_axis, to='varying')
    acc = jax.lax.fori_loop(0, n_ch, body, acc0)
    if not per_chunk:
        acc = acc * sigma.astype(jnp.float64)
    return (acc * sigv.astype(jnp.float64))[:, 0]


def matvec_sliced_long_t(sa, sigma, w, *, q: int = Q_BITS,
                         chunk: int = 16384, vary_axis=None):
    """``A^T @ w`` for the same stack layout as :func:`matvec_sliced_long`.

    The contraction runs over the short ``m`` axis (exact without
    chunking); per-chunk scales apply to the OUTPUT column blocks.
    ``w``: f64 ``(m,)``. Returns f64 ``(n,)``.
    """
    S, m, n = sa.shape
    if m > max_contraction_dim(8, q):
        raise ValueError('row dim overflows exact int32 accumulation')
    if n % chunk != 0:
        raise ValueError('slice stack columns must be a chunk multiple')
    sv, sigv = split_global_int8(w[:, None], n_slices=8, q=q)  # (8, m, 1)
    n_v = sv.shape[0]
    keep = max(S, n_v)
    n_ch = n // chunk
    per_chunk = getattr(sigma, 'ndim', 0) > 0
    # Transpose the SMALL w-slices once, outside the loop (a dot
    # contracting the stack's row axis is the standard rhs orientation;
    # transposing the stack instead would hoist a persistent copy).
    svT = [sv[j].T for j in range(n_v)]  # each (1, m)

    def body(c, out):
        # Walk the stack in column chunks exactly like the forward
        # matvec: feeding whole ``sa[i]`` (m, n) planes into one dot made
        # XLA relayout-copy the ENTIRE stack as an HLO temp (measured
        # 8 GB at MD22 M=3000 — the compile-time OOM this fixes);
        # dynamic-sliced chunks keep the transient at (S, m, chunk).
        c0 = c * chunk
        levels = [None] * keep
        for i in range(S):
            sa_c = jax.lax.dynamic_slice(sa, (i, 0, c0), (1, m, chunk))[0]
            for j in range(n_v):
                lv = i + j
                if lv >= keep:
                    continue
                p = jax.lax.dot_general(
                    svT[j], sa_c,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32,
                )  # (1, chunk)
                levels[lv] = p if levels[lv] is None else levels[lv] + p
        acc = jnp.zeros(levels[0].shape, dtype=jnp.float64)
        for lv in reversed(range(keep)):
            if levels[lv] is not None:
                acc = acc + levels[lv].astype(jnp.float64) * (
                    2.0 ** (-q * (lv + 2))
                )
        oc = acc[0]
        if per_chunk:
            oc = oc * jax.lax.dynamic_index_in_dim(
                sigma, c, keepdims=False
            ).astype(jnp.float64)
        return jax.lax.dynamic_update_slice(out, oc, (c0,))

    out0 = jnp.zeros((n,), dtype=jnp.float64)
    if vary_axis is not None:
        out0 = jax.lax.pcast(out0, vary_axis, to='varying')
    out = jax.lax.fori_loop(0, n_ch, body, out0)
    out = out * sigv.astype(jnp.float64)
    if not per_chunk:
        out = out * sigma.astype(jnp.float64)
    return out


def ozaki_gemm_nt(a, b, *, n_slices: int = DEFAULT_SLICES, q: int = Q_BITS,
                  out_dtype=jnp.float64, lo_a=None, lo_b=None):
    """``(a + lo_a) @ (b + lo_b).T`` via exact int8 slice products.

    a, b: ``(m, k)`` / ``(n, k)`` f32 (or f64, rounded to pair form by the
    caller). Keeps product levels ``i + j < n_slices`` — truncation error
    ~``2^{-q(n_slices+1)} * sigma_a * sigma_b`` per entry. The int8
    matmuls accumulate exactly in int32 (requires
    ``k <= max_contraction_dim()``, ~= 33k at the defaults).
    """
    k = a.shape[1]
    if k > max_contraction_dim(n_slices, q):
        raise ValueError(
            f'contraction dim {k} overflows exact int32 accumulation'
        )
    sa, siga = split_pair_int8(a, lo_a, n_slices, q)
    sb, sigb = split_pair_int8(b, lo_b, n_slices, q)
    return _gemm_from_slices(
        sa, siga, sb, sigb, q=q, out_dtype=out_dtype,
        precision_levels=n_slices,
    )
