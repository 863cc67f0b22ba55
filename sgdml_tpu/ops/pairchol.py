"""Pair-precision (f32 + bf16) block Cholesky with exact int8 GEMM updates.

Why this exists: the f32 block-grid factorization (ops/blockchol.py) is
floored by f32 *storage* of the factor — ``||L~ L~^T - A|| ~ 2 eps32
||A||`` — which forces the preconditioner shift ``lam' >= ~3e-7 lmax``
and hence ~1600 refinement-CG iterations at lam=1e-10 (measured,
BENCH_NOTES.md). Emulated f64 runs at 2 TFLOP/s / 0.18 TFLOP/s (matmul /
Cholesky) on this chip and the dense f64 matrix would not fit HBM anyway.

This module stores every block as a **pair float** ``hi (f32) + lo
(bf16)`` — ~33 significant bits at 6 B/element (vs 8 for f64) — and
factorizes with errors at the pair-storage floor:

* trailing updates ``C -= L_rj L_cj^T`` via the Ozaki int8-slice GEMM
  (ops/ozaki.py): exact int32 accumulation, no sqrt(K) error growth,
  ~12x the emulated-f64 rate;
* diagonal leaf Cholesky in true f64 (small: one ``(b, b)`` block);
* panel solves by f32 substitution + Ozaki-residual iterative
  refinement (convergence factor ``eps32 * cond(L_jj)``);
* the CG-time preconditioner application keeps pair precision through
  **int8 slice stacks**: the factor's off-diagonal blocks become
  7-slice column strips (:func:`int8_strips`) and the precomputed leaf
  inverses 8-slice stacks (:func:`slice_leaf_inverses`) — every hot
  contraction is an exact int8 MXU dot, with no sequential triangular
  solves and no f64 dots (whose XLA emulation staging and
  compression-remat cloning made every f32/f64 formulation exceed HBM
  at n = 63k; war stories in BENCH_NOTES.md). The application must be
  pair-accurate: an f32-applied factor would re-introduce the
  2 eps32 ||A|| floor regardless of how well L was computed.

The factorization is host-sequenced like blockchol (a handful of
compiled program shapes, donated blocks); the CG-time solve
(:func:`solve_strips_int8`) is one pure jit-safe function, called once
per host-stepped CG iteration.

Reference counterpart: scipy ``cho_factor/cho_solve`` on a dense f64
host matrix (sgdml/solvers/analytic.py:94-99).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from . import ozaki
from .blockchol import sync

__all__ = [
    'pair_split',
    'pair_to_f64',
    'grid_pair_from_f32',
    'grid_pair_from_dense64',
    'grid_pair_diag_add',
    'grid_pair_isfinite',
    'chol_grid_pair',
    'leaf_inverses',
    'slice_leaf_inverses',
    'strips_from_grid',
    'int8_strips',
    'solve_grid_pair',
    'solve_strips',
    'solve_strips_int8',
]

LO_DTYPE = jnp.bfloat16
N_REFINE = 3  # panel-solve refinement rounds: err ~ (eps32 k(L_jj))^4


def pair_split(x64, lo_dtype=LO_DTYPE):
    hi = x64.astype(jnp.float32)
    lo = (x64 - hi.astype(jnp.float64)).astype(lo_dtype)
    return hi, lo


def pair_to_f64(hi, lo):
    return hi.astype(jnp.float64) + lo.astype(jnp.float64)


def grid_pair_from_f32(G32):
    """Wrap an f32 block grid (e.g. assemble_kernel_grid output) as a
    pair grid with zero lo parts."""
    hi = [[blk for blk in row] for row in G32]
    lo = [
        [jnp.zeros(blk.shape, LO_DTYPE) for blk in row] for row in G32
    ]
    return hi, lo


@functools.partial(jax.jit, donate_argnums=(0, 1))
def _diag_add_blk(hi, lo, delta):
    x64 = pair_to_f64(hi, lo) + delta * jnp.eye(
        hi.shape[0], dtype=jnp.float64
    )
    return pair_split(x64)


def grid_pair_diag_add(Ghi, Glo, delta):
    """Add ``delta I`` at pair accuracy (an f32 diagonal add would round
    delta against O(1) diagonal entries at eps32 — the same size as the
    shifts this factorization exists to support)."""
    k = len(Ghi)
    hi = [list(row) for row in Ghi]
    lo = [list(row) for row in Glo]
    for i in range(k):
        hi[i][i], lo[i][i] = _diag_add_blk(
            hi[i][i], lo[i][i], jnp.float64(delta)
        )
    return hi, lo


def grid_pair_from_dense64(A64, spec):
    """Pair grid (lower triangle) from a dense f64 array (tests/tools)."""
    b = spec.b
    hi, lo = [], []
    for i in range(spec.k):
        hr, lr = [], []
        for j in range(i + 1):
            blk = jnp.asarray(A64[i * b : (i + 1) * b, j * b : (j + 1) * b])
            h, l = pair_split(blk)
            hr.append(h)
            lr.append(l)
        hi.append(hr)
        lo.append(lr)
    return hi, lo


def grid_pair_isfinite(Ghi):
    ok = jnp.bool_(True)
    for row in Ghi:
        for blk in row:
            ok = ok & jnp.all(jnp.isfinite(blk))
    return ok


# -- per-block kernels (host-sequenced; few program shapes) ------------------


@functools.partial(jax.jit, donate_argnums=(0, 1))
def _diag_chol_pair(a_hi, a_lo):
    L64 = jnp.linalg.cholesky(pair_to_f64(a_hi, a_lo))
    return pair_split(L64)


def _rsolve_f32(l, b, q=None):
    """Inline (traceable) version of blockchol._rsolve_blk's math."""
    n = l.shape[0]
    if q is None:
        q = _largest_divisor(n, 512)
    n_pan = n // q
    col = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)

    def body(p, b_):
        c0 = p * q
        lpp = jax.lax.dynamic_slice(l, (c0, c0), (q, q))
        lrow = jax.lax.dynamic_slice(l, (c0, 0), (q, n))
        lrow = jnp.where(col < c0, lrow, 0.0)
        bp = jax.lax.dynamic_slice(b_, (0, c0), (b_.shape[0], q))
        with jax.default_matmul_precision('highest'):
            rhs = bp - jnp.einsum('nc,pc->np', b_, lrow)
            xp = jax.scipy.linalg.solve_triangular(lpp, rhs.T, lower=True).T
        return jax.lax.dynamic_update_slice(b_, xp, (0, c0))

    return jax.lax.fori_loop(0, n_pan, body, b)


def _largest_divisor(n: int, cap: int) -> int:
    for d in range(min(cap, n), 0, -1):
        if n % d == 0:
            return d
    return 1


@functools.partial(jax.jit, donate_argnums=(2, 3))
def _panel_refine_pair(l_hi, l_lo, a_hi, a_lo):
    """X = A L_jj^{-T} at pair accuracy via refined f32 substitution."""
    a64 = pair_to_f64(a_hi, a_lo)
    x64 = _rsolve_f32(l_hi, a_hi).astype(jnp.float64)
    for _ in range(N_REFINE):
        xh, xl = pair_split(x64, jnp.float32)
        r64 = a64 - ozaki.ozaki_gemm_nt(xh, l_hi, lo_a=xl, lo_b=l_lo)
        dx = _rsolve_f32(l_hi, r64.astype(jnp.float32))
        x64 = x64 + dx.astype(jnp.float64)
    return pair_split(x64)


@functools.partial(jax.jit, donate_argnums=(0, 1))
def _trailing_update_pair(c_hi, c_lo, a_hi, a_lo, b_hi, b_lo):
    """C <- C - A @ B^T in pair precision (Ozaki product)."""
    p64 = ozaki.ozaki_gemm_nt(a_hi, b_hi, lo_a=a_lo, lo_b=b_lo)
    c64 = pair_to_f64(c_hi, c_lo) - p64
    return pair_split(c64)


@jax.jit
def _leaf_inv(l_hi, l_lo):
    """Dense f64 inverse of a leaf triangular factor (one-time)."""
    L64 = pair_to_f64(l_hi, l_lo)
    eye = jnp.eye(L64.shape[0], dtype=jnp.float64)
    return jax.scipy.linalg.solve_triangular(L64, eye, lower=True)


def chol_grid_pair(Ghi, Glo, sync_every: int = 16):
    """Right-looking blocked Cholesky over a pair grid (host-sequenced).

    Consumes ``(Ghi, Glo)`` (blocks donated at their factorization /
    update step); returns the factor in the same layout. Failure (not
    SPD at pair precision) yields NaNs in the hi parts — check
    :func:`grid_pair_isfinite`.
    """
    k = len(Ghi)
    Lh = [list(row) for row in Ghi]
    Ll = [list(row) for row in Glo]
    pending = 0
    for j in range(k):
        Lh[j][j], Ll[j][j] = _diag_chol_pair(Lh[j][j], Ll[j][j])
        for i in range(j + 1, k):
            Lh[i][j], Ll[i][j] = _panel_refine_pair(
                Lh[j][j], Ll[j][j], Lh[i][j], Ll[i][j]
            )
        for c in range(j + 1, k):
            for r in range(c, k):
                Lh[r][c], Ll[r][c] = _trailing_update_pair(
                    Lh[r][c], Ll[r][c],
                    Lh[r][j], Ll[r][j], Lh[c][j], Ll[c][j],
                )
                pending += 1
                if pending >= sync_every:
                    sync(Lh[r][c])
                    pending = 0
        sync(Lh[j][j])
    return Lh, Ll


def leaf_inverses(Lh, Ll):
    """Precompute f64 inverses of the diagonal leaf factors; the caller
    may drop the diagonal pair blocks afterwards (the solve only needs
    off-diagonal pairs + these inverses)."""
    return [_leaf_inv(Lh[j][j], Ll[j][j]) for j in range(len(Lh))]


@jax.jit
def _slice_leaf(dinv):
    # No donation: int8 outputs cannot reuse the f64 buffer; the caller
    # drops its reference right after.
    return ozaki.split_global_int8(dinv, n_slices=8)


def slice_leaf_inverses(Dinv):
    """Repack f64 leaf inverses as global-scale int8 slice stacks
    (8 slices = 48 bits; same bytes as f64). The strip solve applies
    them through exact int8 dots in either orientation — no resident
    f64 matrix ever feeds a dot, so XLA's f64 emulation has nothing to
    stage (measured: the staging of resident f64 leaf dots was hoisted
    across the whole solve program). Consumes the f64 inverses."""
    return [_slice_leaf(d) for d in Dinv]


def strips_from_grid(Lh, Ll):
    """Repack the factor's OFF-DIAGONAL blocks into ragged column strips.

    Strip ``j`` stacks blocks ``L[j+1..k-1][j]`` into one ``((k-1-j) b,
    b)`` pair array. The solve walks a strip block-by-block inside a
    ``fori_loop`` whose dynamic slice index defeats XLA's loop-invariant
    code motion — each pair->f64 conversion and its f64-dot emulation
    staging is transient (~8 f32 planes of ONE block), where the
    block-grid formulation staged every block's conversion concurrently
    (measured: 64 GB compile-time demand at n = 63k even with
    optimization barriers, which order consumers but not the staging).

    Consumes the grid blocks column by column (refs dropped as copied);
    the last (empty) strip is represented as None.
    """
    k = len(Lh)
    strips = []
    for j in range(k):
        if j + 1 >= k:
            strips.append(None)
            continue
        his = [Lh[i][j] for i in range(j + 1, k)]
        los = [Ll[i][j] for i in range(j + 1, k)]
        strips.append(
            (jnp.concatenate(his, axis=0), jnp.concatenate(los, axis=0))
        )
        for i in range(j + 1, k):
            Lh[i][j] = None
            Ll[i][j] = None
    return strips


def _strip_mv_sub(strip, zj, y, row0, b):
    """``y[row0:] -= strip @ zj`` block-by-block (chunked f64 staging)."""
    hi, lo = strip
    n_blk = hi.shape[0] // b
    m = zj.shape[1]

    def body(c, y):
        blk = pair_to_f64(
            jax.lax.dynamic_slice(hi, (c * b, 0), (b, b)),
            jax.lax.dynamic_slice(lo, (c * b, 0), (b, b)),
        )
        r0 = row0 + c * b
        yc = jax.lax.dynamic_slice(y, (r0, 0), (b, m))
        return jax.lax.dynamic_update_slice(y, yc - blk @ zj, (r0, 0))

    return jax.lax.fori_loop(0, n_blk, body, y)


def _strip_tmv_rowmajor(strip, xT, row0, b):
    """``(strip^T @ x[row0:])^T = x[row0:]^T @ strip`` block-by-block.

    The caller carries the backward vector ROW-major (m, n): each block
    contraction is then a standard-orientation matmul ``xT_c @ blk`` —
    an einsum contracting the block's first axis would make XLA hoist a
    persistent transposed layout copy of EVERY strip out of the CG loop
    (measured: +11.3 GB at n = 63k). Returns ``(m, b)``."""
    hi, lo = strip
    n_blk = hi.shape[0] // b
    m = xT.shape[0]

    def body(c, acc):
        blk = pair_to_f64(
            jax.lax.dynamic_slice(hi, (c * b, 0), (b, b)),
            jax.lax.dynamic_slice(lo, (c * b, 0), (b, b)),
        )
        xc = jax.lax.dynamic_slice(xT, (0, row0 + c * b), (m, b))
        return acc + xc @ blk

    return jax.lax.fori_loop(
        0, n_blk, body, jnp.zeros((m, b), jnp.float64)
    )


def solve_strips(strips, Dinv, y):
    """Solve ``(L L^T) x = y`` from column strips + leaf inverses.

    ``Dinv`` entries are either f64 matrices or ``(slices, sigma)``
    int8 stacks from :func:`slice_leaf_inverses` (the production form —
    zero f64-dot staging). Pure and jit-safe INCLUDING inside
    while_loops: every factor read is a dynamic slice or an int8 dot
    (see :func:`strips_from_grid`)."""
    sliced = isinstance(Dinv[0], tuple)
    b = Dinv[0][0].shape[1] if sliced else Dinv[0].shape[0]
    k = len(Dinv)

    def leaf(j, rhs, transpose):
        if sliced:
            sa, sig = Dinv[j]
            return ozaki.matvec_sliced(sa, sig, rhs, transpose=transpose)
        if transpose:
            return jnp.einsum('rc,rm->cm', Dinv[j], rhs)
        return Dinv[j] @ rhs

    was_vec = y.ndim == 1
    if was_vec:
        y = y[:, None]
    m = y.shape[1]
    y = y.astype(jnp.float64)
    # Forward: right-looking column substitution.
    z = jnp.zeros_like(y)
    for j in range(k):
        yj = jax.lax.dynamic_slice(y, (j * b, 0), (b, m))
        zj = leaf(j, yj, False)
        z = jax.lax.dynamic_update_slice(z, zj, (j * b, 0))
        if strips[j] is not None:
            y = _strip_mv_sub(strips[j], zj, y, (j + 1) * b, b)
    # Backward: x carried ROW-major so strip contractions stay in
    # standard orientation (see _strip_tmv_rowmajor).
    xT = jnp.zeros((m, z.shape[0]), jnp.float64)
    for j in reversed(range(k)):
        rhsT = jnp.transpose(
            jax.lax.dynamic_slice(z, (j * b, 0), (b, m))
        )
        if strips[j] is not None:
            rhsT = rhsT - _strip_tmv_rowmajor(
                strips[j], xT, (j + 1) * b, b
            )
        xj = leaf(j, jnp.transpose(rhsT), True)  # (b, m)
        xT = jax.lax.dynamic_update_slice(xT, jnp.transpose(xj), (0, j * b))
    x = jnp.transpose(xT)
    return x[:, 0] if was_vec else x


# -- int8-sliced strips: the production solve representation -----------------
#
# The pair strips are further repacked as Ozaki int8 slice stacks
# (7 slices, one power-of-two scale per strip): every factor contraction
# in the CG-time solve is then an exact int8 MXU dot. Besides removing
# all f64-dot emulation staging, int8 parameters give XLA's
# compression-remat pass nothing to clone (it was duplicating the ~11 GB
# of f32 strips even as plain program parameters), so the WHOLE CG
# iteration compiles as one program — per-block host dispatch cost
# ~5 ms/launch through the axon tunnel, i.e. ~2.3 s/iteration at k=20
# (measured), where one fused program is bandwidth-bound.

STRIP_SLICES = 7  # 42-bit coverage; sqrt(b) incoherent truncation ~2^-36


@jax.jit
def _int8_strip(hi, lo):
    # No donation: the int8 outputs cannot reuse f32/bf16 buffers; the
    # caller drops its references and the host-level sync below bounds
    # how long the pair strip outlives the conversion.
    return ozaki.split_global_int8(
        pair_to_f64(hi, lo), n_slices=STRIP_SLICES
    )


def int8_strips(strips):
    """Consume pair strips into (slices, sigma) int8 stacks.

    Frees each pair strip as it is converted (both representations of
    the full factor alive at once would need ~24 GB at n = 63k); the
    per-strip f64 intermediate is transient (donated)."""
    out = []
    for idx in range(len(strips)):
        s = strips[idx]
        if s is None:
            out.append(None)
            continue
        strips[idx] = None
        out.append(_int8_strip(s[0], s[1]))
        del s
        # Throttle every few strips: queued conversions hold their pair
        # inputs (a per-strip sync costs a tunnel round-trip each).
        if idx % 4 == 3:
            sync(out[-1][0])
    return out


def _combine_levels(levels, sig_a, sig_b, q=ozaki.Q_BITS):
    acc = jnp.zeros(levels[0].shape, dtype=jnp.float64)
    for lv in reversed(range(len(levels))):
        if levels[lv] is not None:
            acc = acc + levels[lv].astype(jnp.float64) * (
                2.0 ** (-q * (lv + 2))
            )
    return acc * sig_a.astype(jnp.float64) * sig_b.astype(jnp.float64)


def _strip_apply_int8(sl, sigma, zj, y, row0, b):
    """``y[row0:] -= strip @ zj`` with exact int8 block dots."""
    S = sl.shape[0]
    m = zj.shape[1]
    svz, sigz = ozaki.split_global_int8(zj, n_slices=8)
    n_blk = sl.shape[1] // b
    keep = S  # pairs i + j < S: truncation ~ operand slicing level

    def body(c, y):
        blk = jax.lax.dynamic_slice(sl, (0, c * b, 0), (S, b, b))
        levels = [None] * keep
        for i in range(S):
            for jv in range(svz.shape[0]):
                lv = i + jv
                if lv >= keep:
                    continue
                p = jax.lax.dot_general(
                    blk[i], svz[jv],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32,
                )
                levels[lv] = p if levels[lv] is None else levels[lv] + p
        upd = _combine_levels(levels, sigma, sigz)
        r0 = row0 + c * b
        yc = jax.lax.dynamic_slice(y, (r0, 0), (b, m))
        return jax.lax.dynamic_update_slice(y, yc - upd, (r0, 0))

    return jax.lax.fori_loop(0, n_blk, body, y)


def _strip_tapply_int8(sl, sigma, xT, row0, b):
    """``(strip^T x[row0:])^T`` row-major with exact int8 block dots."""
    S = sl.shape[0]
    m = xT.shape[0]
    n_blk = sl.shape[1] // b
    keep = S

    def body(c, accT):
        blk = jax.lax.dynamic_slice(sl, (0, c * b, 0), (S, b, b))
        xc = jax.lax.dynamic_slice(xT, (0, row0 + c * b), (m, b))
        sxc, sigx = ozaki.split_global_int8(xc, n_slices=8)
        levels = [None] * keep
        for jv in range(sxc.shape[0]):
            for i in range(S):
                lv = i + jv
                if lv >= keep:
                    continue
                p = jax.lax.dot_general(
                    sxc[jv], blk[i],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32,
                )
                levels[lv] = p if levels[lv] is None else levels[lv] + p
        return accT + _combine_levels(levels, sigma, sigx)

    return jax.lax.fori_loop(
        0, n_blk, body, jnp.zeros((m, b), jnp.float64)
    )


def solve_strips_int8(sstrips, Dinv, y):
    """Solve ``(L L^T) x = y`` from int8 strip stacks + int8 leaf
    stacks. Pure, jit-safe, no f64 dots anywhere."""
    k = len(Dinv)
    b = Dinv[0][0].shape[1]
    was_vec = y.ndim == 1
    if was_vec:
        y = y[:, None]
    m = y.shape[1]
    n_in = y.shape[0]
    y = y.astype(jnp.float64)
    if n_in < k * b:
        yp = jnp.zeros((k * b, m), jnp.float64)
        y = jax.lax.dynamic_update_slice(yp, y, (0, 0))
    z = [None] * k
    for j in range(k):
        yj = jax.lax.dynamic_slice(y, (j * b, 0), (b, m))
        z[j] = ozaki.matvec_sliced(Dinv[j][0], Dinv[j][1], yj)
        if sstrips[j] is not None:
            y = _strip_apply_int8(
                sstrips[j][0], sstrips[j][1], z[j], y, (j + 1) * b, b
            )
    xT = jnp.zeros((m, k * b), jnp.float64)
    for j in reversed(range(k)):
        rhsT = jnp.transpose(z[j])
        if sstrips[j] is not None:
            rhsT = rhsT - _strip_tapply_int8(
                sstrips[j][0], sstrips[j][1], xT, (j + 1) * b, b
            )
        xj = ozaki.matvec_sliced(
            Dinv[j][0], Dinv[j][1], jnp.transpose(rhsT), transpose=True
        )
        xT = jax.lax.dynamic_update_slice(
            xT, jnp.transpose(xj), (0, j * b)
        )
    x = jnp.transpose(xT)[:n_in]
    return x[:, 0] if was_vec else x


def _seq(block, dep):
    """Tie a block (conversion) to the running substitution value.

    The substitution itself is data-sequential, but the pair->f64
    conversions and the f64-dot emulation stagings of DIFFERENT blocks
    have no mutual dependencies — XLA schedules them all up front and
    their ~8x f32-split buffers coexist (measured: 59.5 GB compile-time
    demand at n = 63k, k = 20). The barrier makes each block's use
    depend on the previous step, serializing liveness."""
    block, _ = jax.lax.optimization_barrier((block, dep))
    return block


def solve_grid_pair(Lh, Ll, Dinv, y):
    """Solve ``(L L^T) x = y`` at pair accuracy. Pure function — called
    once per CG iteration from a *host* loop (see module docstring for
    why not inside a while_loop). ``Dinv`` are f64 leaf inverses; only
    the OFF-diagonal pair blocks are read (the caller may free the
    diagonal pair blocks after :func:`leaf_inverses`)."""
    k = len(Lh)
    b = Dinv[0].shape[0]
    was_vec = y.ndim == 1
    if was_vec:
        y = y[:, None]
    yb = [
        jax.lax.dynamic_slice_in_dim(y, i * b, b, 0).astype(jnp.float64)
        for i in range(k)
    ]
    z = []
    for j in range(k):
        rhs = yb[j]
        for c in range(j):
            blk = _seq(pair_to_f64(Lh[j][c], Ll[j][c]), rhs[0, 0])
            rhs = rhs - blk @ z[c]
        z.append(_seq(Dinv[j], rhs[0, 0]) @ rhs)
    x = [None] * k
    for j in reversed(range(k)):
        rhs = z[j]
        for r in range(j + 1, k):
            # Contract the FIRST axis (no persistent transposed copies).
            blk = _seq(pair_to_f64(Lh[r][j], Ll[r][j]), rhs[0, 0])
            rhs = rhs - jnp.einsum('rc,rm->cm', blk, x[r])
        x[j] = jnp.einsum('rc,rm->cm', _seq(Dinv[j], rhs[0, 0]), rhs)
    out = jnp.concatenate(x, axis=0)
    return out[:, 0] if was_vec else out
