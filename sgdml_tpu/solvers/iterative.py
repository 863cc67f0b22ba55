"""Iterative solver: Nystrom-preconditioned conjugate gradients, matrix-free.

For training sets where the ``(3NM)^2`` kernel no longer fits device memory,
the system

    A alpha = y,    A = -K_asm + lam I   (PSD; alpha returned with the
                                          analytic solver's sign convention
                                          alpha = -A^{-1} y)

is solved matrix-free: the matvec ``A v`` is *a batched prediction pass over
all training points* (reference: sgdml/solvers/iterative.py:183-206) — here
one jit-compiled XLA program (tables from ``v`` + the five-matmul predictor),
no host round-trips inside an iteration.

Preconditioner: Nystrom low-rank approximation from ``k`` inducing columns
chosen by leverage scores (reference: iterative.py:353-411). With PSD
columns ``C = -K_asm[:, cols]``, ``W = C[cols, :]``:

    Q = C L_W^{-T}           (L_W = chol(W))
    M v = lam^{-1} (v - F^T (F v)),   F = L^{-1} Q^T,  L = chol(Q^T Q + lam I)

which is the Woodbury inverse of ``(Q Q^T + lam I)`` — positive definite by
construction (the reference builds the same factor through a two-stage
in-place Cholesky pipeline, iterative.py:208-351; this implementation keeps
the algebra explicit and runs both stages on device).

Control flow is hybrid: CG runs in fixed-size jitted chunks
(``lax.while_loop`` inside, early exit on convergence); the Python driver
between chunks handles progress reporting, ~2-minute model checkpoints, CG
effectiveness monitoring and preconditioner-strengthening restarts
(1.2x inducing points, max 6 restarts — reference: iterative.py:729-804).
"""

from __future__ import annotations

import functools
import logging
import timeit

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import descriptor as desc_ops
from ..ops import ozaki
from ..ops.kernel import (
    assemble_kernel_columns,
    assemble_kernel_columns_range,
)
from ..predict import predict_from_tables

log = logging.getLogger(__name__)

CG_STEPS_HIST_LEN = 100  # window for solver-effectiveness estimate
EFF_RESTART_THRESH = 0  # restart when effectiveness <= this percentage
MAX_NUM_RESTARTS = 6
CHECKPOINT_INTERVAL_S = 2 * 60.0
CG_CHUNK_ITERS = 50  # CG iterations per jitted chunk
# Residual replacement (van der Vorst & Ye, SIAM J. Sci. Comput. 1999):
# the recursive CG residual drifts from the true one b - Ax — measured
# 30-40% over ~300 iterations at MD22 M=3000 with the int8 matvec.
# Upward drift trips the stall detector on a healthy solve (the round-3
# k=15 attempt burned all 6 restarts this way); downward drift declares
# false convergence. One exact f64 matvec per 50-iteration chunk (~2-6%
# of chunk cost) measures the truth; past this relative gap the
# recursion is re-anchored at it (r, z, rz replaced; x and the search
# direction p kept).
RESID_REPLACE_DRIFT = 0.02
# Cap-bounded re-seeds (k cannot grow) cost one exact matvec, unlike the
# reference's restarts which rebuild a 1.2x-larger preconditioner — so
# under an explicit wall-clock budget they are not counted against
# MAX_NUM_RESTARTS (measured at MD22 M=3000 k=15: the old policy burned
# its 6 restarts on a healthy oscillating solve and gave up at resid 22,
# 300x from the target).
#
# Budgeted stagnation policy. At the cap the residual NORM oscillates
# (measured 2x above the best) while the A-norm error — what CG actually
# minimizes — keeps falling, so stalls only count once the BEST residual
# has stagnated for an adaptive window (the gaps between new bests grow
# as convergence digs into the spectrum: the window is 2x the largest
# gap seen, floored at RESEED_STAGNATION_ITERS). On a stagnation event
# the solver re-seeds AT MOST ONCE per best iterate — CG is
# deterministic, so a second re-seed from the same best_x would replay
# the identical trajectory (measured: three 500-iteration replays pinned
# at resid 12.067096 to 8 digits) — then escalates the matvec precision
# (a genuinely different operator), and finally grinds uninterrupted,
# giving up only after DEEP_STAGNATION_BUDGET_FRAC of the wall budget
# (or, with no budget given, DEEP_STAGNATION_ITERS_FRAC of the
# iterations spent so far) passes without a new best. This policy is
# unconditional at the memory cap — it is the policy that converged
# MD22 M=3000 (BENCH_NOTES r3g); the counted-restart give-up only
# governs preconditioner GROWTH restarts below the cap.
RESEED_STAGNATION_ITERS = 500
DEEP_STAGNATION_BUDGET_FRAC = 0.25
# Deep-stagnation bound when no wall budget is given: give up only after
# this fraction of the iterations spent so far produced no new best —
# the iteration-count analog of DEEP_STAGNATION_BUDGET_FRAC (at a steady
# rate the two coincide), so the converging policy needs no max_seconds.
DEEP_STAGNATION_ITERS_FRAC = 0.25
# CG matvec precision ladder. An inexact matvec stalls CG at a residual
# floor ~ ||b|| * eps_mv * kappa (inexact-Krylov stagnation): at MD22
# M=3000 (||b||=735, kappa ~ 1e9) the 6-slice int8 matvec (~2^-36)
# floored at resid ~12 through 1500 uninterrupted iterations and two
# fresh-Krylov re-seeds. When a budgeted re-seed cycle goes barren the
# solver climbs one rung (+2 slices = 4096x lower truncation, ~15-30%
# matvec cost) instead of giving up; 'native' emulated f64 is the last
# rung. Giving up on barren cycles only happens at the top rung.
MV_MM_LADDER = ('ozaki', 'ozaki8', 'ozaki10', 'native')


# ---------------------------------------------------------------------------
# Device-side pieces
# ---------------------------------------------------------------------------


@functools.partial(
    jax.jit,
    static_argnames=('n_atoms', 'desc_perms_key', 'use_E_cstr', 'mm'),
)
def _matvec_A(
    v, Xq, Jcq, X, Jc, sig, lam, *, n_atoms, desc_perms_key, use_E_cstr,
    mm='native',
):
    """A v = -predict_train(v) + lam v, fully on device.

    ``Xq/Jcq`` are the query-side descriptor arrays and ``X/Jc`` the
    table side; single-device callers pass the same arrays twice. On a
    mesh, the query side arrives batch-sharded and the table side
    replicated — GSPMD then partitions the five-matmul prediction over
    devices and reduces with psum (the TPU-native analog of the
    reference's multi-process matvec, sgdml/solvers/iterative.py:183-206).
    """
    desc_perms = np.frombuffer(desc_perms_key[0], dtype=np.int64).reshape(
        desc_perms_key[1]
    )
    m = X.shape[0]
    dim_i = 3 * n_atoms

    if use_E_cstr:
        v_F, v_E = v[:-m], v[-m:]
    else:
        v_F, v_E = v, None

    JA_flat = desc_ops.jac_dot_vec(Jc, v_F.reshape(m, dim_i), n_atoms)
    dp = jnp.asarray(desc_perms)
    Xt = X[:, dp].reshape(-1, X.shape[1])
    JA = JA_flat[:, dp].reshape(-1, X.shape[1])
    aE = None
    if use_E_cstr:
        aE = jnp.repeat(v_E, desc_perms.shape[0])

    E, F = predict_from_tables(
        Xq, Jcq, Xt, JA, aE, sig, 1.0, 0.0, n_atoms=n_atoms, mm=mm
    )
    # The query side may be zero-padded to a device-count multiple for
    # sharding; only the first m rows are real training points.
    E, F = E[:m], F[:m]
    pred = jnp.concatenate([F.reshape(-1), -E]) if use_E_cstr else F.reshape(-1)
    return -pred + lam * v


_MV_CHUNK = 12288  # max columns per f64 factor-matvec chunk


def _factor_mv_chunk(n: int) -> int:
    """Column chunk for the Woodbury factor matvecs. XLA's emulated-f64
    dot stages ~8 f32-split copies of its operands (measured: a 9.6 GB
    AllocateBuffer for the full (5103, 63000) factor), so the matvecs
    walk the factor in column chunks; each chunk is staged transiently
    inside the loop."""
    d = _largest_divisor(n, _MV_CHUNK)
    return d if d >= 1024 else n


def _factor_apply(Fp, v):
    """``v - F^T (F v)`` with chunked matvecs; v already padded/typed."""
    k, n = Fp.shape
    ch = _factor_mv_chunk(n)
    n_ch = n // ch

    def fwd(i, acc):
        c0 = i * ch
        Fc = jax.lax.dynamic_slice(Fp, (0, c0), (k, ch))
        vc = jax.lax.dynamic_slice(v, (c0,), (ch,))
        return acc + Fc @ vc

    w = jax.lax.fori_loop(0, n_ch, fwd, jnp.zeros((k,), Fp.dtype))

    def bwd(i, out):
        c0 = i * ch
        Fc = jax.lax.dynamic_slice(Fp, (0, c0), (k, ch))
        # einsum over k (NOT Fc.T @ w): a transpose inside the CG
        # while_loop would be hoisted into a persistent transposed copy.
        return jax.lax.dynamic_update_slice(
            out, jnp.einsum('kc,k->c', Fc, w), (c0,)
        )

    return v - jax.lax.fori_loop(0, n_ch, bwd, jnp.zeros_like(v))


_init_z = jax.jit(_factor_apply)


@jax.jit
def _init_z_plain(Fp, v):
    """Plain two-matmul Woodbury apply for the mesh path: with a
    column-sharded factor, GSPMD partitions ``F v`` over devices (psum on
    the contraction) — no host-chosen chunking, and no f64-split staging
    concern on the CPU mesh."""
    return v - jnp.einsum('kc,k->c', Fp, Fp @ v)


def _factor_apply_ozaki(sF, sigF, v):
    """``v - F^T (F v)`` from the int8 slice-stack factor (traced helper).

    No f64 dot ever runs: both directions are exact int8-MXU level sums
    recombined in f64 (ops/ozaki.py), so XLA has nothing to stage for f64
    emulation — the CG-time working set is the 8 B/elem stack itself,
    half the 16 B/elem of the chunked-f64 apply (and the matvecs run at
    int8 rather than emulated-f64 rates)."""
    chunk = sF.shape[2] // sigF.shape[0]  # per-chunk scales define the grid
    w = ozaki.matvec_sliced_long(sF, sigF, v, chunk=chunk)
    return v - ozaki.matvec_sliced_long_t(sF, sigF, w, chunk=chunk)


@functools.lru_cache(maxsize=None)
def _stack_fmt():
    """Row-major layout pin for the int8 slice stack (TPU only; None
    elsewhere — the CPU test backend has no layout choices to pin).

    Left to auto layout assignment, XLA picks major_to_minor=(1, 0, 2)
    for the stack PARAMETER of the apply programs while every in-program
    use (the dynamic-slice column walks) wants row-major — so it
    materializes a full relayout copy of the stack as an HLO temp
    (measured: an 8 GB copy at MD22 M=3000, the difference between
    fitting and a compile-time OOM at 16.1/15.75 GB). Pinning row-major
    on the producers (zeros + in-place chunk writes) and consumers
    (`_init_z_ozaki`, `_pcg_chunk`) keeps ONE copy-free layout end to
    end: the pinned apply compiles with ~1.5 MB of HLO temp."""
    if jax.devices()[0].platform != 'tpu':
        return None
    from jax.experimental.layout import Format, Layout
    from jax.sharding import SingleDeviceSharding

    return Format(
        Layout(major_to_minor=(0, 1, 2)),
        SingleDeviceSharding(jax.devices()[0]),
    )


@functools.lru_cache(maxsize=None)
def _init_z_ozaki_fn():
    fmt = _stack_fmt()
    kw = {} if fmt is None else {'in_shardings': (fmt, None, None)}
    return jax.jit(_factor_apply_ozaki, **kw)


def _init_z_ozaki(sF, sigF, v):
    return _init_z_ozaki_fn()(sF, sigF, v)


def _factor_ncols(Fp):
    """Column count of a factor in either representation (dense (k, n)
    f64, or the ('ozaki') (slices, sigmas) stack)."""
    return Fp[0].shape[2] if isinstance(Fp, tuple) else Fp.shape[1]


_PCG_STATIC = (
    'n_atoms', 'desc_perms_key', 'use_E_cstr', 'chunk_iters',
    'apply_mode', 'mm', 'mesh',
)


@functools.lru_cache(maxsize=None)
def _pcg_chunk_jit(pin_stack: bool):
    """Jitted `_pcg_chunk` accepting the statics as keywords, with the
    int8 slice stack's row-major layout pinned in ozaki mode (see
    `_stack_fmt`) — without the pin, auto layout assignment
    relayout-copies the full stack inside the heaviest program of the
    solve. pjit rejects kwargs when in_shardings is given, so the pinned
    variant routes the statics through positional static_argnums."""
    fmt = _stack_fmt() if pin_stack else None
    if fmt is None:
        return jax.jit(_pcg_chunk, static_argnames=_PCG_STATIC)

    def positional(state, Fp, Xq, Jcq, X, Jc, sig, lam, b_norm, rtol,
                   n_atoms, desc_perms_key, use_E_cstr, chunk_iters,
                   apply_mode, mm, mesh):
        return _pcg_chunk(
            state, Fp, Xq, Jcq, X, Jc, sig, lam, b_norm, rtol,
            n_atoms=n_atoms, desc_perms_key=desc_perms_key,
            use_E_cstr=use_E_cstr, chunk_iters=chunk_iters,
            apply_mode=apply_mode, mm=mm, mesh=mesh,
        )

    jf = jax.jit(
        positional,
        static_argnums=tuple(range(10, 17)),
        in_shardings=(None, (fmt, None)) + (None,) * 8,
    )

    def call(state, Fp, Xq, Jcq, X, Jc, sig, lam, b_norm, rtol, *,
             n_atoms, desc_perms_key, use_E_cstr, chunk_iters,
             apply_mode, mm, mesh):
        return jf(
            state, Fp, Xq, Jcq, X, Jc, sig, lam, b_norm, rtol,
            n_atoms, desc_perms_key, use_E_cstr, chunk_iters,
            apply_mode, mm, mesh,
        )

    return call


def _pcg_chunk(
    state, Fp, Xq, Jcq, X, Jc, sig, lam, b_norm, rtol,
    *, n_atoms, desc_perms_key, use_E_cstr, chunk_iters,
    apply_mode='chunk', mm='native', mesh=None,
):
    """Jitted fixed-size PCG chunk.

    state: (x, r, z, p, rz, it, resid_hist, n_bad) — resid_hist records
    the residual norm of each step in this chunk (for host-side
    effectiveness monitoring); n_bad counts PSD-guard trips (beta=0
    unpreconditioned steps) in this chunk — frequent trips mean CG is
    degenerating to steepest descent and the factor needs more slices.
    The while_loop exits early on convergence.

    All data (descriptor tables, factor, scalars) enters as *arguments*,
    never as closure constants: constants would be baked into the program,
    making every new training split a fresh (multi-minute, remote) XLA
    compile of this — the heaviest — program.
    """

    def M_apply(v):
        if apply_mode == 'ozaki_mesh_bordered':
            # The bordered apply splices its own padding between the
            # sharded force block and the replicated E border — the
            # tail-pad convention below would misalign the two.
            from ..parallel.spmd import ozaki_factor_apply_sharded_bordered

            out = ozaki_factor_apply_sharded_bordered(
                Fp[0], Fp[1], Fp[2], v, mesh=mesh
            )
            return out.astype(v.dtype) / lam
        # Fp may be zero-padded along its column axis to a device or
        # slice-chunk multiple (padded columns contribute nothing).
        vp = jnp.pad(v, (0, _factor_ncols(Fp) - v.shape[0]))
        if apply_mode == 'ozaki':
            out = _factor_apply_ozaki(Fp[0], Fp[1], vp)
        elif apply_mode == 'ozaki_mesh':
            from ..parallel.spmd import ozaki_factor_apply_sharded

            out = ozaki_factor_apply_sharded(Fp[0], Fp[1], vp, mesh=mesh)
        elif apply_mode == 'plain':
            out = _init_z_plain(Fp, vp.astype(Fp.dtype))
        else:
            out = _factor_apply(Fp, vp.astype(Fp.dtype))
        return out[: v.shape[0]].astype(v.dtype) / lam

    def A_apply(v):
        return _matvec_A(
            v, Xq, Jcq, X, Jc, sig, lam,
            n_atoms=n_atoms,
            desc_perms_key=desc_perms_key,
            use_E_cstr=use_E_cstr,
            mm=mm,
        )

    def cond(carry):
        _, r, _, _, _, it, _, _ = carry
        return jnp.logical_and(
            it < chunk_iters, jnp.linalg.norm(r) > rtol * b_norm
        )

    def body(carry):
        x, r, z, p, rz, it, hist, n_bad = carry
        Ap = A_apply(p)
        alpha = rz / (p @ Ap)
        x = x + alpha * p
        r = r - alpha * Ap
        z = M_apply(r)
        rz_new = r @ z
        # PSD guard: at large k the Woodbury correction cancels to
        # ~lam * ||v|| and f64 rounding can push I - F^T F (hence r.z)
        # slightly negative, which sends plain PCG to NaN and trips the
        # stall detector. Fall back to an unpreconditioned step AND
        # restart the search direction (beta = 0): carrying a beta that
        # mixes the two inner products destroys conjugacy.
        bad = jnp.logical_not(rz_new > 0) | jnp.logical_not(
            jnp.isfinite(rz_new)
        )
        z = jnp.where(bad, r, z)
        rz_new = jnp.where(bad, r @ r, rz_new)
        beta = jnp.where(bad, 0.0, rz_new / rz)
        p = z + beta * p
        hist = hist.at[it].set(jnp.linalg.norm(r))
        n_bad = n_bad + bad.astype(jnp.int32)
        return (x, r, z, p, rz_new, it + 1, hist, n_bad)

    x, r, z, p, rz, _, hist, n_bad = state
    hist = jnp.zeros_like(hist)
    return jax.lax.while_loop(
        cond, body, (x, r, z, p, rz, 0, hist, jnp.zeros_like(n_bad))
    )


_SOLVE_CHUNK = 8192  # columns per triangular-solve / gram chunk


@jax.jit
def _chol_reg(M, reg):
    """Regularized Cholesky of a (k, k) SPD block + finiteness flag."""
    k = M.shape[0]
    L = jnp.linalg.cholesky(M + reg * jnp.eye(k, dtype=M.dtype))
    return L, jnp.all(jnp.isfinite(L))


@functools.partial(jax.jit, donate_argnums=(1,), static_argnames=('nb',))
def _solve_chunk(L, B_chunk, *, nb):
    """One (k, chunk) triangular solve + its gram contribution."""
    from ..ops.linalg import blocked_tri_solve

    Y = blocked_tri_solve(L, B_chunk, nb=nb)
    return Y, Y @ Y.T


@functools.partial(jax.jit, donate_argnums=(1,), static_argnames=('nb',))
def _solve_chunk_nogram(L, B_chunk, *, nb):
    from ..ops.linalg import blocked_tri_solve

    return blocked_tri_solve(L, B_chunk, nb=nb)


@functools.partial(
    jax.jit, donate_argnums=(1,), static_argnames=('nb', 'ns')
)
def _solve_chunk_oz(L, B_chunk, *, nb, ns=8):
    """One (k, chunk) triangular solve + its Gram contribution, with the
    Gram as an Ozaki int8-MXU GEMM (``ns`` slices, default 8 ~ 48-bit
    operands, exact level sums) instead of an emulated-f64 ``Y Y^T`` —
    the factor-build GEMM at int8 rather than 2 TFLOP/s emulated-f64
    rates."""
    from ..ops.linalg import blocked_tri_solve

    Y = blocked_tri_solve(L, B_chunk, nb=nb)
    hi = Y.astype(jnp.float32)
    lo = (Y - hi.astype(jnp.float64)).astype(jnp.float32)
    G = ozaki.ozaki_gemm_nt(hi, hi, lo_a=lo, lo_b=lo, n_slices=max(ns, 8))
    return Y, G


@functools.partial(
    jax.jit, donate_argnums=(1,), static_argnames=('nb', 'ns')
)
def _solve_chunk_final_oz(L, Y_chunk, *, nb, ns=8):
    """Pass-2 chunk in slice-output mode: F chunk = L^{-1} Y (donating Y),
    its leverage-score contribution, and the chunk's int8 slice stack —
    the f64 F chunk dies inside this program, so the full f64 factor
    never exists (the build's high-water mark stays ~``ns`` B/elem)."""
    from ..ops.linalg import blocked_tri_solve

    Fc = blocked_tri_solve(L, Y_chunk, nb=nb)
    lev = jnp.sum(Fc * Fc, axis=0)
    s, sig = ozaki.split_global_int8(Fc, n_slices=ns)
    return lev, s, sig


def _nystrom_factor_from_cols(C_psd, cols, lam, reg_w, reg_i,
                              to_slices: bool = False, n_slices: int = 8):
    """Build the Woodbury factor F (k, n) from PSD kernel columns.

    C_psd: (n, k) PSD columns (device array). cols: (k,) host indices of
    the inducing columns. reg_w / reg_i: diagonal regularization added
    before the two Cholesky stages (the caller's ladder retries with
    larger values on failure).

    Numerics must stay at ~f64 accuracy: the Woodbury correction
    ``(v - F^T F v)/lam`` cancels catastrophically at lam ~ 1e-10, so an
    f32 factor destroys CG convergence (measured); the int8 slice-stack
    mode (``to_slices``) carries 48 bits below each chunk scale —
    pair-grade, measured equivalent in CG behavior. Memory is bounded by a *host-level* pipeline
    over column chunks — device loops with (k, n)-sized carries make XLA
    stage one full-width buffer per iteration, which exhausts HBM at MD22
    scale (measured: 67 GB demand at k=5733, n=63000).
    """
    n, k = C_psd.shape
    dt = C_psd.dtype
    nb = 128 if k % 128 == 0 else _largest_divisor(k, 128)
    chunk = min(_SOLVE_CHUNK, n)

    W = C_psd[jnp.asarray(np.asarray(cols))]  # (k, k)
    Lw, ok_w = _chol_reg(W, jnp.asarray(reg_w, dt))
    if not bool(ok_w):
        return None, None, False

    # Pass 1: Qt chunks + gram accumulation. Chunks keep a reference to
    # their slice only; C_psd is freed after the pass.
    qt_chunks = []
    gram = jnp.zeros((k, k), dtype=dt)
    for c0 in range(0, n, chunk):
        c1 = min(c0 + chunk, n)
        sl = C_psd[c0:c1].T  # (k, <=chunk)
        if to_slices:
            # Zero-pad the last chunk to the common width (padded columns
            # drop out of every product); the Gram runs as an Ozaki int8
            # GEMM instead of an emulated-f64 Y Y^T.
            if c1 - c0 < chunk:
                sl = jnp.pad(sl, ((0, 0), (0, chunk - (c1 - c0))))
            Y, G = _solve_chunk_oz(Lw, sl, nb=nb, ns=n_slices)
        else:
            Y, G = _solve_chunk(Lw, sl, nb=nb)
        qt_chunks.append(Y)
        gram = gram + G
    del C_psd

    L, ok_i = _chol_reg(gram, jnp.asarray(lam + reg_i, dt))
    if not bool(ok_i):
        return None, None, False

    if to_slices:
        # Pass 2, slice mode: each f64 F chunk lives only inside its own
        # jitted program (Y donated in, per-chunk-scaled int8 slices out),
        # so the full f64 factor never exists — the build high-water mark
        # stays ~8 B/elem and the CG-time factor is the 8-slice stack.
        lev_chunks, s_chunks, sig_chunks = [], [], []
        for Y in qt_chunks:
            lev, sc, sig = _solve_chunk_final_oz(L, Y, nb=nb, ns=n_slices)
            lev_chunks.append(lev)
            s_chunks.append(sc)
            sig_chunks.append(sig)
        del qt_chunks
        sF = jnp.concatenate(s_chunks, axis=2)
        del s_chunks
        sigF = jnp.stack(sig_chunks)
        lev_scores = jnp.concatenate(lev_chunks)[:n]
        return (sF, sigF), lev_scores, True

    # Pass 2: F chunks; Qt chunks are donated away one by one.
    f_chunks = [
        _solve_chunk_nogram(L, Y, nb=nb) for Y in qt_chunks
    ]
    del qt_chunks
    F = jnp.concatenate(f_chunks, axis=1)  # (k, n)
    del f_chunks
    lev_scores = jnp.sum(F * F, axis=0)
    return F, lev_scores, True


def _largest_divisor(n: int, cap: int) -> int:
    for d in range(min(cap, n), 0, -1):
        if n % d == 0:
            return d
    return 1


# -- streaming (two-pass) factor build --------------------------------------


@jax.jit
def _w_rows(C, idx):
    """Fixed-width row gather for the inducing-block extraction (one
    compile per sweep; padded indices are discarded on host)."""
    return jnp.take(C, idx, axis=0)


@functools.partial(jax.jit, donate_argnums=(0, 2), static_argnames=('nb',))
def _gram_accum_y(gram, Lw, C, *, nb):
    """``gram + Y Y^T`` for one assembly chunk, ``Y = L_W^{-1} C^T``.

    The triangular solve WHITENS the chunk before the Ozaki int8 Gram —
    truncating the raw columns instead would amplify the 48-bit error by
    cond(W) through the later ``L_W^{-1} (.) L_W^{-T}`` projection
    (measured: 3e-3 relative factor error at a mere m=40 test system vs
    <1e-7 this way). Identical error structure to the one-pass build's
    ``_solve_chunk_oz``. Chunk and accumulator are donated."""
    from ..ops.linalg import blocked_tri_solve

    Y = blocked_tri_solve(Lw, C.T, nb=nb)
    hi = Y.astype(jnp.float32)
    lo = (Y - hi.astype(jnp.float64)).astype(jnp.float32)
    return gram + ozaki.ozaki_gemm_nt(hi, hi, lo_a=lo, lo_b=lo, n_slices=8)


def _f_chunk_streamed_impl(Lw, L, C, *, nb, ns=8):
    """One streamed factor chunk: ``F_c = L^{-1} L_W^{-1} C_c^T`` via two
    triangular solves (the one-pass build's exact arithmetic), its
    leverage-score contribution, and the chunk's int8 slice stack. The
    f64 chunk is donated in and dies here — neither the f64 column block
    nor the f64 factor ever exists on device."""
    from ..ops.linalg import blocked_tri_solve

    F = blocked_tri_solve(L, blocked_tri_solve(Lw, C.T, nb=nb), nb=nb)
    lev = jnp.sum(F * F, axis=0)
    s, sg = ozaki.split_global_int8(F, n_slices=ns)
    return lev, s, sg


@functools.lru_cache(maxsize=None)
def _f_chunk_streamed_fn():
    """Jitted chunk producer with the int8 slice chunk's OUTPUT layout
    pinned row-major (see _stack_fmt). Load-bearing: fed an auto-layout
    (1, 0, 2) chunk, XLA silently OVERRIDES the chunk writer's pinned
    output layout to (1, 0, 2) — output layout pins are soft where input
    pins are hard-checked — so the SECOND chunk write of every build
    failed its input check (measured at the MD22 M=1000 E-constrained
    shape (8, 6300, 187200), where dim0=8 matching the sublane tile
    makes (1, 0, 2) XLA's auto choice; isolation-reproduced, probe3/4).
    With every operand row-major the writer's pin holds through repeated
    donated writes."""
    fmt = _stack_fmt()
    kw = {} if fmt is None else {'out_shardings': (None, fmt, None)}
    return jax.jit(
        _f_chunk_streamed_impl, donate_argnums=(2,),
        static_argnames=('nb', 'ns'), **kw,
    )


def _f_chunk_streamed(Lw, L, C, *, nb, ns=8):
    return _f_chunk_streamed_fn()(Lw, L, C, nb=nb, ns=ns)


def _write_slices_impl(sF, s_c, c0):
    """In-place write of one chunk's slice stack into the preallocated
    factor (donated: concatenating chunks at the end would transiently
    double the stack — the build's would-be high-water mark)."""
    return jax.lax.dynamic_update_slice(sF, s_c, (0, 0, c0))


@functools.lru_cache(maxsize=None)
def _write_slices_fn():
    """Donating chunk write with the stack's row-major layout pinned on
    both sides (same-layout donation aliases in place; see _stack_fmt).
    The CHUNK input is pinned row-major too: an auto-layout (1, 0, 2)
    chunk operand makes XLA override the OUTPUT pin to (1, 0, 2) —
    output layout pins are soft — which broke the next write's
    hard-checked input pin (see _f_chunk_streamed_fn)."""
    fmt = _stack_fmt()
    kw = {} if fmt is None else {
        'in_shardings': (fmt, fmt, None), 'out_shardings': fmt,
    }
    return jax.jit(_write_slices_impl, donate_argnums=(0,), **kw)


def _ensure_chunk_layout(s_c):
    """Relayout a slice chunk to the stack's row-major pin if needed.

    The chunk producer pins its output row-major (_f_chunk_streamed_fn),
    but OUTPUT layout pins are soft: in the full MD22 M=1000
    E-constrained build the pin held in isolation yet was overridden to
    (1, 0, 2) in the real program (whose f64 column-chunk operand has a
    different layout history than any isolation repro). jax.device_put
    to an explicit Format is the one layout-control path observed to
    ALWAYS hold (probe4), and it is a no-op copy when the producer's pin
    did hold; the ~producer-chunk-sized copy when it did not is noise
    next to the chunk's assembly cost."""
    fmt = _stack_fmt()
    if fmt is None:
        return s_c
    l = getattr(getattr(s_c, 'format', None), 'layout', None)
    if l is not None and tuple(l.major_to_minor) == tuple(
        fmt.layout.major_to_minor
    ):
        return s_c
    return jax.device_put(s_c, fmt)


def _write_slices(sF, s_c, c0):
    try:
        return _write_slices_fn()(sF, _ensure_chunk_layout(s_c), c0)
    except ValueError:
        # Diagnose layout-pin violations with the actual device layouts
        # (observed once in the wild: a stack that left the pinned
        # allocator with major_to_minor=(1, 0, 2) despite the
        # out_shardings pin; see _alloc_stack).
        log.error(
            'Slice-stack write failed. stack layout=%s chunk layout=%s',
            getattr(getattr(sF, 'format', None), 'layout', '?'),
            getattr(getattr(s_c, 'format', None), 'layout', '?'),
        )
        raise


def _alloc_stack(shape, chunk_rows):
    """Allocate the pinned-layout slice stack, verifying the pin took.

    The row-major pin is load-bearing (see _stack_fmt): a stack in any
    other layout either relayout-copies (2x a near-HBM-sized array) or
    compile-OOMs in the apply programs. Root cause of the in-the-wild
    violations (MD22-class E-constrained builds, 9.4 GB stack): OUTPUT
    layout pins are soft — fed an auto-layout (1, 0, 2) chunk, the
    writer emitted a (1, 0, 2) stack despite its out_shardings pin, and
    the next write failed its hard-checked input pin. Fixed at the
    source (_f_chunk_streamed_fn pins the chunk row-major); this probe
    remains as defense in depth: a PROBE WRITE of an all-zero chunk
    through the pinned donating writer — the exact program whose layout
    check failed in the wild, not a `.format` inspection. The probe is
    free in effect (the stack is zeros; donation aliases in place) and
    pre-compiles the writer for the build loop. On a layout violation
    the allocation is retried fresh (zeros carry no data) rather than
    crashing 40 minutes into a build."""
    fmt = _stack_fmt()
    sF = _zeros_stack_fn(shape)()
    if fmt is None:
        return sF
    # Pinned allocator (not eager zeros): the probe must match the
    # writer's now-pinned chunk input layout.
    probe = _zeros_stack_fn((shape[0], shape[1], chunk_rows))()
    for attempt in range(4):
        try:
            out = _write_slices_fn()(sF, probe, jnp.asarray(0))
        except ValueError:
            log.warning(
                'Slice-stack allocation %d violated its layout pin '
                '(stack layout: %s); retrying with a fresh allocation.',
                attempt,
                getattr(getattr(sF, 'format', None), 'layout', '?'),
            )
            sF.delete()
            sF = _zeros_stack_fn(shape)()
            continue
        probe.delete()
        return out
    raise RuntimeError(
        'Slice-stack allocator repeatedly violated its row-major layout '
        'pin; cannot build the factor copy-free. Reducing '
        'SGDML_FACTOR_SLICES (so the slice axis no longer matches the '
        'sublane tile) may side-step the layout assignment.'
    )


@functools.lru_cache(maxsize=None)
def _zeros_stack_fn(shape):
    """Stack allocator whose OUTPUT layout is pinned row-major — creating
    default-layout zeros and relayouting after the fact would transiently
    double the stack."""
    fmt = _stack_fmt()
    kw = {} if fmt is None else {'out_shardings': fmt}
    return jax.jit(lambda: jnp.zeros(shape, dtype=jnp.int8), **kw)


@functools.lru_cache(maxsize=None)
def _gram_apply_fn():
    """One power-iteration step on the REPRESENTED operator F^T F (slice
    truncation included) — the same sliced matvecs the CG apply uses,
    with the stack's row-major layout pinned (see `_stack_fmt`)."""

    def step(sF, sigF, v):
        chunk = sF.shape[2] // sigF.shape[0]
        w = ozaki.matvec_sliced_long(sF, sigF, v, chunk=chunk)
        u = ozaki.matvec_sliced_long_t(sF, sigF, w, chunk=chunk)
        nrm = jnp.linalg.norm(u)
        return u / jnp.maximum(nrm, 1e-300), nrm

    fmt = _stack_fmt()
    kw = {} if fmt is None else {'in_shardings': (fmt, None, None)}
    return jax.jit(step, **kw)


def _renorm_sliced_factor(F, n_slices: int, iters: int = 40):
    """Scale the slice stack so the represented factor has spectral norm
    strictly below 1, keeping the Woodbury apply ``v - F^T (F v)`` PSD.

    The exact factor satisfies ``||F||_2^2 = d_max/(d_max + lam) < 1``
    by construction, but at small lam the margin is ~``lam/d_max`` (can
    be 1e-14) — far below the slice-truncation noise once the stack
    drops under 8 slices (~2^-36 per entry at 6), so the REPRESENTED
    ``I - F^T F`` can go indefinite in the top Nystrom directions and
    trip the CG's PSD guard every iteration. Fix: measure the
    represented norm by power iteration (on the same sliced matvecs CG
    uses) and shrink the global chunk scales so the norm lands at
    ``1 - eps`` with ``eps`` at the truncation-noise floor. The
    distortion this adds to the top preconditioned eigenvalues is the
    same order as the truncation noise already present — it makes the
    error one-signed (PSD) rather than larger.

    No-op at 8 slices (the validated default's norm already sits below
    the eps floor's distance from 1 only when truncation pushes it
    over; measured stacks at 48 bits stay below 1).
    """
    sF, sigF = F
    k, ncols = sF.shape[1], sF.shape[2]
    rng = np.random.default_rng(12345)
    v = jnp.asarray(rng.standard_normal(ncols))
    v = v / jnp.linalg.norm(v)
    step = _gram_apply_fn()
    nrm = None
    for _ in range(iters):
        v, nrm = step(sF, sigF, v)
    sigma_sq = float(nrm)  # ~ lambda_max(F^T F) from the Rayleigh limit
    # Truncation-noise floor: per-entry ~2^-(6 ns) of the chunk scale,
    # accumulated over a (k, ncols) factor in spectral norm (loose
    # Frobenius-style bound), with slack for power-iteration error.
    eps = max(1e-9, 8.0 * np.sqrt(float(k) * ncols)
              * 2.0 ** (-ozaki.Q_BITS * n_slices))
    eps = min(eps, 1e-3)
    if sigma_sq <= (1.0 - eps) ** 2:
        return F
    s = (1.0 - eps) / np.sqrt(sigma_sq)
    log.debug(
        'Renormalizing slice-stack factor: represented ||F||=%.3e -> '
        '%.3e (%d slices).', np.sqrt(sigma_sq), 1.0 - eps, n_slices,
    )
    return sF, sigF * jnp.asarray(s, dtype=sigF.dtype)


# ---------------------------------------------------------------------------
# Solver
# ---------------------------------------------------------------------------


class Iterative:
    def __init__(self, gdml_train=None, callback=None, max_memory: float = 12,
                 mesh=None, factor_mode: str = 'auto',
                 factor_slices: int | None = None,
                 seed: int | None = None):
        import os

        self.gdml_train = gdml_train
        self.callback = callback
        self._max_memory = max_memory
        self.mesh = mesh
        # Explicit solver seed; None derives one from the task's training
        # split (md5_train) in solve() — deterministic either way.
        self.seed = seed
        # int8 mantissa slices stored per factor element (6 bits each).
        # 8 = 48 bits below each chunk scale — the validated spectrum.
        # 6 = 36 bits at 7/9 the stack memory: ~30% more inducing points
        # in the same HBM. Below 8 the represented factor's spectral norm
        # can exceed 1 by the truncation error (the exact factor's top
        # singular values sit at 1 - lam/(lam + d_i)), so the build then
        # renormalizes the stack scale to keep `I - F^T F` PSD
        # (`_renorm_sliced_factor`). Default is 'auto': solve() picks the
        # slice count whose budget affords the LARGEST k (see
        # `resolve_factor_slices`) — the configuration that actually
        # converges fresh MD22-class solves. Env override:
        # SGDML_FACTOR_SLICES.
        if factor_slices is None:
            env = os.environ.get('SGDML_FACTOR_SLICES')
            factor_slices = int(env) if env else 'auto'
        if factor_slices != 'auto' and not 3 <= factor_slices <= 10:
            raise ValueError("factor_slices must be in [3, 10] or 'auto'")
        self.factor_slices = factor_slices
        # Resolution of 'auto' for the current solve (set by solve();
        # 8-slice default covers direct _build_factor use).
        self._auto_ns = 8
        # CG matvec matmul mode: 'ozaki' runs the prediction pass's
        # O(M^2 P D) matmuls as int8-MXU Ozaki GEMMs (6 slices — ample
        # for the 1e-4 CG tolerance, ~6x emulated-f64 matmul rate);
        # resolved by the same auto gate as the factor (TPU = ozaki).
        # Woodbury factor representation for single-device solves:
        # 'ozaki' = int8 slice stack (8 B/elem, int8-MXU matvecs,
        # Ozaki-GEMM build Gram); 'f64' = dense f64 with chunked
        # emulated-f64 matvecs; 'auto' = ozaki on TPU, f64 elsewhere
        # (int8 dots are slow on the CPU test backend). The mesh path
        # keeps its GSPMD-partitioned f64 apply.
        self.factor_mode = factor_mode

    def _ns(self) -> int:
        """Slice count for the current solve ('auto' resolved by
        solve(); the validated 8-slice default elsewhere)."""
        if self.factor_slices == 'auto':
            return self._auto_ns
        return self.factor_slices

    def resolve_factor_slices(self, n_train, n_atoms, n_dev=1):
        """Pick the slice count whose memory budget affords the LARGEST
        inducing-point count k; ties go to more slices (cleaner
        spectrum, no renormalization needed at 8).

        Returns ``(n_slices, k_cap)``. This encodes the round-4
        measurement (BENCH_NOTES r4, MD22 M=3000 on a 16 GB chip) as
        the library default: the fresh 8-slice k=11 solve extrapolated
        to ~76k CG iterations (aborted) while the 6-slice k=15 one
        converged in 14k — fresh solves want the largest k the budget
        affords. The reference picks its k automatically from its
        memory model (sgdml/solvers/iterative.py:827-866); the slice
        axis is this implementation's extra memory lever, so it must be
        automatic too rather than an env-var-gated override.
        """
        budget = self._max_memory * 1024**3
        best_ns, best_k = 8, -1
        for ns in (8, 6):
            k = min(
                n_train,
                Iterative.max_n_inducing_pts(
                    n_train, n_atoms, budget, n_dev=n_dev,
                    factor_bytes=ns + 1.0, streamed=True,
                ),
            )
            if k > best_k:
                best_ns, best_k = ns, k
        return best_ns, best_k

    def _use_ozaki_factor(self) -> bool:
        # Applies with or without a mesh: the slice stack is
        # column-sharded over the devices (parallel/spmd.py), so the
        # per-device factor bytes drop from 16 (dense f64 + split
        # staging) to ~n_slices+1 there too.
        if self.factor_mode == 'auto':
            return jax.devices()[0].platform == 'tpu'
        return self.factor_mode == 'ozaki'

    # -- preconditioner ----------------------------------------------------

    def _build_factor(self, X, Jc, dperms, sig, lam, col_idxs, n_atoms,
                      use_E_cstr):
        """Assemble PSD columns on device and build the Woodbury factor,
        with an escalating regularization ladder (reference behavior:
        iterative.py:414-471). f64 throughout — the Woodbury correction
        cancels catastrophically at small lam, so lower precision breaks CG
        (measured); memory is controlled by chunking instead.

        With a mesh (and no energy constraints — the MD22-class systems
        this path exists for train force-only), the build is fully
        sharded: row-sharded column assembly, per-device triangular
        solves, psum'd Gram (parallel/spmd.py) — per-device high-water
        mark k*n/n_dev.
        """
        col_idxs = np.asarray(col_idxs, dtype=np.int64)

        if self.mesh is not None and self._use_ozaki_factor():
            from ..parallel import spmd

            # Column-sharded streamed int8 slice-stack build: the
            # single-chip capacity mechanism (9 B/elem, f64 factor
            # never exists) per device — k budget AND the int8
            # memory lever both scale with the device count. The
            # ladder runs inside the build. Energy-constrained systems
            # border the stack with a replicated dense f64 (k, M) block
            # (tiny — exact arithmetic for the border) instead of
            # falling back to the 16 B/elem dense factor.
            C_E = None
            if use_E_cstr:
                from ..ops.kernel import assemble_kernel_E_rows

                C_E = -assemble_kernel_E_rows(
                    X, Jc, dperms, sig, n_atoms, col_idxs
                )
            F, lev = spmd.nystrom_factor_sharded_streamed(
                X, Jc, dperms, sig, lam, col_idxs, n_atoms,
                self.mesh, n_slices=self._ns(), C_E_psd=C_E,
            )
            return F, np.asarray(lev, dtype=np.float64)

        if self.mesh is not None and not use_E_cstr:
            from ..parallel import spmd

            for reg in [0.0] + list(10.0 ** np.arange(-16, 2)):
                # PSD columns created inside the call expression so no
                # caller binding keeps them alive through the build (they
                # coexist with the Y strips — the memory high-water mark).
                F, lev, ok = spmd.nystrom_factor_sharded(
                    -spmd.assemble_kernel_columns_sharded(
                        X, Jc, dperms, sig, n_atoms, col_idxs, self.mesh
                    ),
                    col_idxs, lam, reg, reg, self.mesh,
                )
                if ok:
                    if reg > 0:
                        log.debug(
                            'Nystrom factor needed regularization %g.', reg
                        )
                    return F, np.asarray(lev, dtype=np.float64)
            raise RuntimeError(
                'Failed to factorize the Nystrom preconditioner despite '
                'strong regularization. Try a larger sigma.'
            )

        if self._use_ozaki_factor() and self.mesh is None:
            return self._build_factor_streamed(
                X, Jc, dperms, sig, lam, col_idxs, n_atoms,
                use_E_cstr=use_E_cstr,
            )

        for reg in [0.0] + list(10.0 ** np.arange(-16, 2)):
            # The PSD column matrix is created inside the call expression so
            # no caller binding keeps it alive (it is the memory high-water
            # mark); on the rare retry with more regularization it is
            # simply re-assembled.
            F, lev, ok = _nystrom_factor_from_cols(
                -assemble_kernel_columns(
                    X, Jc, dperms, sig, n_atoms, col_idxs,
                    use_E_cstr=use_E_cstr,
                ),
                col_idxs,
                lam,
                reg,
                reg,
                # E-constrained mesh solves in the dense-f64 factor mode
                # (factor_mode='f64') reach this one-pass path: their
                # apply is the GSPMD 'plain' mode, not the slice-stack
                # walk. The ozaki mesh mode borders the sharded stack
                # above instead.
                to_slices=self._use_ozaki_factor() and self.mesh is None,
                n_slices=self._ns(),
            )
            if ok:
                if reg > 0:
                    log.debug('Nystrom factor needed regularization %g.', reg)
                if isinstance(F, tuple) and self._ns() < 8:
                    F = _renorm_sliced_factor(F, self._ns())
                return F, np.asarray(lev, dtype=np.float64)
        raise RuntimeError(
            'Failed to factorize the Nystrom preconditioner despite strong '
            'regularization. Try a larger sigma.'
        )

    def _build_factor_streamed(self, X, Jc, dperms, sig, lam, col_idxs,
                               n_atoms, use_E_cstr=False):
        """Streaming build of the int8 slice-stack Woodbury factor — the
        (n, k) f64 column block NEVER exists on device.

        With ``use_E_cstr`` the M energy-constraint rows border the
        stack: the force sweeps use a chunk that divides M exactly (so
        the ``[F | E]`` CG vector stays aligned with the stack columns
        with padding only at the very end), the tiny ``(M, k)`` E-row
        block is assembled once (`ops.kernel.assemble_kernel_E_rows`),
        folded into the whitened Gram, and appended as the stack's tail
        chunks — large energy-constrained systems get the same streamed
        k-cap as force-only ones instead of falling back to the one-pass
        f64 build (round-3 verdict missing #3; reference E-constraint
        coverage: sgdml/solvers/iterative.py:208-351 via
        train.py:235-300).

        Three assembly sweeps over row chunks, all sharing one compiled
        assembly program (traced chunk offset):

        1. **W sweep**: extract the inducing-block rows ``W = C[cols]``
           (chunks without inducing rows are skipped). ``chol(W)`` and
           the ladder's k x k stages run on HOST (O(k^3) is host-trivial
           next to the device O(n k^2)).
        2. **Gram sweep**: per chunk, ``Y = L_W^{-1} C^T`` (device
           triangular solve) then the Ozaki int8 Y-Gram — whitening
           BEFORE int8 truncation, so the 48-bit error stays relative to
           the factor's own scale instead of being amplified by cond(W)
           (measured 3e-3 factor error from a truncate-then-project
           variant at a mere m=40 system).
        3. **F sweep**: ``F_c = L^{-1} L_W^{-1} C_c^T`` per chunk, sliced
           straight into the preallocated int8 stack (in-place donated
           writes — concatenating at the end would transiently double
           the stack).

        Sweeps 2-3 are the one-pass build's exact per-chunk arithmetic
        (``_solve_chunk_oz`` / ``_solve_chunk_final_oz``); only the chunk
        PROVENANCE changes (re-assembled on the fly vs held in HBM), so
        the validated CG error structure is preserved. Device high-water
        mark: the 9 B/elem slice stack + one assembly chunk + transient
        Y/F — vs the one-pass build's f64 column block + Y chunks
        (~16 B/elem), which is what capped MD22 M=3000 at k=5 points on
        a 16 GB chip (``max_n_inducing_pts(streamed=True)`` holds the
        budget formula). The price is two extra assembly sweeps; at MD22
        scale assembly is minutes where CG is hours. Reference
        counterpart: the in-place two-stage Cholesky pipeline of
        sgdml/solvers/iterative.py:208-351, which assumes a 100+ GB
        host buffer.
        """
        m = X.shape[0]
        dim_i = 3 * n_atoms
        n = m * dim_i + (m if use_E_cstr else 0)
        cols = np.asarray(col_idxs, dtype=np.int64)
        kcols = len(cols)
        nb = 128 if kcols % 128 == 0 else _largest_divisor(kcols, 128)

        pt_ch = max(1, _SOLVE_CHUNK // dim_i)
        if use_E_cstr:
            # The E rows border the stack AFTER the force block, so the
            # force block may not carry interior padding (it would break
            # the [F | E] vector/column alignment): chunk by an exact
            # divisor of M.
            pt_ch = _largest_divisor(m, pt_ch)
        n_ch = -(-m // pt_ch)
        m_pad = n_ch * pt_ch
        rows_ch = pt_ch * dim_i
        Xp = jnp.pad(X, ((0, m_pad - m), (0, 0)))
        Jcp = jnp.pad(Jc, ((0, m_pad - m), (0, 0), (0, 0)))

        Ce_pad, m_e_pad = None, 0
        if use_E_cstr:
            from ..ops.kernel import assemble_kernel_E_rows

            m_e_pad = -(-m // rows_ch) * rows_ch
            Ce_pad = jnp.pad(
                -assemble_kernel_E_rows(X, Jc, dperms, sig, n_atoms, cols),
                ((0, m_e_pad - m), (0, 0)),
            )

        def chunk(c):
            return -assemble_kernel_columns_range(
                Xp, Jcp, dperms, sig, n_atoms, cols, c * pt_ch, pt_ch, m
            )

        # Sweep 1: inducing rows -> W (host). Per-chunk occupancy indices
        # are padded to one width so the gather compiles once.
        sels = [
            np.where((cols >= c * rows_ch) & (cols < (c + 1) * rows_ch))[0]
            for c in range(n_ch)
        ]
        w_max = max((s.size for s in sels), default=0)
        W = np.empty((kcols, kcols), dtype=np.float64)
        for c in range(n_ch):
            sel = sels[c]
            if not sel.size:
                continue
            idx = np.zeros(w_max, dtype=np.int32)
            idx[: sel.size] = cols[sel] - c * rows_ch
            W[sel] = np.asarray(_w_rows(chunk(c), jnp.asarray(idx)))[
                : sel.size
            ]

        # Ladder (reference semantics: escalate shared regularization
        # until both Cholesky stages succeed). A gram-stage failure
        # re-runs the gram sweep with the stronger L_W — rare (the gram
        # is PSD by construction) and logged.
        for reg in [0.0] + list(10.0 ** np.arange(-16, 2)):
            try:
                Lw_h = np.linalg.cholesky(W + reg * np.eye(kcols))
            except np.linalg.LinAlgError:
                continue
            if not np.all(np.isfinite(Lw_h)):
                continue
            Lw = jnp.asarray(Lw_h)
            gram = jnp.zeros((kcols, kcols), dtype=jnp.float64)
            for c in range(n_ch):
                gram = _gram_accum_y(gram, Lw, chunk(c), nb=nb)
            if use_E_cstr:
                # Copy: _gram_accum_y donates its chunk and Ce_pad is
                # reused by the F sweep (and by rare ladder retries).
                gram = _gram_accum_y(gram, Lw, Ce_pad + 0.0, nb=nb)
            gram_h = np.asarray(gram)
            del gram
            try:
                L_h = np.linalg.cholesky(
                    0.5 * (gram_h + gram_h.T)
                    + (lam + reg) * np.eye(kcols)
                )
            except np.linalg.LinAlgError:
                log.debug(
                    'Nystrom gram stage failed at reg=%g; re-sweeping '
                    'with stronger regularization.', reg,
                )
                continue
            if np.all(np.isfinite(L_h)):
                if reg > 0:
                    log.debug('Nystrom factor needed regularization %g.', reg)
                break
        else:
            raise RuntimeError(
                'Failed to factorize the Nystrom preconditioner despite '
                'strong regularization. Try a larger sigma.'
            )
        L = jnp.asarray(L_h)

        # Sweep 3: F chunks straight into the preallocated slice stack
        # (the E-row border, if any, fills the tail chunks).
        ns = self._ns()
        sF = _alloc_stack((ns, kcols, n_ch * rows_ch + m_e_pad), rows_ch)
        sigs, levs = [], []
        for c in range(n_ch):
            lev_c, s_c, sig_c = _f_chunk_streamed(
                Lw, L, chunk(c), nb=nb, ns=ns
            )
            sF = _write_slices(sF, s_c, jnp.asarray(c * rows_ch))
            sigs.append(sig_c)
            levs.append(np.asarray(lev_c))
        for j in range(m_e_pad // rows_ch):
            Ce_c = jax.lax.dynamic_slice_in_dim(
                Ce_pad, j * rows_ch, rows_ch, 0
            )
            lev_c, s_c, sig_c = _f_chunk_streamed(Lw, L, Ce_c, nb=nb, ns=ns)
            sF = _write_slices(
                sF, s_c, jnp.asarray(n_ch * rows_ch + j * rows_ch)
            )
            sigs.append(sig_c)
            levs.append(np.asarray(lev_c))
        sigF = jnp.asarray(np.asarray(sigs, dtype=np.float32))
        # Valid-row leverage scores: with E rows the force block carries
        # no interior padding (exact-divisor chunking), so the first n
        # entries are exactly [force rows | E rows].
        lev_scores = np.concatenate(levs)[:n].astype(np.float64)
        F = (sF, sigF)
        if ns < 8:
            F = _renorm_sliced_factor(F, ns)
        return F, lev_scores

    def _lev_scores(
        self, X, Jc, dperms, sig, lam, n_inducing_pts, n_atoms, use_E_cstr,
        rng=None,
    ):
        """Approximate ridge leverage scores from a random column subset
        (reference: iterative.py:353-399). Columns are sampled from the
        force block; scores cover all rows of the (extended) system."""
        m = X.shape[0]
        dim_i = 3 * n_atoms
        dim_m = dim_i * min(n_inducing_pts, 10)
        rng = np.random.default_rng(rng)
        idxs = np.sort(rng.choice(m * dim_i, dim_m, replace=False))
        _, lev = self._build_factor(
            X, Jc, dperms, sig, lam, idxs, n_atoms, use_E_cstr=use_E_cstr
        )
        return lev

    @staticmethod
    def inducing_pts_from_lev_scores(lev_scores, n, rng=None):
        """Leverage-weighted column sample (reference: iterative.py:401).

        The reference draws from the GLOBAL numpy stream, so inducing
        sets (and hence solve trajectories) are irreproducible unless the
        caller seeds globally; here an explicit generator (or seed) makes
        two identical ``solve()`` calls bit-identical by default."""
        rng = np.random.default_rng(rng)
        p = lev_scores / lev_scores.sum()
        idxs = rng.choice(lev_scores.size, n, replace=False, p=p)
        return np.sort(idxs)

    def _factor_plan(self, n_train, n_atoms, n_dev, use_E_cstr):
        """Resolve the preconditioner-factor configuration for a solve:
        ``(oz_apply, factor_bytes, streamed, max_n_inducing_pts)``.

        Slice-stack factor: ns int8 planes + ~1 B/elem of v-slice and
        chunk transients (9 B at the 8-slice default). On a mesh those
        bytes are PER DEVICE (the stack is column-sharded); energy
        constraints ride as a replicated dense f64 border on the
        sharded stack (k*M*8 bytes — negligible), so the slice-stack
        budget applies with or without them — ``use_E_cstr`` must NOT
        change the plan in any ozaki mode (a regression here would
        reinstate the old 16 B dense fallback and its k-cap for
        energy-constrained mesh systems; pinned by
        tests/test_parallel.py). Only the explicit factor_mode='f64'
        routes keep the 16 B dense one-pass build. The 'auto' slice
        count maximizes the affordable k (round-4 lesson — fresh solves
        want the strongest preconditioner the budget affords; see
        `resolve_factor_slices`).
        """
        del use_E_cstr  # documented invariant: no effect on the plan
        oz_apply = self._use_ozaki_factor()
        if self.factor_slices == 'auto':
            if oz_apply:
                self._auto_ns, auto_k = self.resolve_factor_slices(
                    n_train, n_atoms, n_dev
                )
                if self._auto_ns != 8:
                    log.info(
                        'Auto-selected the %d-slice preconditioner factor '
                        '(k cap %d vs %d at 8 slices).',
                        self._auto_ns, auto_k,
                        min(n_train, Iterative.max_n_inducing_pts(
                            n_train, n_atoms, self._max_memory * 1024**3,
                            n_dev=n_dev, factor_bytes=9.0, streamed=True,
                        )),
                    )
            else:
                self._auto_ns = 8
        factor_bytes = self._ns() + 1.0 if oz_apply else 16.0
        # Every slice-stack route is a streamed build (single-device and
        # mesh, force-only and E-constrained).
        streamed = oz_apply
        max_n_ind = Iterative.max_n_inducing_pts(
            n_train, n_atoms, self._max_memory * 1024**3, n_dev=n_dev,
            factor_bytes=factor_bytes, streamed=streamed,
        )
        return oz_apply, factor_bytes, streamed, max_n_ind

    # -- main solve ----------------------------------------------------------

    def solve(
        self,
        task,
        R_desc,
        R_d_desc,
        desc_perms,
        y,
        y_std,
        tol: float = 1e-4,
        save_progr_callback=None,
        max_seconds: float | None = None,
    ):
        n_train, n_atoms = task['R_train'].shape[:2]
        dim_i = 3 * n_atoms
        n = len(y)
        sig = float(np.squeeze(task['sig']))
        lam = float(np.squeeze(task['lam']))
        use_E_cstr = bool(task.get('use_E_cstr', False))

        # Deterministic solver randomness (inducing-point probes/samples):
        # seeded from the task's training-split fingerprint unless an
        # explicit seed was given — identical tasks produce identical
        # inducing sets and iteration traces with no global seeding.
        if self.seed is not None:
            rng = np.random.default_rng(self.seed)
        else:
            import zlib

            key = '%s|%d|%.17g|%.17g' % (
                str(task.get('md5_train', '')), n_train, sig, lam
            )
            rng = np.random.default_rng(zlib.crc32(key.encode()))

        X = jnp.asarray(R_desc)
        Jc = jnp.asarray(R_d_desc)
        dperms = np.asarray(desc_perms)
        perms_key = (
            np.ascontiguousarray(dperms.astype(np.int64)).tobytes(),
            dperms.shape,
        )

        # Mesh mode: queries batch-sharded, tables replicated — the CG
        # matvec's dominant (M, D) x (D, M*P) matmuls partition over
        # devices; the preconditioner factor is column-sharded so its
        # two-matmul Woodbury apply reduces with one psum.
        n_dev = (
            1 if self.mesh is None
            else int(np.prod(list(self.mesh.shape.values())))
        )
        if self.mesh is not None:
            from ..parallel.spmd import replicate, shard_batch

            m_padq = -(-n_train // n_dev) * n_dev
            Xq = shard_batch(
                jnp.pad(X, ((0, m_padq - n_train), (0, 0))), self.mesh
            )
            Jcq = shard_batch(
                jnp.pad(Jc, ((0, m_padq - n_train), (0, 0), (0, 0))),
                self.mesh,
            )
            X = replicate(X, self.mesh)
            Jc = replicate(Jc, self.mesh)
        else:
            Xq, Jcq = X, Jc

        def _shard_factor(Fp_new):
            """Column-shard the Woodbury factor over the mesh (columns are
            the long n-axis); zero-pad to a device multiple — padded
            columns drop out of the correction product. Slice-stack
            factors from the sharded streamed build arrive already
            column-sharded."""
            if isinstance(Fp_new, tuple):
                return Fp_new
            if self.mesh is not None:
                from jax.sharding import NamedSharding, PartitionSpec as P

                n_dev = int(np.prod(list(self.mesh.shape.values())))
                n_cols = Fp_new.shape[1]
                n_pad = -(-n_cols // n_dev) * n_dev
                Fp_new = jnp.pad(Fp_new, ((0, 0), (0, n_pad - n_cols)))
                return jax.device_put(
                    Fp_new,
                    NamedSharding(
                        self.mesh, P(None, self.mesh.axis_names[0])
                    ),
                )
            return Fp_new

        def A_apply(v):
            # The exact f64 matvec: used for the initial residual and as
            # the ground truth the CG residual is measured against (the
            # in-loop matvec may run in ozaki mode).
            return _matvec_A(
                v, Xq, Jcq, X, Jc, sig, lam,
                n_atoms=n_atoms,
                desc_perms_key=perms_key,
                use_E_cstr=use_E_cstr,
            )

        oz_apply, factor_bytes, streamed, max_n_ind = self._factor_plan(
            n_train, n_atoms, n_dev, use_E_cstr
        )
        # Fresh solves start AT the cap (the strongest preconditioner
        # the budget affords — the converged MD22-class runs never
        # stalled and benefit most); stall-restarts may then only
        # re-seed. Warm starts (resume) can begin below the cap, where
        # the 1.2x growth path re-engages — always bounded by the SAME
        # budget (the former 1.5x restart headroom exceeded real HBM).
        n_inducing_pts = min(n_train, max_n_ind)

        # Warm start (resume / sigma-grid recycling) support. The
        # E-constrained unknown vector is [force block | M energy block]:
        # both blocks are required (a force-only warm start against an
        # extended RHS was a shape error), and a size mismatch (stale
        # coefficients from a different split) falls back to cold start.
        alphas0_F = task.get('alphas0_F')
        num_iters0 = int(task.get('solver_iters', 0))
        x0 = None
        if alphas0_F is not None:
            x0 = -np.asarray(alphas0_F).ravel()
            if use_E_cstr:
                alphas0_E = task.get('alphas0_E')
                x0 = (
                    None if alphas0_E is None
                    else np.concatenate(
                        [x0, -np.asarray(alphas0_E).ravel()]
                    )
                )
            if x0 is not None and x0.size != n:
                log.warning(
                    'Ignoring warm-start coefficients of length %d for an '
                    'n=%d system.', x0.size, n,
                )
                x0 = None
            if x0 is None:
                num_iters0 = 0

        # Inducing points: reuse stored ones when resuming, else leverage
        # scores from a random column probe.
        lev_scores = None
        if (
            'inducing_pts_idxs' in task
            and 0 < len(task['inducing_pts_idxs']) // dim_i <= n_inducing_pts
        ):
            # Warm start (resume): reuse the stored inducing set even if
            # below the current budget cap — stall-restarts can then
            # grow it 1.2x at a time, bounded by the cap.
            inducing_pts_idxs = np.asarray(task['inducing_pts_idxs'])
            n_inducing_pts = len(inducing_pts_idxs) // dim_i
        else:
            log.info(
                'Estimating leverage scores (k=%d inducing points).',
                n_inducing_pts,
            )
            t_lev = timeit.default_timer()
            lev_scores = self._lev_scores(
                X, Jc, dperms, sig, lam, n_inducing_pts, n_atoms,
                use_E_cstr, rng,
            )
            log.info(
                'Leverage scores done in %.1f s.',
                timeit.default_timer() - t_lev,
            )
            inducing_pts_idxs = self.inducing_pts_from_lev_scores(
                lev_scores[: n_train * dim_i], n_inducing_pts * dim_i, rng
            )

        t0 = timeit.default_timer()
        Fp, lev_scores = self._build_factor(
            X, Jc, dperms, sig, lam, inducing_pts_idxs, n_atoms, use_E_cstr
        )
        Fp = _shard_factor(Fp)
        log.info(
            'Built Nystrom preconditioner (k=%d columns) in %.1f s.',
            len(inducing_pts_idxs),
            timeit.default_timer() - t0,
        )

        b = jnp.asarray(y)
        b_norm = float(np.linalg.norm(y))

        if self.mesh is not None:
            if oz_apply:
                apply_mode = (
                    'ozaki_mesh_bordered' if use_E_cstr else 'ozaki_mesh'
                )
            else:
                apply_mode = 'plain'
        else:
            apply_mode = 'ozaki' if oz_apply else 'chunk'
        mv_mm = 'ozaki' if self._use_ozaki_factor() else 'native'
        # Resume at the persisted precision rung (escalations are driven
        # by stagnation — re-climbing the ladder on every warm start
        # would replay the stagnation detours).
        if str(task.get('solver_mv_mm', '')) in MV_MM_LADDER:
            mv_mm = str(task['solver_mv_mm'])

        def pcg_chunk(state, Fp_cur):
            return _pcg_chunk_jit(apply_mode == 'ozaki')(
                state, Fp_cur, Xq, Jcq, X, Jc, sig, lam, b_norm, tol,
                n_atoms=n_atoms,
                desc_perms_key=perms_key,
                use_E_cstr=use_E_cstr,
                chunk_iters=CG_CHUNK_ITERS,
                apply_mode=apply_mode,
                mm=mv_mm,
                mesh=(
                    self.mesh
                    if apply_mode in ('ozaki_mesh', 'ozaki_mesh_bordered')
                    else None
                ),
            )

        def precond_z(r, Fp_cur):
            if apply_mode == 'ozaki_mesh_bordered':
                from ..parallel.spmd import (
                    ozaki_factor_apply_sharded_bordered,
                )

                z0 = ozaki_factor_apply_sharded_bordered(
                    Fp_cur[0], Fp_cur[1], Fp_cur[2], r, mesh=self.mesh
                )
                return z0.astype(r.dtype) / lam
            rp = jnp.pad(r, (0, _factor_ncols(Fp_cur) - r.shape[0]))
            if apply_mode == 'ozaki':
                z0 = _init_z_ozaki(Fp_cur[0], Fp_cur[1], rp)
            elif apply_mode == 'ozaki_mesh':
                from ..parallel.spmd import ozaki_factor_apply_sharded

                z0 = ozaki_factor_apply_sharded(
                    Fp_cur[0], Fp_cur[1], rp, mesh=self.mesh
                )
            elif apply_mode == 'plain':
                z0 = _init_z_plain(Fp_cur, rp)
            else:
                z0 = _init_z(Fp_cur, rp)
            return z0[: r.shape[0]].astype(r.dtype) / lam

        def init_state(x_init, Fp_cur):
            x = jnp.asarray(
                x_init if x_init is not None else np.zeros(n), dtype=b.dtype
            )
            r = b - A_apply(x)
            z = precond_z(r, Fp_cur)
            rz = r @ z
            if not bool(rz > 0):  # PSD guard (see _pcg_chunk body)
                z = r
                rz = r @ r
            return (
                x, r, z, z, rz, 0, jnp.zeros(CG_CHUNK_ITERS),
                jnp.zeros((), jnp.int32),
            )

        state = init_state(x0, Fp)
        num_iters = num_iters0
        num_restarts = 0
        resid = float(np.linalg.norm(np.asarray(state[1])))
        steps_hist: list = []
        max_iters = 3 * n_atoms * n_train * 10
        last_ckpt = timeit.default_timer()
        t_start = timeit.default_timer()
        # Best finite iterate: restarts re-seed from it, and the final
        # answer falls back to it — a numerical breakdown (NaN residual)
        # must never poison the returned model or the restart seed.
        best_resid = resid if np.isfinite(resid) else np.inf
        best_x = np.asarray(state[0])
        iters_since_best = 0  # stagnation window for budgeted re-seeds
        max_best_gap = 0  # largest iteration gap between consecutive bests
        reseeds_since_best = 0  # at most one re-seed per best iterate

        while True:
            state = pcg_chunk(state, Fp)
            x, r, z, p, rz, it_done, hist, n_bad = state
            it_done = int(it_done)
            num_iters += it_done
            iters_since_best += it_done
            n_bad = int(n_bad)
            if n_bad:
                log.info(
                    'PSD guard tripped %d/%d times in this CG chunk '
                    '(beta=0 unpreconditioned steps; frequent trips mean '
                    'the factor needs more slices).', n_bad, it_done,
                )

            hist_np = np.asarray(hist[:it_done])
            new_resid_series = np.concatenate([[resid], hist_np])
            resid_rec = float(new_resid_series[-1])

            # Residual replacement: measure the TRUE residual once per
            # chunk and re-anchor the recursion when it has drifted (see
            # RESID_REPLACE_DRIFT). Convergence, best-iterate tracking
            # and the effectiveness series all follow the true residual —
            # the recursive one can neither stall a healthy solve nor
            # declare false convergence.
            replaced = False
            r_true = b - A_apply(x)
            true_resid = float(np.linalg.norm(np.asarray(r_true)))
            if np.isfinite(true_resid):
                drift = (
                    abs(true_resid - resid_rec) / max(true_resid, 1e-300)
                    if np.isfinite(resid_rec) else np.inf
                )
                # An early while_loop exit without true convergence means
                # the recursive residual dipped below tol (or went
                # non-finite) while the truth is still above it — always
                # re-anchor then, or the next chunk would make no progress.
                early_noconv = (
                    it_done < CG_CHUNK_ITERS
                    and true_resid > tol * b_norm
                )
                if drift > RESID_REPLACE_DRIFT or early_noconv:
                    z_new = precond_z(r_true, Fp)
                    rz_new = r_true @ z_new
                    if not bool(rz_new > 0):  # PSD guard
                        z_new = r_true
                        rz_new = r_true @ r_true
                        p = z_new  # beta = 0: restart the direction too
                    state = (x, r_true, z_new, p, rz_new, 0) + state[6:]
                    replaced = True
                    log.info(
                        'CG residual replacement at iteration %d: '
                        'recursive %.3e -> true %.3e (drift %.1f%%).',
                        num_iters, resid_rec, true_resid, 100 * drift,
                    )
                new_resid_series[-1] = true_resid
                resid = true_resid
            else:
                resid = resid_rec

            steps_hist += list(np.diff(new_resid_series))
            steps_hist = steps_hist[-CG_STEPS_HIST_LEN:]
            if np.isfinite(resid) and resid < best_resid:
                best_resid = resid
                best_x = np.asarray(x)
                max_best_gap = max(max_best_gap, iters_since_best)
                iters_since_best = 0
                reseeds_since_best = 0
            elif not np.isfinite(resid):
                log.warning(
                    'CG residual is non-finite at iteration %d (numerical '
                    'breakdown); falling back to the best iterate '
                    '(residual %.3e).', num_iters, best_resid,
                )

            converged = resid <= tol * b_norm
            if converged or num_iters >= max_iters:
                break
            if (
                max_seconds is not None
                and timeit.default_timer() - t_start > max_seconds
            ):
                log.warning(
                    'CG wall-clock budget (%.0f s) exhausted at iteration '
                    '%d (residual %.3e vs target %.3e); returning the '
                    'unconverged solution.',
                    max_seconds, num_iters, resid, tol * b_norm,
                )
                break
            if it_done < CG_CHUNK_ITERS and not converged:
                # while_loop exited early without true convergence. If the
                # residual replacement re-anchored the recursion this is
                # drift, not stagnation — continue; otherwise (non-finite
                # truth: the iterate itself broke down) treat as stall.
                eff = 100 if replaced else -100
            elif len(steps_hist) < CG_STEPS_HIST_LEN:
                eff = 100  # not enough history to judge yet
            else:
                steps = np.array(steps_hist)
                total = np.abs(steps).sum()
                ratio = (-steps.clip(max=0).sum() / total) if total > 0 else 1.0
                eff = (int(100 * ratio) - 50) * 2

            # Rate over THIS process's iterations (warm starts carry
            # num_iters0 from the checkpoint).
            elapsed = timeit.default_timer() - t_start
            rate = (num_iters - num_iters0) / max(elapsed, 1e-9)
            if self.callback is None:
                log.info(
                    'CG: %d iters (%.2f iter/s), resid %.3e (best %.3e, '
                    'target %.3e), effectiveness %d%%, k=%d.',
                    num_iters, rate, resid, best_resid,
                    tol * b_norm, eff, n_inducing_pts,
                )
            else:
                self.callback(
                    num_iters,
                    max_iters,
                    disp_str='Training error (RMSE): forces %.4f'
                    % (resid / np.sqrt(n)),
                    sec_disp_str='%d iter @ %.2f iter/s, k=%d'
                    % (num_iters, rate, n_inducing_pts),
                )

            # Periodic checkpoint of the unconverged model — always the
            # BEST iterate: mid-oscillation the current one can sit far
            # above it (measured 2x at MD22 M=3000), and a resume
            # re-initializes the Krylov space anyway.
            now = timeit.default_timer()
            if save_progr_callback is not None and (
                now - last_ckpt > CHECKPOINT_INTERVAL_S
            ):
                last_ckpt = now
                self._save_checkpoint(
                    task, R_desc, R_d_desc, y_std, best_x, tol, num_iters,
                    best_resid, b_norm, inducing_pts_idxs,
                    save_progr_callback, mv_mm=mv_mm,
                )

            # Stall: strengthen the preconditioner and restart. Growth is
            # clamped to the nominal memory budget (the reference grows
            # unboundedly, iterative.py:775-777 "ignoring memory limits",
            # which would OOM on a fixed-HBM device — measured: the CG
            # chunk keeps TWO f64-split copies of the factor alive).
            # Restarts are bounded even when k cannot grow any further
            # (the reference exits after MAX_NUM_RESTARTS too,
            # iterative.py:729-804) — without the bound a stalled solve
            # would grind through max_iters = 30*N*M iterations.
            # Growth headroom: fresh solves start AT the memory-formula
            # cap, so restarts may exceed the (conservative) heuristic by
            # 1.5x — the reference ignores memory limits entirely here
            # (iterative.py:775-777). The hard ceiling is n_train:
            # inducing columns are drawn without replacement from the
            # n_train*3N force columns.
            # Restarts stay within the SAME budget as the initial build:
            # with a hardware-true budget the old 1.5x headroom made the
            # k-grown factor rebuild exceed real HBM (measured
            # ResourceExhausted at k=125, n=63000, budget 15.5 GiB).
            grow_cap = min(
                n_train,
                Iterative.max_n_inducing_pts(
                    n_train, n_atoms, self._max_memory * 1024**3,
                    n_dev=n_dev, factor_bytes=factor_bytes,
                    streamed=streamed,
                ),
            )
            if eff <= EFF_RESTART_THRESH:
                steps_hist = []
                can_grow = n_inducing_pts < grow_cap
                # Stagnation policy at the cap (see the constants block):
                # adaptive window -> one re-seed per best iterate ->
                # precision escalation -> uninterrupted grind, bounded by
                # DEEP_STAGNATION_BUDGET_FRAC of the wall budget (or the
                # iteration-fraction analog when none is given). This is
                # the DEFAULT at the memory cap — the legacy counted
                # re-seed path provably fails exactly there (round 3,
                # MD22 M=3000: 6 restarts burned on healthy oscillation,
                # gave up at resid 22; the grind policy converged).
                # Growth restarts keep the reference's strict 6-restart
                # bound (reference iterative.py:729-804).
                if not can_grow:
                    window = max(RESEED_STAGNATION_ITERS, 2 * max_best_gap)
                    if iters_since_best < window:
                        # Normal residual-norm oscillation: the best is
                        # still fresh — keep the Krylov space.
                        continue
                    if reseeds_since_best == 0:
                        reseeds_since_best = 1
                        log.info(
                            'CG stalled at the inducing-point memory cap '
                            '(k=%d); re-seeding CG from the best iterate '
                            '(resid %.3e).', n_inducing_pts, best_resid,
                        )
                        state = init_state(best_x, Fp)
                        resid = best_resid
                        iters_since_best = 0
                        continue
                    if mv_mm != MV_MM_LADDER[-1]:
                        # Already re-seeded from this best (a second
                        # re-seed would replay the identical trajectory):
                        # escalate the matvec precision — a genuinely
                        # different operator — and re-seed into it.
                        mv_mm = MV_MM_LADDER[MV_MM_LADDER.index(mv_mm) + 1]
                        log.info(
                            'CG best residual stagnant at %.3e for %d '
                            'iterations: escalating the matvec precision '
                            'to %r.', best_resid, iters_since_best, mv_mm,
                        )
                        state = init_state(best_x, Fp)
                        resid = best_resid
                        iters_since_best = 0
                        reseeds_since_best = 1  # this rung's replay is used
                        continue
                    # Top rung, already re-seeded: grind uninterrupted.
                    if max_seconds is not None:
                        rate_now = max(
                            (num_iters - num_iters0)
                            / max(timeit.default_timer() - t_start, 1e-9),
                            1e-9,
                        )
                        deep_iters = int(
                            DEEP_STAGNATION_BUDGET_FRAC
                            * max_seconds * rate_now
                        )
                    else:
                        deep_iters = int(
                            DEEP_STAGNATION_ITERS_FRAC
                            * (num_iters - num_iters0)
                        )
                    deep = max(2 * window, deep_iters)
                    if iters_since_best >= deep:
                        log.warning(
                            'CG made no progress on the best residual '
                            '(%.3e) for %d iterations (deep-stagnation '
                            'limit %d) at the top matvec precision; '
                            'giving up with the current (unconverged) '
                            'solution.', best_resid, iters_since_best, deep,
                        )
                        break
                    continue
                num_restarts += 1
                if num_restarts >= MAX_NUM_RESTARTS:
                    log.warning(
                        'CG stalled %d times; giving up with the '
                        'current (unconverged) solution.', num_restarts,
                    )
                    break
                n_inducing_pts = min(
                    int(np.ceil(1.2 * n_inducing_pts)), grow_cap
                )
                log.info(
                    'CG stalled; restarting with k=%d inducing points '
                    '(%d restarts left).',
                    n_inducing_pts,
                    MAX_NUM_RESTARTS - num_restarts,
                )
                if lev_scores is None:
                    lev_scores = self._lev_scores(
                        X, Jc, dperms, sig, lam, n_inducing_pts,
                        n_atoms, use_E_cstr, rng,
                    )
                inducing_pts_idxs = self.inducing_pts_from_lev_scores(
                    lev_scores[: n_train * dim_i],
                    n_inducing_pts * dim_i,
                    rng,
                )
                # Free the old factor first: old + new + build
                # transients exceed HBM at MD17/MD22 scale (measured
                # ResourceExhausted on restart at k=5103, n=63000).
                Fp = None
                Fp, lev_scores = self._build_factor(
                    X, Jc, dperms, sig, lam, inducing_pts_idxs,
                    n_atoms, use_E_cstr,
                )
                Fp = _shard_factor(Fp)
                state = init_state(best_x, Fp)
                resid = best_resid
                iters_since_best = 0  # fresh Krylov gets a full window

        if not np.isfinite(resid) or resid > best_resid:
            x_final, resid = best_x, best_resid
        else:
            x_final = np.asarray(state[0])
        is_conv = resid <= tol * b_norm
        alphas = -x_final
        train_rmse = resid / np.sqrt(n)
        return (
            alphas,
            tol,
            num_iters,
            resid,
            train_rmse,
            np.asarray(inducing_pts_idxs),
            is_conv,
        )

    def _save_checkpoint(
        self, task, R_desc, R_d_desc, y_std, x, tol, num_iters, resid, b_norm,
        inducing_pts_idxs, save_progr_callback, mv_mm=None,
    ):
        # E-constrained solves extend x by the M energy unknowns; they
        # must be split off BEFORE create_model (which reshapes alphas_F
        # to (M, 3N) — the extended vector isn't divisible by 3N, so
        # passing it whole crashed the solve at its first checkpoint).
        x = -np.asarray(x)
        alphas_E = None
        alphas_F = x
        if bool(task.get('use_E_cstr', False)):
            n_train = int(task['R_train'].shape[0])
            alphas_E = x[-n_train:]
            alphas_F = x[:-n_train]
        model = self.gdml_train.create_model(
            task, 'cg', R_desc, R_d_desc, y_std, alphas_F, alphas_E=alphas_E
        )
        model.update(
            {
                'solver_tol': tol,
                'solver_iters': num_iters,
                'solver_resid': resid,
                'norm_y_train': b_norm,
                'inducing_pts_idxs': np.asarray(inducing_pts_idxs),
            }
        )
        if mv_mm is not None:
            model['solver_mv_mm'] = mv_mm
        model = self._finish_checkpoint_model(model, task, R_desc, R_d_desc)
        try:
            save_progr_callback(model)
        except Exception:
            # Checkpointing is best-effort: a failed save (disk race,
            # permissions, an external cleaner removing temp files — one
            # killed a 4-hour MD22 run at 00:34) must never abort the
            # solve. The next interval retries.
            log.warning(
                'Periodic checkpoint save failed (continuing the solve):',
                exc_info=True,
            )

    def _finish_checkpoint_model(self, model, task, R_desc, R_d_desc):
        if 'E_train' in task:
            from ..predict import GDMLPredict

            pred = GDMLPredict(model)
            pred.set_R_desc(jnp.asarray(R_desc))
            pred.set_R_d_desc(jnp.asarray(R_d_desc))
            E_pred, _ = pred.predict()
            model['c'] = float(np.mean(np.squeeze(task['E_train']) - E_pred))
        return model

    # -- memory models (reference: iterative.py:827-866) --------------------

    @staticmethod
    def max_n_inducing_pts(n_train, n_atoms, max_memory_bytes, n_dev=1,
                           factor_bytes=16.0, streamed=False):
        """Inducing-point budget (reference formula: iterative.py:827-844),
        additionally capped so the preconditioner factor's TPU f64-split
        working set stays within ~40% of the budget. Round 1 measured
        ~32 B per element of the (k, n) factor: 8 B storage + an f32-split
        staging copy + the same again for a loop-hoisted TRANSPOSED copy.
        The Woodbury apply now contracts the k-axis without a transpose,
        halving that to ~16 B.

        ``max_memory_bytes`` is the PER-DEVICE budget; with ``n_dev > 1``
        the ``(k, n)`` factor (storage and build transients) is
        column-sharded over the mesh, so its linear-in-k terms scale by
        the device count — this is what lets the mesh converge systems
        the single-chip budget cannot (the reference's only lever was a
        100+ GB host)."""
        sq, lin = 5, 4
        dim_i = 3 * n_atoms

        if streamed:
            # Two-pass streaming build (_build_factor_streamed): the
            # device high-water mark is the ``factor_bytes``/elem int8
            # slice stack (n_slices + 1 transient; 9 B at the 8-slice
            # default) plus one assembly chunk and the k x k stages —
            # the f64 column block and f64 factor never exist. Budget
            # the stack at 72% of memory minus a fixed reserve for
            # chunk transients, descriptor tables, CG vectors and XLA
            # workspace (validated by an on-chip probe at MD22 M=3000
            # scale, BENCH_NOTES round 3).
            n = n_train * dim_i
            reserve = 1.5e9
            avail = max(0.0, 0.72 * max_memory_bytes - reserve)
            cap = avail * max(1, int(n_dev)) / (
                min(float(factor_bytes), 16.0) * n * dim_i
            )
            return max(1, min(int(cap), n_train))

        to_dof = dim_i**2 * 8
        # Factor storage is column-sharded over the mesh; the (k, k)
        # Cholesky stages stay replicated per device.
        sq_factor = lin * n_train * to_dof / max(1, int(n_dev))
        ny_factor = sq * to_dof
        n_ind = (
            np.sqrt(sq_factor**2 + 4.0 * ny_factor * max_memory_bytes) - sq_factor
        ) / (2 * ny_factor)

        n = n_train * dim_i
        # factor_bytes: effective per-element working-set bytes of the
        # (k, n) factor. 16 B for the dense-f64 apply (storage + staged
        # f32-split copies); 9 B for the int8 slice-stack factor (8
        # slices + v-slice transients), whose build also never holds the
        # full f64 factor.
        split_budget_elems = 0.4 * max_memory_bytes / float(factor_bytes)
        n_ind_split_cap = split_budget_elems * max(1, int(n_dev)) / (n * dim_i)
        return max(1, min(int(n_ind), int(n_ind_split_cap), n_train))

    @staticmethod
    def est_memory_requirement(n_train, n_inducing_pts, n_atoms):
        sq, lin = 5, 4
        est = lin * n_train * n_inducing_pts * (3 * n_atoms) ** 2 * 8
        est += sq * n_inducing_pts**2 * (3 * n_atoms) ** 2 * 8
        return est
