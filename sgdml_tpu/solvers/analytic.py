"""Closed-form solver: on-device Cholesky factorization of the assembled
kernel system (reference behavior: sgdml/solvers/analytic.py:49-151).

The assembled kernel K is negated to make the system convex, ridge-
regularized, and factorized on device. Fallback ladder mirrors the
reference: Cholesky -> LU -> least squares (for non-square systems).
On TPU/XLA, a failed Cholesky surfaces as NaNs in the factor rather than an
exception, so the ladder is NaN-triggered.

Two precision regimes, selected by the device-memory budget:

* **f64 dense** (small systems): exact single-call factorization. TPUs
  emulate f64 (measured on v5e: 0.18 TFLOP/s Cholesky vs 13.7 in f32), so
  this path is for systems small enough that its cost is irrelevant.
* **f32 block-grid packed + refinement CG** (large systems): the triangle
  of ``A = -K + lam' I`` is assembled straight into block-grid f32 storage
  (ops/blockchol.py; half the dense memory — on a 16 GB chip this is what
  makes n = 63k reachable at all), factorized at f32 MXU speed by a
  host-sequenced blocked Cholesky, and used as the preconditioner of a
  conjugate-gradient iteration on the TRUE f64 system whose matvec is the
  matrix-free prediction pass (no stored matrix).
  ``lam'`` is auto-raised just enough for the f32 factorization to stay
  positive (ladder), which bounds the preconditioned condition number by
  ``lam'/lam`` — convergence is guaranteed for any original conditioning,
  and when the system is already f32-friendly, lam' == lam and CG converges
  in a handful of iterations. Replaces the reference's GPU assembly +
  host scipy Cholesky at scale (sgdml/torchtools.py:61-392,
  sgdml/solvers/analytic.py:94-99).
"""

from __future__ import annotations

import functools
import logging
import timeit

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.kernel import (
    assemble_kernel,
    assemble_kernel_grid,
    assemble_kernel_grid_pair,
)
from ..ops import blockchol, pairchol

log = logging.getLogger(__name__)

PCG_MAX_ITERS = 2500
PCG_RTOL = 1e-9  # relative residual target (reference CG stops at 1e-4)


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


@functools.partial(
    jax.jit, static_argnames=('n_atoms', 'desc_perms_key', 'iters',
                              'use_E_cstr')
)
def _lmax_power(X, Jc, sig, lam, *, n_atoms, desc_perms_key, iters=12,
                use_E_cstr=False):
    """Largest eigenvalue of A = -K + lam I via matrix-free power iteration
    (the matvec is a prediction pass; no matrix is formed)."""
    from .iterative import _matvec_A

    m = X.shape[0]
    n = m * 3 * n_atoms + (m if use_E_cstr else 0)

    def mv(v):
        return _matvec_A(
            v, X, Jc, X, Jc, sig, lam,
            n_atoms=n_atoms, desc_perms_key=desc_perms_key,
            use_E_cstr=use_E_cstr,
        )

    def body(i, v):
        w = mv(v)
        return w / jnp.linalg.norm(w)

    # Random start: a constant vector is a rigid translation, which is an
    # exact null vector of the force kernel — power iteration started there
    # would return lam instead of lambda_max.
    v0 = jax.random.normal(jax.random.PRNGKey(0), (n,), dtype=X.dtype)
    v0 = v0 / jnp.linalg.norm(v0)
    v = jax.lax.fori_loop(0, iters, body, v0)
    return jnp.vdot(v, mv(v))


@functools.partial(jax.jit, static_argnames=('desc_perms_key',))
def _assemble_ee_A(X, sig, lam_p, *, desc_perms_key):
    """Energy-energy border block of ``A = -K + lam' I``:
    ``Aee[i, j] = sum_p k(x_i, x_j^p) + lam' delta_ij`` (the negation of
    the assembled ee kernel block, sgdml/train.py:298-300). ``(m, m)`` is
    a small border (m <= a few thousand)."""
    desc_perms = np.frombuffer(desc_perms_key[0], dtype=np.int64).reshape(
        desc_perms_key[1]
    )
    from ..ops.kernel import Mat52Coeffs, _SQRT5 as SQ5

    m = X.shape[0]
    dp = jnp.asarray(desc_perms)
    Xp = X[:, dp].reshape(-1, X.shape[1])  # (m*P, D)
    d = X[:, None, :] - Xp[None, :, :]
    u5 = SQ5 * jnp.sqrt(jnp.maximum(jnp.sum(d * d, axis=-1), 0.0))
    k = Mat52Coeffs.value(u5, sig).reshape(m, m, desc_perms.shape[0])
    return k.sum(-1) + lam_p * jnp.eye(m, dtype=X.dtype)


@functools.partial(
    jax.jit, static_argnames=('desc_perms_key', 'n_atoms', 'tile')
)
def _assemble_fe_A(X, Jc, sig, *, desc_perms_key, n_atoms, tile=64):
    """Force-rows x energy-columns border of ``A = -K``:
    ``A_fe[(i, x), j] = grad_x k(x_j, x_i^p)^T J_i`` summed over perms
    (the negation of the assembled ef kernel border, same tile math as
    _assemble_jit's E blocks; reference sgdml/train.py:251-265). Tiled
    over the energy columns to bound the (tile, m*P, D) diff tensor.
    Returns ``(m*3N, m)`` f64."""
    desc_perms = np.frombuffer(desc_perms_key[0], dtype=np.int64).reshape(
        desc_perms_key[1]
    )
    from ..ops.kernel import (
        _grad_row_tile, expand_perm_jacobian, perm_incidence, perm_tables,
    )

    m, dim_d = X.shape
    dim_i = 3 * n_atoms
    n_perms = desc_perms.shape[0]
    s_perm = jnp.asarray(perm_incidence(desc_perms, n_atoms), dtype=X.dtype)
    Xp, Jcp = perm_tables(X, Jc, desc_perms)
    Jit = expand_perm_jacobian(Jcp, s_perm).reshape(m * n_perms, dim_d, dim_i)
    Xit = Xp.reshape(m * n_perms, dim_d)

    tile = min(tile, m)
    n_tj = -(-m // tile)
    m_pad = n_tj * tile
    Xc = jnp.pad(X, ((0, m_pad - m), (0, 0)))
    out = jnp.zeros((m * dim_i, m_pad), dtype=X.dtype)

    def body(tj, out):
        j0 = tj * tile
        Xj = jax.lax.dynamic_slice_in_dim(Xc, j0, tile, 0)
        ef = _grad_row_tile(Xj, Xit, Jit, sig)  # (tile, m*P, 3N)
        ef = ef.reshape(tile, m, n_perms, dim_i).sum(axis=2)
        ef = ef.transpose(1, 2, 0).reshape(m * dim_i, tile)
        return jax.lax.dynamic_update_slice(out, ef, (0, j0))

    out = jax.lax.fori_loop(0, n_tj, body, out)
    # K's ef border is what _grad_row_tile yields; A = -K.
    return -out[:, :m]


def _border_M_apply(M_ff, G, Ls, n_f):
    """Exact bordered (Schur-complement) preconditioner apply:

        M = [[P_ff, A_fe], [A_ef, Aee + lam']],
        G = P_ff^{-1} A_fe,   S = Aee + lam' - A_ef G,   Ls = chol(S)

        M^{-1} v = [P_ff^{-1} v_f - G z_e;  z_e],
        z_e = S^{-1} (v_e - G^T v_f)

    Symmetric PSD by construction (``G^T v_f == A_ef P_ff^{-1} v_f``),
    and EXACT for the lam'-shifted bordered matrix up to the factor's
    precision floor — so the preconditioned condition number keeps the
    lam'/lam bound that makes the refinement CG converge (a
    block-diagonal variant that dropped the coupling stalled at ~1e-5
    relative residual, measured)."""

    def M_apply(v):
        vf, ve = v[:n_f], v[n_f:]
        zf0 = M_ff(vf)
        ze = jax.scipy.linalg.cho_solve(
            (Ls, True), ve - G.T.astype(ve.dtype) @ vf
        )
        zf = zf0 - G.astype(zf0.dtype) @ ze.astype(zf0.dtype)
        return jnp.concatenate([zf, ze.astype(zf.dtype)])

    return M_apply


@functools.partial(
    jax.jit,
    static_argnames=('n_atoms', 'desc_perms_key', 'max_iters', 'init',
                     'use_E_cstr'),
)
def _pcg_chol(
    state, L32, G, Ls, X, Jc, y, sig, lam, rtol,
    *, n_atoms, desc_perms_key, max_iters, init=False, use_E_cstr=False,
):
    """One chunk of conjugate gradients on the f64 system
    ``(-K + lam I) x = y`` with a block-grid f32 Cholesky preconditioner
    (extended to an exact bordered preconditioner via ``(G, Ls)`` when
    ``use_E_cstr`` — see _border_M_apply).

    The matvec is the matrix-free f64 prediction pass (exact system); the
    preconditioner application is block-triangular f32 solves. With
    ``init`` the state is built from scratch (pass ``state=None``); the
    per-chunk iteration counter restarts at 0, so the host driver can loop
    chunks with progress logging. Returns ``(state, resid_norm)``.
    """
    from .iterative import _matvec_A

    m = X.shape[0]
    n = y.shape[0]
    n_f = n - (m if use_E_cstr else 0)
    n_pad = len(L32) * L32[0][0].shape[0]

    def A_apply(v):
        return _matvec_A(
            v, X, Jc, X, Jc, sig, lam,
            n_atoms=n_atoms, desc_perms_key=desc_perms_key,
            use_E_cstr=use_E_cstr,
        )

    def M_ff(v):
        vp = jnp.zeros((n_pad,), dtype=jnp.float32)
        vp = jax.lax.dynamic_update_slice(vp, v.astype(jnp.float32), (0,))
        return blockchol.solve_grid(L32, vp)[:n_f].astype(v.dtype)

    M_apply = _border_M_apply(M_ff, G, Ls, n_f) if use_E_cstr else M_ff

    b_norm = jnp.linalg.norm(y)

    def cond(carry):
        _, r, _, _, _, it = carry
        rn = jnp.linalg.norm(r)
        return (it < max_iters) & (rn > rtol * b_norm) & jnp.isfinite(rn)

    def body(carry):
        x, r, z, p, rz, it = carry
        Ap = A_apply(p)
        alpha = rz / (p @ Ap)
        x = x + alpha * p
        r = r - alpha * Ap
        z = M_apply(r)
        rz_new = r @ z
        beta = rz_new / rz
        p = z + beta * p
        return (x, r, z, p, rz_new, it + 1)

    if init:
        x0 = jnp.zeros_like(y)
        z0 = M_apply(y)
        state = (x0, y, z0, z0, y @ z0, 0)
    else:
        x, r, z, p, rz, _ = state
        state = (x, r, z, p, rz, 0)
    out = jax.lax.while_loop(cond, body, state)
    return out, jnp.linalg.norm(out[1])


@functools.partial(
    jax.jit,
    donate_argnums=(0,),
    static_argnames=('n_atoms', 'desc_perms_key', 'use_E_cstr'),
)
def _pcg_pair_step(
    state, sstrips, Dinv, G, Ls, X, Jc, sig, lam,
    *, n_atoms, desc_perms_key, use_E_cstr=False,
):
    """ONE refinement-CG iteration: matrix-free f64 matvec + int8-strip
    preconditioner solve (plus the dense E-border factor when
    ``use_E_cstr``), fused into a single program.

    Host-stepped (not a while_loop) because XLA's compression-remat
    pass clones large f32 while-loop constants; with the factor stored
    as int8 slice stacks there is nothing to compress and the single
    program is bandwidth-bound. The driver syncs every few iterations.
    """
    from .iterative import _matvec_A

    x, r, z, p, rz = state
    Ap = _matvec_A(
        p, X, Jc, X, Jc, sig, lam,
        n_atoms=n_atoms, desc_perms_key=desc_perms_key,
        use_E_cstr=use_E_cstr,
    )
    alpha = rz / (p @ Ap)
    x = x + alpha * p
    r = r - alpha * Ap
    z = _pair_M_apply(sstrips, Dinv, G, Ls, r, X.shape[0], use_E_cstr)
    rz_new = r @ z
    beta = rz_new / rz
    p = z + beta * p
    return (x, r, z, p, rz_new), jnp.linalg.norm(r)


def _pair_M_apply(sstrips, Dinv, G, Ls, v, m, use_E_cstr):
    if not use_E_cstr:
        return pairchol.solve_strips_int8(sstrips, Dinv, v)
    M_ff = functools.partial(pairchol.solve_strips_int8, sstrips, Dinv)
    return _border_M_apply(M_ff, G, Ls, v.shape[0] - m)(v)


@functools.partial(jax.jit, static_argnames=('use_E_cstr',))
def _pcg_pair_start(sstrips, Dinv, G, Ls, y, *, use_E_cstr=False):
    z0 = _pair_M_apply(sstrips, Dinv, G, Ls, y, Ls.shape[0], use_E_cstr)
    return (jnp.zeros_like(y), y, z0, z0, y @ z0)


@jax.jit
def _border_pieces_grid(L32, A_fe, Aee):
    """Bordered-preconditioner pieces for the f32 grid factor:
    ``G = P_ff^{-1} A_fe`` (multi-RHS block-triangular solves),
    ``Ls = chol(Aee + lam' - A_ef G)``."""
    n_f = A_fe.shape[0]
    n_pad = len(L32) * L32[0][0].shape[0]
    B = jnp.zeros((n_pad, A_fe.shape[1]), dtype=jnp.float32)
    B = jax.lax.dynamic_update_slice(B, A_fe.astype(jnp.float32), (0, 0))
    G = blockchol.solve_grid(L32, B)[:n_f]  # f32 (n_f, m)
    S = Aee - A_fe.T @ G.astype(Aee.dtype)
    return G, jnp.linalg.cholesky(S)


@jax.jit
def _border_pieces_pair(sstrips, Dinv, A_fe, Aee):
    """Bordered-preconditioner pieces for the pair-precision factor."""
    G = pairchol.solve_strips_int8(sstrips, Dinv, A_fe)  # f64 (n_f, m)
    S = Aee - A_fe.T @ G
    return G, jnp.linalg.cholesky(S)


class Analytic:
    """Closed-form training on device.

    Parameters
    ----------
    desc: unused placeholder kept for API parity with the iterative solver.
    callback: optional progress callback (current, total, ...).
    """

    def __init__(self, gdml_train=None, desc=None, callback=None, mesh=None,
                 max_memory: float = 12, mesh_precision: str = 'f64'):
        self.gdml_train = gdml_train
        self.callback = callback
        self.mesh = mesh
        self._max_memory = max_memory
        # 'pair' = (f32+bf16) Cholesky with int8-MXU Ozaki updates + CG
        # refinement (the performant mode on real chips); 'f64' = exact
        # emulated-f64 factorization (default; CPU-mesh friendly).
        self.mesh_precision = mesh_precision

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

        budget = self._max_memory * 1024**3
        # Route away from dense f64 by TIME as well as memory: emulated
        # f64 Cholesky runs at 0.18 TFLOP/s on this hardware (measured
        # 533 s at n=12,600 where the f32-grid path takes 28 s and the
        # pair path less), so anything beyond ~8k unknowns prefers the
        # factored-precision paths even when dense f64 would fit.
        n_total = n_train * 3 * n_atoms + (n_train if use_E_cstr else 0)
        if (
            Analytic.est_memory_requirement(n_train, n_atoms, use_E_cstr)
            > budget
            or n_total > 8192
        ):
            # Route by conditioning: the f32 grid's factor is ~5x
            # cheaper, and with lam >= ~1e-7 lmax its unshifted (or
            # first-rung) factorization holds, so CG is short either
            # way. The pair path pays its costlier factor off only when
            # lam sits far below the f32 floor (then its lam' is 100x
            # smaller -> ~10x fewer CG iterations; measured 160 vs 1671
            # at n=63k, BENCH_NOTES.md).
            dperms0 = np.asarray(desc_perms)
            pk = (
                np.ascontiguousarray(dperms0.astype(np.int64)).tobytes(),
                dperms0.shape,
            )
            lmax = float(
                _lmax_power(
                    jnp.asarray(R_desc), jnp.asarray(R_d_desc), sig, lam,
                    n_atoms=n_atoms, desc_perms_key=pk,
                    use_E_cstr=use_E_cstr,
                )
            )
            if (
                lam < 1e-7 * lmax
                and Analytic.est_memory_pair(n_train, n_atoms) <= budget
            ):
                return self._solve_pair_pcg(
                    task, R_desc, R_d_desc, desc_perms, y, sig, lam,
                    n_atoms, lmax=lmax,
                )
            return self._solve_grid_pcg(
                task, R_desc, R_d_desc, desc_perms, y, sig, lam, n_atoms,
                lmax=lmax,
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
        alphas = spmd.solve_interleaved(
            K, np.asarray(y), lam, lay, precision=self.mesh_precision
        )
        t_solve = timeit.default_timer() - t0
        log.info(
            'Solved %d-dim linear system (blocked Cholesky over %d devices) '
            'in %.2f s', lay.n, lay.n_dev, t_solve,
        )
        self.t_assemble = t_assemble
        self.t_solve = t_solve
        return np.asarray(alphas)

    def _solve_grid_pcg(
        self, task, R_desc, R_d_desc, desc_perms, y, sig, lam, n_atoms,
        lmax=None,
    ):
        """Large-system closed-form solve: f32 block-grid Cholesky
        preconditioner + f64 matrix-free refinement CG (module docstring)."""
        use_E_cstr = bool(task.get('use_E_cstr', False))
        dim_i = 3 * n_atoms
        m = R_desc.shape[0]
        m_pad = -(-m // 8) * 8
        spec = blockchol.grid_spec(
            m_pad * dim_i, target_block=8192, align=dim_i
        )

        X64 = jnp.asarray(R_desc)
        Jc64 = jnp.asarray(R_d_desc)
        y_dev = jnp.asarray(y, dtype=X64.dtype)
        dperms = np.asarray(desc_perms)
        perms_key = (
            np.ascontiguousarray(dperms.astype(np.int64)).tobytes(),
            dperms.shape,
        )

        t0 = timeit.default_timer()
        if lmax is None:
            lmax = float(
                _lmax_power(
                    X64, Jc64, sig, lam,
                    n_atoms=n_atoms, desc_perms_key=perms_key,
                    use_E_cstr=use_E_cstr,
                )
            )

        # lam' ladder: raise the preconditioner shift until the f32
        # factorization stays positive. The preconditioned condition number
        # is bounded by lam'/lam, so CG always converges; when lam' == lam
        # it converges in a handful of iterations.
        L32 = None
        lam_p_used = None
        # Skip the unshifted rung when it cannot possibly succeed: an f32
        # factorization needs the smallest eigenvalue above ~n*eps32*lmax.
        shifts = [0.0, 3e-7, 3e-6, 3e-5, 3e-4, 3e-3]
        if lam < 1e-7 * lmax:
            shifts = shifts[1:]
        for shift in shifts:
            lam_p = max(lam, shift * lmax)
            A32 = assemble_kernel_grid(
                R_desc, R_d_desc, desc_perms, sig, n_atoms, spec,
                dtype=jnp.float32,
            )
            A32 = blockchol.grid_diag_add(A32, jnp.float32(lam_p))
            L = blockchol.chol_grid(A32)
            if bool(blockchol.grid_isfinite(L)):
                L32, lam_p_used = L, lam_p
                break
            del L
        if L32 is None:
            raise RuntimeError(
                'f32 block Cholesky failed even with a strong diagonal '
                'shift; the kernel matrix is numerically degenerate. '
                'Try a different sigma.'
            )
        # Energy-constraint border: exact bordered preconditioner at the
        # same lam' (Schur complement through the factor — see
        # _border_M_apply). Reference coverage: sgdml/train.py:235-300
        # E-constraint blocks x its analytic solver class.
        if use_E_cstr:
            A_fe = _assemble_fe_A(
                X64, Jc64, sig, desc_perms_key=perms_key, n_atoms=n_atoms
            )
            Aee = _assemble_ee_A(
                X64, sig, lam_p_used, desc_perms_key=perms_key
            )
            G, Ls = _border_pieces_grid(L32, A_fe, Aee)
            del A_fe, Aee
        else:
            G = Ls = jnp.zeros((1, 1), X64.dtype)
        t_assemble = timeit.default_timer() - t0
        log.info(
            'Assembled+factorized %dx%d f32 packed triangle in %.2f s '
            '(lmax=%.3e, lam\'=%g%s%s).',
            spec.n, spec.n, t_assemble, lmax, lam_p_used,
            '' if lam_p_used == lam else ' [shifted for f32 stability]',
            ' [+%d-row E border]' % m if use_E_cstr else '',
        )

        t0 = timeit.default_timer()
        b_norm = max(float(np.linalg.norm(y)), 1e-300)
        state, iters, rel = None, 0, 1.0
        # Best finite iterate across chunk boundaries: a CG numerical
        # breakdown poisons the in-flight state with NaNs (the while_loop
        # exits on a non-finite residual), and NaN comparisons being False
        # would otherwise let the poisoned x through silently.
        best_x, best_rel = None, np.inf
        chunk = 250
        for _ in range(-(-PCG_MAX_ITERS // chunk)):
            state, resid = _pcg_chol(
                state, L32, G, Ls, X64, Jc64, y_dev, sig, lam, PCG_RTOL,
                n_atoms=n_atoms, desc_perms_key=perms_key,
                max_iters=chunk, init=state is None,
                use_E_cstr=use_E_cstr,
            )
            it_done = int(state[5])  # host sync per chunk
            iters += it_done
            rel = float(resid) / b_norm
            if np.isfinite(rel) and rel < best_rel:
                best_x, best_rel = state[0], rel
            log.info(
                'Refinement CG: %d iterations, relative residual %.2e '
                '(%.1f s).', iters, rel, timeit.default_timer() - t0,
            )
            if not np.isfinite(rel):
                break
            if rel <= PCG_RTOL or it_done < chunk:
                break
        if not np.isfinite(rel):
            if best_x is None:
                raise RuntimeError(
                    'Refinement CG broke down numerically before producing '
                    'a finite iterate (the f32 factor is unusable as a '
                    'preconditioner). Try a different sigma or a larger '
                    'regularization.'
                )
            log.warning(
                'Refinement CG broke down numerically at iteration %d; '
                'returning the best finite iterate (relative residual '
                '%.2e).', iters, best_rel,
            )
            x, rel = best_x, best_rel
        else:
            x = state[0]
        t_solve = timeit.default_timer() - t0
        if not (rel <= 1e-6):
            log.warning(
                'Refinement CG stopped at relative residual %.2e (target '
                '%.0e); the solution may be slightly less accurate than a '
                'direct f64 factorization.', rel, PCG_RTOL,
            )

        self.t_assemble = t_assemble
        self.t_solve = t_solve
        self.pcg_iters = iters
        return -np.asarray(x)

    def _solve_pair_pcg(
        self, task, R_desc, R_d_desc, desc_perms, y, sig, lam, n_atoms,
        target_block: int = 4096, assembly: str = 'f64', lmax=None,
        mm: str = 'auto',
    ):
        """Large-system closed-form solve, pair-precision variant: the
        (f32, bf16) block Cholesky with Ozaki int8 updates
        (ops/pairchol.py) factors at the pair-storage error floor, so
        the stability shift lam' sits orders of magnitude below the f32
        grid's (~3e-7 lmax) — and the refinement CG converges in
        ~sqrt(lam'_f32 / lam'_pair) fewer iterations."""
        use_E_cstr = bool(task.get('use_E_cstr', False))
        if mm == 'auto':
            # Ozaki int8-MXU assembly contractions measured 3.7x the
            # emulated-f64 einsums at n=63k (200.4 s -> 54.0 s,
            # BENCH_NOTES round 3); 7 slices truncate below the
            # pair-storage floor, so the lam' ladder is unaffected.
            # int8 dots are slow on the CPU test backend — gate on TPU.
            mm = 'ozaki' if jax.devices()[0].platform == 'tpu' else 'native'
        dim_i = 3 * n_atoms
        m = R_desc.shape[0]
        m_pad = -(-m // 8) * 8
        spec = blockchol.grid_spec(
            m_pad * dim_i, target_block=target_block, align=dim_i
        )

        X64 = jnp.asarray(R_desc)
        Jc64 = jnp.asarray(R_d_desc)
        y_dev = jnp.asarray(y, dtype=X64.dtype)
        dperms = np.asarray(desc_perms)
        perms_key = (
            np.ascontiguousarray(dperms.astype(np.int64)).tobytes(),
            dperms.shape,
        )

        t0 = timeit.default_timer()
        if lmax is None:
            lmax = float(
                _lmax_power(
                    X64, Jc64, sig, lam,
                    n_atoms=n_atoms, desc_perms_key=perms_key,
                    use_E_cstr=use_E_cstr,
                )
            )

        # lam' ladder, starting near the pair-storage floor (~2^-33
        # lmax) plus assembly noise; each failed rung costs one
        # assembly + partial factorization (fails fast on the first
        # indefinite leaf).
        lam_p_used = None
        shifts = [0.0, 3e-9, 3e-8, 3e-7, 3e-6]
        if lam < 1e-9 * lmax:
            shifts = shifts[1:]
        for shift in shifts:
            lam_p = max(lam, shift * lmax)
            ts = timeit.default_timer()
            if assembly == 'f64':
                # True-pair entries (~33 bits): the lam' floor is the
                # pair-storage limit, not f32 assembly entry noise.
                Ghi, Glo = assemble_kernel_grid_pair(
                    R_desc, R_d_desc, desc_perms, sig, n_atoms, spec, mm=mm
                )
            else:
                A32 = assemble_kernel_grid(
                    R_desc, R_d_desc, desc_perms, sig, n_atoms, spec,
                    dtype=jnp.float32,
                )
                Ghi, Glo = pairchol.grid_pair_from_f32(A32)
                del A32
            Ghi, Glo = pairchol.grid_pair_diag_add(Ghi, Glo, lam_p)
            t_asm = timeit.default_timer() - ts
            ts = timeit.default_timer()
            Lh_try, Ll_try = pairchol.chol_grid_pair(Ghi, Glo)
            del Ghi, Glo
            ok = bool(pairchol.grid_pair_isfinite(Lh_try))
            log.debug(
                "pair rung lam'=%g: assembly %.1f s, factorization %.1f s "
                '(%s).', lam_p, t_asm, timeit.default_timer() - ts,
                'ok' if ok else 'indefinite',
            )
            if ok:
                Lh, Ll, lam_p_used = Lh_try, Ll_try, lam_p
                break
            del Lh_try, Ll_try
        else:
            Lh = None
        if Lh is None:
            log.warning(
                'Pair-precision factorization failed at every lam\' rung; '
                'falling back to the f32 grid solver.'
            )
            return self._solve_grid_pcg(
                task, R_desc, R_d_desc, desc_perms, y, sig, lam, n_atoms
            )
        ts = timeit.default_timer()
        # Staged repack: factorize fully at 6 B/elem pair residency,
        # THEN convert to the int8 solve form strip-by-strip (a fused
        # per-column repack raised MID-sweep residency past HBM at
        # n = 63k: early columns are the longest strips and coexist
        # with the entire remaining pair triangle).
        Dinv = pairchol.leaf_inverses(Lh, Ll)
        for j in range(len(Lh)):
            Lh[j][j] = None
            Ll[j][j] = None
        sstrips = pairchol.int8_strips(pairchol.strips_from_grid(Lh, Ll))
        del Lh, Ll
        Dinv = pairchol.slice_leaf_inverses(Dinv)
        log.debug(
            'leaf inverses + int8 repack: %.1f s.',
            timeit.default_timer() - ts,
        )
        # Energy-constraint border (see _solve_grid_pcg): exact bordered
        # preconditioner through the pair factor at the same lam'.
        if use_E_cstr:
            A_fe = _assemble_fe_A(
                X64, Jc64, sig, desc_perms_key=perms_key, n_atoms=n_atoms
            )
            Aee = _assemble_ee_A(
                X64, sig, lam_p_used, desc_perms_key=perms_key
            )
            G, Ls = _border_pieces_pair(sstrips, Dinv, A_fe, Aee)
            del A_fe, Aee
        else:
            G = Ls = jnp.zeros((1, 1), X64.dtype)
        t_assemble = timeit.default_timer() - t0
        log.info(
            'Assembled+factorized %dx%d pair-precision (f32+bf16) triangle '
            'in %.2f s (lmax=%.3e, lam\'=%g%s%s).',
            spec.n, spec.n, t_assemble, lmax, lam_p_used,
            '' if lam_p_used == lam else ' [shifted for pair stability]',
            ' [+%d-row E border]' % m if use_E_cstr else '',
        )

        t0 = timeit.default_timer()
        b_norm = max(float(np.linalg.norm(y)), 1e-300)
        state = _pcg_pair_start(
            sstrips, Dinv, G, Ls, y_dev, use_E_cstr=use_E_cstr
        )
        it, rel, check = 0, 1.0, 10
        # Best finite iterate at the host sync points: a CG breakdown
        # (non-finite residual) must never return poisoned alphas.
        best_x, best_rel = None, np.inf
        while it < PCG_MAX_ITERS:
            state, rn = _pcg_pair_step(
                state, sstrips, Dinv, G, Ls, X64, Jc64, sig, lam,
                n_atoms=n_atoms, desc_perms_key=perms_key,
                use_E_cstr=use_E_cstr,
            )
            it += 1
            if it % check == 0 or it == PCG_MAX_ITERS:
                # device_get forces completion through the axon tunnel
                # (block_until_ready does not); bounds the dispatch queue.
                rel = float(jax.device_get(rn)) / b_norm
                if np.isfinite(rel) and rel < best_rel:
                    best_x, best_rel = state[0], rel
                if it % 50 == 0:
                    log.info(
                        'Refinement CG: %d iterations, relative residual '
                        '%.2e (%.1f s).', it, rel,
                        timeit.default_timer() - t0,
                    )
                if rel <= PCG_RTOL or not np.isfinite(rel):
                    break
        if not np.isfinite(rel):
            if best_x is None:
                log.warning(
                    'Pair-precision refinement CG broke down before '
                    'producing a finite iterate; falling back to the f32 '
                    'grid solver.'
                )
                return self._solve_grid_pcg(
                    task, R_desc, R_d_desc, desc_perms, y, sig, lam,
                    n_atoms, lmax=lmax,
                )
            log.warning(
                'Pair-precision refinement CG broke down numerically at '
                'iteration %d; returning the best finite iterate '
                '(relative residual %.2e).', it, best_rel,
            )
            x, rel = best_x, best_rel
        else:
            x = state[0]
        t_solve = timeit.default_timer() - t0
        log.info(
            'Refinement CG done: %d iterations, relative residual '
            '%.2e (%.1f s).', it, rel, t_solve,
        )
        if not (rel <= 1e-6):
            log.warning(
                'Refinement CG stopped at relative residual %.2e (target '
                '%.0e); the solution may be slightly less accurate than a '
                'direct f64 factorization.', rel, PCG_RTOL,
            )

        self.t_assemble = t_assemble
        self.t_solve = t_solve
        self.pcg_iters = it
        return -np.asarray(x)

    @staticmethod
    def est_memory_pair(n_train, n_atoms):
        """Bytes for the pair-precision path. Peak = CG phase: 7-slice
        int8 strips (3.5 B/elem over the full square) + 8-slice int8
        leaf inverses + transients. At n = 63k this is ~15 GB — above
        the conservative 12 GiB default budget; callers that know the
        real HBM (e.g. bench configs on a 16 GB chip) pass a larger
        ``max_memory`` to unlock it."""
        dim_i = 3 * n_atoms
        n = (-(-n_train // 8) * 8) * dim_i
        # Leaf block dimension from the same grid_spec the solve uses
        # (_solve_pair_pcg: target_block=4096, align=dim_i) — it varies
        # with the molecule, so a hard-coded constant would misroute
        # pair-vs-grid near the memory boundary.
        spec = blockchol.grid_spec(n, target_block=4096, align=dim_i)
        return int(3.5 * n**2 + 8 * n * spec.b + 3e8)

    @staticmethod
    def est_memory_requirement(n_train, n_atoms, use_E_cstr=False):
        """Bytes needed on device for the dense f64 path: K + Cholesky
        factor + solve scratch (reference formula:
        sgdml/solvers/analytic.py:153-159)."""
        n = n_train * 3 * n_atoms + (n_train if use_E_cstr else 0)
        return 3 * n**2 * 8 + n * 8

    @staticmethod
    def est_memory_grid(n_train, n_atoms):
        """Bytes needed on device for the f32 packed-triangle path: packed
        triangle (n^2/2 f32) + top-level rectangle transients (~n^2/4)."""
        n = (-(-n_train // 8) * 8) * 3 * n_atoms
        return 3 * n**2  # (2 + 1) * n^2 bytes
