"""Matern-5/2 Hessian kernel blocks and kernel-matrix assembly, TPU-native.

GDML models forces directly: the kernel between two geometries ``i`` and
``j`` is the ``3N x 3N`` block

    K_ij = J_i^T [ sum_p H_k(x_i, P_p x_j) ] J_j^(p),

where ``x`` are inverse-pairwise-distance descriptors, ``J`` their Jacobians,
``P_p`` ranges over the molecule's permutation group (the "s" in sGDML) and
``H_k`` is the Hessian of the Matern-5/2 kernel

    k(u) = (1 + sqrt5 u / sig + 5 u^2 / (3 sig^2)) exp(-sqrt5 u / sig),
    u = ||x_i - x_j||.

Writing ``d = x_i - x_j``, ``u5 = sqrt5 ||d||`` and
``b = 5 exp(-u5/sig) / (3 sig^4)``, the assembled Hessian block is

    H = b (5 d d^T - (sig^2 + sig u5) I),

which matches the reference worker's algebra (sgdml/train.py:179-232) —
re-derived here, and verified against finite differences of the kernel
gradient in tests/test_kernel.py.

TPU-first formulation
---------------------
The reference assembles one ``3N``-wide column block per multiprocessing
worker with irregular ``tril_perms_lin`` gathers (sgdml/train.py:97-302).
Here the whole assembly is a tiled, jit-compiled program of three batched
matmuls per tile:

* the Jacobian Gram term  ``G[i,x,t,y] = sum_d Ji[i,d,x] Jt[t,d,y]`` — one
  ``(I*3N, D) @ (D, T*3N)`` MXU matmul, independent of sigma;
* the two gradient contractions ``a = d @ J_i`` and ``c = d @ J_t`` —
  batched matmuls;
* everything else is VPU elementwise on ``(I, T)`` coefficient planes.

Permutations are flattened into the table axis ``t = (j, p)`` and reduced by
a reshape+sum — no gathers inside the hot loop. Permuted full Jacobians
inherit the incidence factorization: row-permuting ``J = S (.) Jc`` permutes
both factors, so tables stay compressed until tile expansion.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

from .descriptor import incidence

__all__ = [
    'Mat52Coeffs',
    'perm_incidence',
    'perm_tables',
    'gram_maps',
    'hessian_tile',
    'hessian_tile_compressed',
    'assemble_kernel',
    'assemble_kernel_columns',
    'assemble_kernel_grid',
]

_SQRT5 = math.sqrt(5.0)


def perm_incidence(desc_perms: np.ndarray, n_atoms: int) -> np.ndarray:
    """Row-permuted signed incidence matrices ``(P, D, N)`` (static)."""
    s = incidence(n_atoms)
    return np.stack([s[p, :] for p in desc_perms], axis=0)


def perm_tables(X: jnp.ndarray, Jc: jnp.ndarray, desc_perms: np.ndarray):
    """Permuted descriptor/Jacobian tables.

    Parameters
    ----------
    X: ``(M, D)`` descriptors. Jc: ``(M, D, 3)`` compressed Jacobians.
    desc_perms: ``(P, D)`` descriptor-space permutations (host ints).

    Returns
    -------
    Xp: ``(M, P, D)`` with ``Xp[m, p] = X[m][desc_perms[p]]``.
    Jcp: ``(M, P, D, 3)`` row-permuted compressed Jacobians.

    The permuted *full* Jacobian of ``(m, p)`` is
    ``S_p (.) Jcp[m, p]`` with ``S_p = perm_incidence(...)[p]``.
    """
    dp = jnp.asarray(np.asarray(desc_perms))
    Xp = X[:, dp]  # (M, P, D) via gather on host-static indices
    Jcp = Jc[:, dp, :]
    return Xp, Jcp


def expand_perm_jacobian(Jcp: jnp.ndarray, s_perm: jnp.ndarray) -> jnp.ndarray:
    """Expand permuted compressed Jacobians ``(..., P, D, 3)`` to full
    ``(..., P, D, 3N)`` using the permuted incidence ``s_perm (P, D, N)``."""
    full = jnp.einsum('pdn,...pdc->...pdnc', s_perm, Jcp)
    return full.reshape(*full.shape[:-2], full.shape[-2] * 3)


class Mat52Coeffs:
    """Scalar coefficient functions of the Matern-5/2 kernel family.

    ``u5`` always denotes ``sqrt(5) * ||x - x'||``.
    """

    @staticmethod
    def hess(u5, sig):
        """(b, cc): H = b * (5 d d^T) - cc * I."""
        b = 5.0 * jnp.exp(-u5 / sig) / (3.0 * sig**4)
        cc = b * (sig**2 + sig * u5)
        return b, cc

    @staticmethod
    def grad(u5, sig):
        """w: grad_x k = -w * d  (w = 5 (u5 + sig) exp(-u5/sig) / (3 sig^3))."""
        return 5.0 / (3.0 * sig**3) * (u5 + sig) * jnp.exp(-u5 / sig)

    @staticmethod
    def value(u5, sig):
        """k itself: (1 + u5/sig (1 + u5/(3 sig))) exp(-u5/sig)."""
        return (1.0 + (u5 / sig) * (1.0 + u5 / (3.0 * sig))) * jnp.exp(-u5 / sig)


def hessian_tile(Xi, Ji, Xt, Jt, sig):
    """Kernel Hessian blocks for a tile of (row point, column table) pairs.

    Parameters
    ----------
    Xi: ``(I, D)`` row descriptors.  Ji: ``(I, D, 3N)`` row Jacobians (full).
    Xt: ``(T, D)`` column table descriptors (already permuted).
    Jt: ``(T, D, 3N)`` column table Jacobians (full, already permuted).
    sig: kernel length scale.

    Returns
    -------
    ``(I, 3N, T, 3N)`` tile: ``out[i, :, t, :] = J_i^T H(x_i, x_t) J_t``.
    """
    d = Xi[:, None, :] - Xt[None, :, :]  # (I, T, D) — tile-local, small
    u5 = _SQRT5 * jnp.sqrt(jnp.maximum(jnp.sum(d * d, axis=-1), 0.0))
    b, cc = Mat52Coeffs.hess(u5, sig)

    a = jnp.einsum('itd,idx->itx', d, Ji)  # J_i^T d
    c = jnp.einsum('itd,tdy->ity', d, Jt)  # d^T J_t
    g = jnp.einsum('idx,tdy->ixty', Ji, Jt)  # Jacobian Gram (MXU)

    k1 = (5.0 * b)[:, :, None, None] * a[:, :, :, None] * c[:, :, None, :]
    out = k1.transpose(0, 2, 1, 3) - cc[:, None, :, None] * g
    return out


@functools.lru_cache(maxsize=None)
def _gram_maps_cached(desc_perms_key, n_atoms: int):
    desc_perms = np.frombuffer(desc_perms_key[0], dtype=np.int64).reshape(
        desc_perms_key[1]
    )
    return gram_maps(desc_perms, n_atoms)


def gram_maps(desc_perms: np.ndarray, n_atoms: int):
    """Static index maps for the closed-form Jacobian Gram (host-side).

    The Gram block between row geometry ``i`` (identity descriptor order)
    and permuted column geometry ``t`` is

        G[(m,a),(n,b)] = sum_d s[d,m] s_p[d,n] Jc_i[d,a] Jc_t[d,b],

    and ``s[d,m] s_p[d,n] != 0`` only when atom ``m`` is in pair(d) and atom
    ``n`` is in pair(perm_p(d)). For ``n != pi_p(m)`` exactly ONE descriptor
    contributes (d = pair(m, pi_p^-1(n))); for ``n == pi_p(m)`` all ``N-1``
    descriptors through ``m`` contribute. So G collapses to one static
    gather plus one small row-reduction matmul — O(9*N*D) work per pair of
    geometries instead of the dense O(9*N^2*D) Gram the reference's algebra
    implies (sgdml/train.py:194-232).

    Returns per permutation ``p`` (stacked along axis 0):
    g_idx: ``(P, N*N)`` int32 — contributing descriptor per (m, n) block
        (unused value 0 at the ``n == pi_p(m)`` slots).
    sgn: ``(P, N*N)`` — sign ``s[d,m] * s_p[d,n]`` (0 at diagonal slots).
    a_diag: ``(P, N, D)`` — signed row-reduction for the ``n == pi_p(m)``
        blocks: ``A[m, d] = s[d, m] * s_p[d, pi_p(m)]``.
    diag_col: ``(P, N)`` int32 — ``pi_p(m)``.
    """
    desc_perms = np.asarray(desc_perms)
    n_perms = desc_perms.shape[0]
    s = incidence(n_atoms)  # (D, N)
    dim_d = s.shape[0]
    g_idx = np.zeros((n_perms, n_atoms * n_atoms), dtype=np.int32)
    sgn = np.zeros((n_perms, n_atoms * n_atoms))
    a_diag = np.zeros((n_perms, n_atoms, dim_d))
    diag_col = np.zeros((n_perms, n_atoms), dtype=np.int32)

    b1 = (s != 0).T  # (N, D) atom-in-pair
    for p in range(n_perms):
        s_p = s[desc_perms[p]]  # (D, N)
        b2 = (s_p != 0).T  # (N, D)
        # hits[m, n, d] — does descriptor d touch row-atom m and col-atom n?
        hits = b1[:, None, :] & b2[None, :, :]
        counts = hits.sum(axis=2)  # (N, N) in {1, N-1}
        if not np.all((counts == 1) | (counts == n_atoms - 1)):
            raise ValueError('inconsistent permutation incidence structure')
        dc = np.argmax(counts, axis=1)  # pi_p(m); unique since N-1 > 1
        diag_col[p] = dc
        g = np.argmax(hits, axis=2)  # unique d where counts == 1
        g_idx[p] = g.reshape(-1)
        sg = s[g, np.arange(n_atoms)[:, None]] * s_p[g, np.arange(n_atoms)[None, :]]
        sg[np.arange(n_atoms), dc] = 0.0
        sgn[p] = sg.reshape(-1)
        a_diag[p] = (s * s_p[:, dc]).T  # A[m, d] = s[d, m] * s_p[d, pi(m)]
    return g_idx, sgn, a_diag, diag_col


def hessian_tile_compressed(
    Xi, Jci, Xtp, Jctp, sig, s, s_perm, g_idx, sgn, a_diag, diag_col,
    mm='native',
):
    """Perm-summed kernel Hessian blocks from *compressed* Jacobians.

    Same math as :func:`hessian_tile` (verified to 1e-8 against reference
    golden values in tests/test_kernel.py) but the Jacobian Gram term is
    computed via the closed form of :func:`gram_maps` — O(9*N*D) per
    (geometry pair, perm) instead of O(9*N^2*D), and no ``(D, 3N)`` full
    Jacobians are ever materialized.

    Parameters
    ----------
    Xi: ``(I, D)`` row descriptors. Jci: ``(I, D, 3)`` compressed row Jacobians.
    Xtp: ``(T, P, D)`` permuted column descriptors.
    Jctp: ``(T, P, D, 3)`` permuted compressed column Jacobians.
    s: ``(D, N)`` incidence. s_perm: ``(P, D, N)`` permuted incidences.
    g_idx/sgn/a_diag/diag_col: outputs of :func:`gram_maps` (device arrays).

    ``mm='ozaki'``: run the three D-contraction einsums (the gradient
    contractions ``a``/``c`` and the diagonal-slot Gram ``t2``) as Ozaki
    int8-MXU GEMMs over (f32, f32) pair operands (7 slices — truncation
    below the pair-storage floor the pair assembly targets). The
    elementwise pieces (d, Matern coefficients, outer products, gathers)
    stay f64. Prototype for the TPU pair-assembly path, where these
    contractions otherwise run at the emulated-f64 rate.

    Returns
    -------
    ``(I, 3N, T, 3N)`` tile, already summed over permutations.
    """
    dim_i, dim_d = Xi.shape
    dim_t = Xtp.shape[0]
    n_atoms = s.shape[1]
    atom_ids = jnp.arange(n_atoms)

    if mm == 'ozaki':
        from . import ozaki as _oz

        def _oz_nt(a2, b2):
            a_hi = a2.astype(jnp.float32)
            a_lo = (a2 - a_hi.astype(jnp.float64)).astype(jnp.float32)
            b_hi = b2.astype(jnp.float32)
            b_lo = (b2 - b_hi.astype(jnp.float64)).astype(jnp.float32)
            return _oz.ozaki_gemm_nt(
                a_hi, b_hi, lo_a=a_lo, lo_b=b_lo, n_slices=7
            )

    def body(acc, inp):
        xt, jct, sp, gf, sg, ad, dc = inp
        d = Xi[:, None, :] - xt[None, :, :]  # (I, T, D)
        u5 = _SQRT5 * jnp.sqrt(jnp.maximum(jnp.sum(d * d, axis=-1), 0.0))
        b, cc = Mat52Coeffs.hess(u5, sig)  # (I, T)

        # Gradient contractions through the incidence factorization.
        wa = Jci[:, None, :, :] * d[..., None]  # (I, T, D, 3)
        wc = jct[None, :, :, :] * d[..., None]  # (I, T, D, 3)
        if mm == 'ozaki':
            a = _oz_nt(
                wa.transpose(0, 1, 3, 2).reshape(-1, dim_d), s.T
            ).reshape(dim_i, dim_t, 3, n_atoms).transpose(0, 1, 3, 2)
            c = _oz_nt(
                wc.transpose(0, 1, 3, 2).reshape(-1, dim_d), sp.T
            ).reshape(dim_i, dim_t, 3, n_atoms).transpose(0, 1, 3, 2)
        else:
            a = jnp.einsum('dm,itdc->itmc', s, wa)  # (I, T, N, 3)
            c = jnp.einsum('dn,itdc->itnc', sp, wc)  # (I, T, N, 3)

        # Diagonal-slot blocks: row-reduction over descriptors through m.
        t1 = ad[None, :, None, :] * Jci.transpose(0, 2, 1)[:, None, :, :]
        if mm == 'ozaki':
            t2 = _oz_nt(
                t1.reshape(-1, dim_d),  # rows ordered (i, m, a)
                jct.transpose(0, 2, 1).reshape(-1, dim_d),  # (t, b)
            ).reshape(dim_i, n_atoms, 3, dim_t, 3).transpose(0, 3, 1, 2, 4)
        else:
            t2 = jnp.einsum('imad,tdb->itmab', t1, jct)  # (I, T, N, 3, 3)

        # Off-diagonal blocks: one descriptor each — gather then outer.
        jci_g = jnp.take(Jci, gf, axis=1)  # (I, N*N, 3)
        jct_g = jnp.take(jct, gf, axis=1)  # (T, N*N, 3)
        wg = (
            jci_g[:, None, :, :, None]
            * jct_g[None, :, :, None, :]
            * sg[None, None, :, None, None]
        ).reshape(dim_i, dim_t, n_atoms, n_atoms, 3, 3)

        mask = (atom_ids[None, :] == dc[:, None])[None, None, :, :, None, None]
        gram = jnp.where(mask, t2[:, :, :, None, :, :], wg)

        k1 = jnp.einsum('it,itma,itnb->itmanb', 5.0 * b, a, c)
        out = k1 - cc[:, :, None, None, None, None] * gram.transpose(
            0, 1, 2, 4, 3, 5
        )
        return acc + out, None

    # Tie the zero carry to the inputs so its device-varying type matches
    # the body output when this runs inside a shard_map region.
    init = jnp.zeros(
        (dim_i, dim_t, n_atoms, 3, n_atoms, 3), dtype=Xi.dtype
    ) + 0.0 * (Xi[0, 0] + Xtp[0, 0, 0])
    acc, _ = jax.lax.scan(
        body,
        init,
        (
            Xtp.transpose(1, 0, 2),
            Jctp.transpose(1, 0, 2, 3),
            s_perm,
            g_idx,
            sgn,
            a_diag,
            diag_col,
        ),
    )
    return acc.transpose(0, 2, 3, 1, 4, 5).reshape(
        dim_i, 3 * n_atoms, dim_t, 3 * n_atoms
    )


def _grad_row_tile(Xi, Xt, Jt, sig):
    """Energy-force coupling rows: ``out[i, t, :] = -w(d) d^T J_t`` with
    ``d = x_i - x_t`` (reference sgdml/train.py:235-248). Shape (I, T, 3N)."""
    d = Xi[:, None, :] - Xt[None, :, :]
    u5 = _SQRT5 * jnp.sqrt(jnp.maximum(jnp.sum(d * d, axis=-1), 0.0))
    w = Mat52Coeffs.grad(u5, sig)
    return -jnp.einsum('it,itd,tdy->ity', w, d, Jt)


def _value_tile(Xi, Xt, sig):
    """Energy-energy entries: ``out[i, t] = -k(x_i, x_t)``
    (reference sgdml/train.py:298-300). Shape (I, T)."""
    d = Xi[:, None, :] - Xt[None, :, :]
    u5 = _SQRT5 * jnp.sqrt(jnp.maximum(jnp.sum(d * d, axis=-1), 0.0))
    return -Mat52Coeffs.value(u5, sig)


def _pick_tile(m: int, budget: int) -> int:
    """Largest divisor-ish tile size <= budget (pads otherwise)."""
    return max(1, min(m, budget))


@functools.partial(
    jax.jit,
    static_argnames=('n_atoms', 'desc_perms_key', 'use_E_cstr', 'tile_i', 'tile_j'),
)
def _assemble_jit(
    X,
    Jc,
    sig,
    *,
    n_atoms,
    desc_perms_key,
    use_E_cstr,
    tile_i,
    tile_j,
):
    """Assemble the full (force-force [+ energy-constraint borders]) kernel.

    Tiled double ``lax.scan`` over (row tile, column tile); each step runs
    :func:`hessian_tile` and writes a ``(TI*3N, TJ*3N)`` block with
    ``dynamic_update_slice``. All shapes static; one compilation per
    (M, N, P, tiling) signature.
    """
    desc_perms = np.frombuffer(desc_perms_key[0], dtype=np.int64).reshape(
        desc_perms_key[1]
    )
    m, dim_d = X.shape
    dim_i = 3 * n_atoms
    n_perms = desc_perms.shape[0]
    s_perm = jnp.asarray(perm_incidence(desc_perms, n_atoms), dtype=X.dtype)
    s_id = jnp.asarray(incidence(n_atoms), dtype=X.dtype)
    g_idx_h, sgn_h, a_diag_h, diag_col_h = _gram_maps_cached(
        desc_perms_key, n_atoms
    )
    g_idx = jnp.asarray(g_idx_h)
    sgn = jnp.asarray(sgn_h, dtype=X.dtype)
    a_diag = jnp.asarray(a_diag_h, dtype=X.dtype)
    diag_col = jnp.asarray(diag_col_h)

    Xp, Jcp = perm_tables(X, Jc, desc_perms)  # (M, P, D), (M, P, D, 3)

    n_ti = -(-m // tile_i)
    n_tj = -(-m // tile_j)
    m_pad_i = n_ti * tile_i
    m_pad_j = n_tj * tile_j

    # Zero-padded inputs so every tile has a static shape. Padded rows give
    # garbage blocks that land outside the valid region and are sliced off.
    Xr = jnp.pad(X, ((0, m_pad_i - m), (0, 0)))
    Jcr = jnp.pad(Jc, ((0, m_pad_i - m), (0, 0), (0, 0)))
    Xpc = jnp.pad(Xp, ((0, m_pad_j - m), (0, 0), (0, 0)))
    Jcpc = jnp.pad(Jcp, ((0, m_pad_j - m), (0, 0), (0, 0), (0, 0)))

    n_total = m_pad_i * dim_i if not use_E_cstr else m_pad_i * dim_i + m_pad_i
    n_total_j = m_pad_j * dim_i if not use_E_cstr else m_pad_j * dim_i + m_pad_j
    K0 = jnp.zeros((n_total, n_total_j), dtype=X.dtype)

    if use_E_cstr:
        # Row-side permuted tables and column-side plain tables, padded once.
        Xp_r = jnp.pad(Xp, ((0, m_pad_i - m), (0, 0), (0, 0)))
        Jcp_r = jnp.pad(Jcp, ((0, m_pad_i - m), (0, 0), (0, 0), (0, 0)))
        X_c = jnp.pad(X, ((0, m_pad_j - m), (0, 0)))

    def body(K, idx):
        ti, tj = idx // n_tj, idx % n_tj
        i0 = ti * tile_i
        j0 = tj * tile_j

        Xi = jax.lax.dynamic_slice_in_dim(Xr, i0, tile_i, 0)
        Jci = jax.lax.dynamic_slice_in_dim(Jcr, i0, tile_i, 0)
        Xjp = jax.lax.dynamic_slice_in_dim(Xpc, j0, tile_j, 0)
        Jcjp = jax.lax.dynamic_slice_in_dim(Jcpc, j0, tile_j, 0)

        blk = hessian_tile_compressed(
            Xi, Jci, Xjp, Jcjp, sig, s_id, s_perm, g_idx, sgn, a_diag,
            diag_col,
        )  # (TI, 3N, TJ, 3N), perm-summed
        blk = blk.reshape(tile_i * dim_i, tile_j * dim_i)

        K = jax.lax.dynamic_update_slice(K, blk, (i0 * dim_i, j0 * dim_i))

        if use_E_cstr:
            # Expanded column tables (E-constraint rows only; lower-order).
            Jt = expand_perm_jacobian(Jcjp, s_perm).reshape(
                tile_j * n_perms, dim_d, dim_i
            )
            Xt = Xjp.reshape(tile_j * n_perms, dim_d)
            # Energy rows under force columns: -grad_x k(x_i, x_t)^T J_t.
            fe = _grad_row_tile(Xi, Xt, Jt, sig)  # (TI, TJ*P, 3N)
            fe = fe.reshape(tile_i, tile_j, n_perms, dim_i).sum(axis=2)
            fe = fe.reshape(tile_i, tile_j * dim_i)
            K = jax.lax.dynamic_update_slice(K, fe, (m_pad_i * dim_i + i0, j0 * dim_i))

            # Force rows under energy columns (symmetric counterpart): the
            # column for energy of point j couples to force rows of i via
            # -w(d') d'^T J_i with d' = x_j - x_i^p (perms act on i).
            Xip = jax.lax.dynamic_slice_in_dim(Xp_r, i0, tile_i, 0)
            Jcip = jax.lax.dynamic_slice_in_dim(Jcp_r, i0, tile_i, 0)
            Xj = jax.lax.dynamic_slice_in_dim(X_c, j0, tile_j, 0)
            Jit = expand_perm_jacobian(Jcip, s_perm).reshape(
                tile_i * n_perms, dim_d, dim_i
            )
            Xit = Xip.reshape(tile_i * n_perms, dim_d)
            ef = _grad_row_tile(Xj, Xit, Jit, sig)  # (TJ, TI*P, 3N)
            ef = ef.reshape(tile_j, tile_i, n_perms, dim_i).sum(axis=2)
            ef = ef.transpose(1, 2, 0).reshape(tile_i * dim_i, tile_j)
            K = jax.lax.dynamic_update_slice(K, ef, (i0 * dim_i, m_pad_j * dim_i + j0))

            # Energy-energy block: -sum_p k(x_j, x_i^p).
            ee = _value_tile(Xj, Xit, sig)  # (TJ, TI*P)
            ee = ee.reshape(tile_j, tile_i, n_perms).sum(axis=2).T  # (TI, TJ)
            K = jax.lax.dynamic_update_slice(
                K, ee, (m_pad_i * dim_i + i0, m_pad_j * dim_i + j0)
            )

        return K, None

    K, _ = jax.lax.scan(body, K0, jnp.arange(n_ti * n_tj))

    if m_pad_i != m or m_pad_j != m:
        if use_E_cstr:
            rows = jnp.concatenate(
                [
                    K[: m * dim_i, :],
                    K[m_pad_i * dim_i : m_pad_i * dim_i + m, :],
                ],
                axis=0,
            )
            K = jnp.concatenate(
                [
                    rows[:, : m * dim_i],
                    rows[:, m_pad_j * dim_i : m_pad_j * dim_i + m],
                ],
                axis=1,
            )
        else:
            K = K[: m * dim_i, : m * dim_i]
    return K


def _perms_key(desc_perms: np.ndarray):
    """Hashable static key for a permutation table."""
    arr = np.ascontiguousarray(np.asarray(desc_perms, dtype=np.int64))
    return (arr.tobytes(), arr.shape)


def default_tile_sizes(m: int, n_atoms: int, n_perms: int, dtype_bytes: int = 8):
    """Pick (tile_i, tile_j) so the largest per-tile intermediate of
    :func:`hessian_tile_compressed` stays ~<=64 MB.

    The permutation axis is a scan, so it does not multiply tile memory;
    the per-(i, t) footprint is a few 9N^2 planes plus a few D-vectors.
    """
    dim_d = descriptor_dim_local = (n_atoms * (n_atoms - 1)) // 2
    budget = 64 * 1024**2
    per_pair = (5 * 9 * n_atoms * n_atoms + 8 * dim_d) * dtype_bytes
    pairs = max(1, budget // per_pair)
    tile = max(1, int(math.sqrt(pairs)))
    return min(m, tile), min(m, max(1, pairs // max(tile, 1)))


def assemble_kernel(
    R_desc,
    R_d_desc,
    desc_perms,
    sig,
    n_atoms,
    use_E_cstr: bool = False,
    tile_i: int | None = None,
    tile_j: int | None = None,
):
    """Assemble the full (s)GDML kernel matrix on device.

    Parameters
    ----------
    R_desc: ``(M, D)`` training descriptors.
    R_d_desc: ``(M, D, 3)`` compressed training Jacobians.
    desc_perms: ``(P, D)`` descriptor permutations (host numpy ints).
    sig: kernel length scale. n_atoms: N.
    use_E_cstr: append M energy-constraint rows/columns
        (reference sgdml/train.py:235-300).

    Returns
    -------
    ``(M*3N [+M], M*3N [+M])`` kernel matrix (same sign convention as the
    reference's assembled K, i.e. *before* the solver's global sign flip).
    """
    X = jnp.asarray(R_desc)
    Jc = jnp.asarray(R_d_desc)
    m = X.shape[0]
    n_perms = np.asarray(desc_perms).shape[0]
    if tile_i is None or tile_j is None:
        ti, tj = default_tile_sizes(m, n_atoms, n_perms, X.dtype.itemsize)
        tile_i = tile_i or ti
        tile_j = tile_j or tj
    return _assemble_jit(
        X,
        Jc,
        sig,
        n_atoms=n_atoms,
        desc_perms_key=_perms_key(desc_perms),
        use_E_cstr=use_E_cstr,
        tile_i=int(tile_i),
        tile_j=int(tile_j),
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        'n_atoms', 'desc_perms_key', 'n_row_pts', 'n_col_pts', 'tile_i',
        'tile_j', 'diag', 'mm',
    ),
)
def _assemble_block_jit(
    X, Jc, sig, row_pt0, col_pt0, m_true,
    *, n_atoms, desc_perms_key, n_row_pts, n_col_pts, tile_i, tile_j, diag,
    mm='native',
):
    """One rectangular block of the NEGATED kernel: ``A = -K`` restricted to
    ``rows = row_pt0 : row_pt0 + n_row_pts`` x ``cols = ...`` (point units,
    each point contributing 3N rows/cols). Inputs are padded to the global
    point count; rows/cols of padded points (global index >= m_true) are
    zeroed, and for ``diag`` blocks their diagonal entries are set to 1 so
    the padded system stays SPD.

    Backs the block-grid packed assembly of the mixed-precision analytic
    solvers (assemble_kernel_grid / assemble_kernel_grid_pair); same tile
    math as :func:`_assemble_jit`.
    """
    desc_perms = np.frombuffer(desc_perms_key[0], dtype=np.int64).reshape(
        desc_perms_key[1]
    )
    dim_i = 3 * n_atoms
    n_perms = desc_perms.shape[0]
    s_perm = jnp.asarray(perm_incidence(desc_perms, n_atoms), dtype=X.dtype)
    s_id = jnp.asarray(incidence(n_atoms), dtype=X.dtype)
    g_idx_h, sgn_h, a_diag_h, diag_col_h = _gram_maps_cached(
        desc_perms_key, n_atoms
    )
    g_idx = jnp.asarray(g_idx_h)
    sgn = jnp.asarray(sgn_h, dtype=X.dtype)
    a_diag = jnp.asarray(a_diag_h, dtype=X.dtype)
    diag_col = jnp.asarray(diag_col_h)

    Xp, Jcp = perm_tables(X, Jc, desc_perms)

    n_ti = -(-n_row_pts // tile_i)
    n_tj = -(-n_col_pts // tile_j)
    out = jnp.zeros(
        (n_ti * tile_i * dim_i, n_tj * tile_j * dim_i), dtype=X.dtype
    )

    def body(out, idx):
        ti, tj = idx // n_tj, idx % n_tj
        i0 = row_pt0 + ti * tile_i
        j0 = col_pt0 + tj * tile_j
        Xi = jax.lax.dynamic_slice_in_dim(X, i0, tile_i, 0)
        Jci = jax.lax.dynamic_slice_in_dim(Jc, i0, tile_i, 0)
        Xjp = jax.lax.dynamic_slice_in_dim(Xp, j0, tile_j, 0)
        Jcjp = jax.lax.dynamic_slice_in_dim(Jcp, j0, tile_j, 0)

        blk = hessian_tile_compressed(
            Xi, Jci, Xjp, Jcjp, sig, s_id, s_perm, g_idx, sgn, a_diag,
            diag_col, mm=mm,
        )
        # Negate (A = -K) and zero padded rows/columns.
        row_ok = jnp.repeat(i0 + jnp.arange(tile_i) < m_true, dim_i)
        col_ok = jnp.repeat(j0 + jnp.arange(tile_j) < m_true, dim_i)
        blk = jnp.where(
            row_ok[:, None] & col_ok[None, :],
            -blk.reshape(tile_i * dim_i, tile_j * dim_i),
            0.0,
        )
        return (
            jax.lax.dynamic_update_slice(
                out, blk, (ti * tile_i * dim_i, tj * tile_j * dim_i)
            ),
            None,
        )

    # HIGHEST matmul precision: TPU default f32 dots are bf16 passes
    # (~1e-3 relative) — far below what the f32 preconditioner needs.
    with jax.default_matmul_precision('highest'):
        out, _ = jax.lax.scan(body, out, jnp.arange(n_ti * n_tj))
    out = out[: n_row_pts * dim_i, : n_col_pts * dim_i]

    if diag:
        # Identity on padded diagonal entries keeps the factorization SPD.
        pad_row = jnp.repeat(
            row_pt0 + jnp.arange(n_row_pts) >= m_true, dim_i
        )
        out = out + jnp.diag(pad_row.astype(out.dtype))
    return out


def assemble_kernel_grid(
    R_desc, R_d_desc, desc_perms, sig, n_atoms, spec, dtype=jnp.float32,
    tile_i: int | None = None, tile_j: int | None = None, mm: str = 'native',
):
    """Assemble ``A = -K`` into block-grid packed triangle storage
    (ops/blockchol.py). Every block has the same shape, so exactly ONE
    assembly program compiles regardless of system size. ``spec.b`` must
    be a multiple of ``3 * n_atoms``."""
    dim_i = 3 * n_atoms
    if spec.b % dim_i != 0:
        raise ValueError('grid blocks must be aligned to 3*n_atoms')
    m = R_desc.shape[0]
    m_pad = spec.n // dim_i
    b_pts = spec.b // dim_i
    X = jnp.asarray(R_desc, dtype)
    Jc = jnp.asarray(R_d_desc, dtype)

    n_perms = np.asarray(desc_perms).shape[0]
    if tile_i is None or tile_j is None:
        ti, tj = default_tile_sizes(m_pad, n_atoms, n_perms, X.dtype.itemsize)
        tile_i = tile_i or ti
        tile_j = tile_j or tj
    tile_i = int(min(tile_i, b_pts))
    tile_j = int(min(tile_j, b_pts))

    # Over-pad by one tile: edge tiles may extend past m_pad, where
    # dynamic_slice would clamp the start (wrong rows at the right offset).
    m_padded = m_pad + max(tile_i, tile_j)
    X = jnp.pad(X, ((0, m_padded - m), (0, 0)))
    Jc = jnp.pad(Jc, ((0, m_padded - m), (0, 0), (0, 0)))
    perms_key = _perms_key(desc_perms)

    from .blockchol import sync

    def block(i, j, seq):
        out = _assemble_block_jit(
            X, Jc, sig, i * b_pts, j * b_pts, m,
            n_atoms=n_atoms,
            desc_perms_key=perms_key,
            n_row_pts=b_pts,
            n_col_pts=b_pts,
            tile_i=tile_i,
            tile_j=tile_j,
            diag=(i == j),
            mm=mm,
        )
        # Throttle dispatch every few blocks: each in-flight block
        # program holds its scan scratch, but a host sync is a tunnel
        # round-trip (~0.2 s; a per-block sync dominated assembly time).
        if seq % 8 == 7:
            sync(out)
        return out

    return [
        [block(i, j, i * (i + 1) // 2 + j) for j in range(i + 1)]
        for i in range(spec.k)
    ]


@functools.partial(jax.jit, donate_argnums=(0,))
def _pair_split_blk(x64):
    hi = x64.astype(jnp.float32)
    lo = (x64 - hi.astype(jnp.float64)).astype(jnp.bfloat16)
    return hi, lo


def assemble_kernel_grid_pair(
    R_desc, R_d_desc, desc_perms, sig, n_atoms, spec,
    tile_i=None, tile_j=None, mm: str = 'native',
):
    """Assemble ``A = -K`` straight into pair-float (f32 hi, bf16 lo)
    block-grid storage (ops/pairchol.py) by computing each block in f64
    and splitting it. ~33-bit entries let the pair Cholesky's stability
    shift sit at the pair-storage floor instead of the f32 assembly's
    eps32 entry-noise floor. Emulated-f64 assembly trades one-time
    assembly speed for a several-fold smaller refinement-CG iteration
    count (see solvers/analytic.py ladder)."""
    dim_i = 3 * n_atoms
    if spec.b % dim_i != 0:
        raise ValueError('grid blocks must be aligned to 3*n_atoms')
    m = R_desc.shape[0]
    m_pad = spec.n // dim_i
    b_pts = spec.b // dim_i
    X = jnp.asarray(R_desc, jnp.float64)
    Jc = jnp.asarray(R_d_desc, jnp.float64)

    n_perms = np.asarray(desc_perms).shape[0]
    if tile_i is None or tile_j is None:
        ti, tj = default_tile_sizes(m_pad, n_atoms, n_perms, 8)
        tile_i = tile_i or ti
        tile_j = tile_j or tj
    tile_i = int(min(tile_i, b_pts))
    tile_j = int(min(tile_j, b_pts))

    m_padded = m_pad + max(tile_i, tile_j)
    X = jnp.pad(X, ((0, m_padded - m), (0, 0)))
    Jc = jnp.pad(Jc, ((0, m_padded - m), (0, 0), (0, 0)))
    perms_key = _perms_key(desc_perms)

    from .blockchol import sync

    def block(i, j, seq):
        out = _assemble_block_jit(
            X, Jc, sig, i * b_pts, j * b_pts, m,
            n_atoms=n_atoms,
            desc_perms_key=perms_key,
            n_row_pts=b_pts,
            n_col_pts=b_pts,
            tile_i=tile_i,
            tile_j=tile_j,
            diag=(i == j),
            mm=mm,
        )
        hi, lo = _pair_split_blk(out)
        # Sync every few blocks (round-trip cost; see assemble_kernel_grid).
        if seq % 8 == 7:
            sync(hi)
        return hi, lo

    pairs = [
        [block(i, j, i * (i + 1) // 2 + j) for j in range(i + 1)]
        for i in range(spec.k)
    ]
    Ghi = [[p[0] for p in row] for row in pairs]
    Glo = [[p[1] for p in row] for row in pairs]
    return Ghi, Glo


def column_tables(X, Jc, desc_perms, col_3n_idxs, n_atoms, s_perm):
    """Column-side tables for a force-column subset (traced helper).

    Column ``c = (j, q)``: training point ``j = c // 3N``, partial
    ``q = c % 3N``. Returns ``(Xjp (C, P, D), Jt_col (C, P, D))`` — the
    permuted descriptors of the column points and their permuted Jacobian
    restricted to the single partial q = (atom, xyz) per column, via the
    incidence factorization ``J[d, 3n+y] = s_perm[p,d,n] * Jc[p,d,y]`` —
    materializing the full (C, P, D, 3N) Jacobians first costs 11 GB at
    MD22 scale (measured OOM).
    """
    dim_i = 3 * n_atoms
    Xp, Jcp = perm_tables(X, Jc, desc_perms)
    col_j = col_3n_idxs // dim_i
    col_q = col_3n_idxs % dim_i
    Xjp = Xp[col_j]
    Jcjp = Jcp[col_j]
    atom_q = col_q // 3
    xyz_q = col_q % 3
    s_sel = jnp.take(s_perm, atom_q, axis=2).transpose(2, 0, 1)  # (C, P, D)
    j_sel = jnp.take_along_axis(
        Jcjp, xyz_q[:, None, None, None], axis=3
    ).squeeze(3)  # (C, P, D)
    return Xjp, s_sel * j_sel


def column_force_tile(Xi, Jci, Xjp, Jt_col, s_id, sig):
    """Force-block rows of ``K[:, cols]`` for one row tile (traced helper).

    ``Xi (I, D)`` / ``Jci (I, D, 3)`` are the row-point descriptor tables;
    column tables come from :func:`column_tables`. Returns
    ``(blk (I*3N, C), u5 (I, C, P), cj (I, C, P))`` — the latter two feed
    the optional energy-constraint rows.

    Everything involving the descriptor difference ``d = x_i - x_c^p`` is
    in matmul (norm-expansion) form — ``||d||^2`` via
    ``|x_i|^2 + |x_c^p|^2 - 2 x_i.x_c^p`` and the Jacobian contractions
    split into a self term plus one unbatched ``(C*P, D) x (D, I*3N)``
    MXU matmul — so the ``(I, C, P, D)`` difference tensor never exists.
    The broadcast form staged ~(I, N, C, P, 3N) temporaries that capped
    the row tile at 1-2 rows at production column counts (the
    assembly-time bottleneck of the streamed Nystrom build) and
    compile-OOM'd outright at MD22 M=1000 k=35.
    """
    tile_i, dim_d = Xi.shape
    dim_i = 3 * s_id.shape[1]
    n_cols, n_perms = Xjp.shape[:2]
    Ji = jnp.einsum('dn,idc->idnc', s_id, Jci).reshape(tile_i, dim_d, dim_i)

    Xj_flat = Xjp.reshape(n_cols * n_perms, dim_d)
    Jt_flat = Jt_col.reshape(n_cols * n_perms, dim_d)

    # ||d||^2 and d^T J_t[:, q] by norm expansion (two thin matmuls).
    cross = (Xi @ Xj_flat.T).reshape(tile_i, n_cols, n_perms)
    d2 = (
        jnp.sum(Xi * Xi, axis=-1)[:, None, None]
        + jnp.sum(Xjp * Xjp, axis=-1)[None]
        - 2.0 * cross
    )
    u5 = _SQRT5 * jnp.sqrt(jnp.maximum(d2, 0.0))
    b, cc = Mat52Coeffs.hess(u5, sig)  # (I, C, P)
    cj = (Xi @ Jt_flat.T).reshape(tile_i, n_cols, n_perms) - jnp.sum(
        Xjp * Jt_col, axis=-1
    )[None]

    # a[i,c,p,:] = J_i^T d = (J_i^T x_i) - (J_i^T x_c^p): self term plus
    # one (C*P, D) x (D, I*3N) matmul; g = (J_i^T J_t)[:, q] likewise
    # unbatched. Both stay in (c, p, i, x) layout so the final weighted
    # reductions consume them without a transpose.
    a_self = jnp.einsum('id,idx->ix', Xi, Ji)  # (I, X)
    a_cross = jnp.einsum('cpd,idx->cpix', Xjp, Ji)
    g = jnp.einsum('cpd,idx->cpix', Jt_col, Ji)

    w1 = 5.0 * b * cj  # (I, C, P)
    blk = (
        jnp.einsum('icp,ix->icx', w1, a_self)
        - jnp.einsum('icp,cpix->icx', w1, a_cross)
        - jnp.einsum('icp,cpix->icx', cc, g)
    )
    return blk.transpose(0, 2, 1).reshape(tile_i * dim_i, n_cols), u5, cj


@functools.partial(
    jax.jit,
    static_argnames=('n_atoms', 'desc_perms_key', 'tile_i', 'use_E_cstr'),
)
def _assemble_columns_jit(
    X, Jc, col_3n_idxs, sig, *, n_atoms, desc_perms_key, tile_i,
    use_E_cstr=False,
):
    """Assemble an arbitrary column subset K[:, cols] of the force-force
    kernel (used by the Nystrom preconditioner; reference
    sgdml/train.py:1336-1407 "fancy indexing").

    ``col_3n_idxs`` are flat column indices into the ``(M*3N)`` axis. The
    trick: columns of K are rows of K^T, and K is symmetric, so we assemble
    *rows* ``K[cols_pt_block, :]`` tile-by-tile — but columns may be
    scattered, so instead we compute, for every training point j owning at
    least one requested column, the needed sub-block. For TPU friendliness we
    gather the (point, within-block offset) decomposition on host and batch
    by point.
    """
    desc_perms = np.frombuffer(desc_perms_key[0], dtype=np.int64).reshape(
        desc_perms_key[1]
    )
    m, dim_d = X.shape
    dim_i = 3 * n_atoms
    n_cols = col_3n_idxs.shape[0]
    s_perm = jnp.asarray(perm_incidence(desc_perms, n_atoms), dtype=X.dtype)
    s_id = jnp.asarray(incidence(n_atoms), dtype=X.dtype)

    Xjp, Jt_col = column_tables(X, Jc, desc_perms, col_3n_idxs, n_atoms, s_perm)

    n_ti = -(-m // tile_i)
    m_pad = n_ti * tile_i
    Xr = jnp.pad(X, ((0, m_pad - m), (0, 0)))
    Jcr = jnp.pad(Jc, ((0, m_pad - m), (0, 0), (0, 0)))

    # Preallocate the (row-padded) output and write strips in place — this
    # matrix is the memory high-water mark of the Nystrom build, so avoid
    # the extra full-size copies a stacked-scan formulation would make.
    n_rows_pad = m_pad * dim_i + (m_pad if use_E_cstr else 0)
    K0 = jnp.zeros((n_rows_pad, n_cols), dtype=X.dtype)

    def body(ti, K):
        i0 = ti * tile_i
        Xi = jax.lax.dynamic_slice_in_dim(Xr, i0, tile_i, 0)
        Jci = jax.lax.dynamic_slice_in_dim(Jcr, i0, tile_i, 0)
        blk, u5, cj = column_force_tile(Xi, Jci, Xjp, Jt_col, s_id, sig)
        K = jax.lax.dynamic_update_slice(K, blk, (i0 * dim_i, 0))

        if use_E_cstr:
            # Energy-constraint rows under these force columns:
            # K[E_off + i, (j, q)] = -sum_p w(u) (d^T J_t[:, q])
            # (reference: sgdml/train.py:235-248).
            w = Mat52Coeffs.grad(u5, sig)  # (I, C, P)
            fe = -jnp.einsum('icp,icp->ic', w, cj)  # (I, C)
            K = jax.lax.dynamic_update_slice(K, fe, (m_pad * dim_i + i0, 0))
        return K

    K_cols = jax.lax.fori_loop(0, n_ti, body, K0)
    if m_pad == m:
        return K_cols
    if use_E_cstr:
        return jnp.concatenate(
            [
                K_cols[: m * dim_i],
                K_cols[m_pad * dim_i : m_pad * dim_i + m],
            ],
            axis=0,
        )
    return K_cols[: m * dim_i]


def assemble_kernel_columns(
    R_desc, R_d_desc, desc_perms, sig, n_atoms, col_3n_idxs,
    tile_i: int = 64, use_E_cstr: bool = False,
):
    """K[:, cols] for a flat *force*-column index subset (Nystrom inducing
    columns). With ``use_E_cstr`` the M energy-constraint rows are appended
    (columns remain force columns — a valid PSD preconditioner basis for
    the extended system)."""
    m = R_desc.shape[0]
    n_atoms_i = int(n_atoms)
    n_cols = int(np.asarray(col_3n_idxs).shape[0])
    itemsize = np.dtype(np.asarray(R_desc).dtype).itemsize
    # Matmul-form column_force_tile stages two (C, P, I, 3N) matmul
    # outputs plus ~3 (I, C, 3N)-shaped weighted-reduction temporaries.
    # Cap tile_i so those stay ~1.5 GB (the broadcast form staged
    # (tile_i, N, C, P, 3N): measured 49 GB compile-OOM at N=60, C=540,
    # tile_i=60).
    n_perms = int(np.asarray(desc_perms).shape[0])
    per_row = (2 * n_perms + 3) * n_cols * 3 * n_atoms_i * itemsize
    tile_cap = max(1, int(1.5e9 // max(per_row, 1)))
    tile_i = min(tile_i, m, tile_cap)
    # Prefer a tile size that divides M exactly: padding would force a
    # full-matrix copy at the end (the peak allocation of this routine).
    while m % tile_i != 0 and tile_i > 1:
        tile_i -= 1
    return _assemble_columns_jit(
        jnp.asarray(R_desc),
        jnp.asarray(R_d_desc),
        jnp.asarray(np.asarray(col_3n_idxs, dtype=np.int64)),
        sig,
        n_atoms=n_atoms,
        desc_perms_key=_perms_key(desc_perms),
        tile_i=int(min(tile_i, R_desc.shape[0])),
        use_E_cstr=use_E_cstr,
    )


@functools.partial(
    jax.jit, static_argnames=('n_atoms', 'desc_perms_key', 'tile_i')
)
def _assemble_E_rows_jit(X, Jc, col_3n_idxs, sig, *, n_atoms,
                         desc_perms_key, tile_i):
    """ONLY the M energy-constraint rows of ``K[:, cols]`` (force columns):
    ``K[E_off + i, (j, q)] = -sum_p w(u) (d^T J_t[:, q])`` (reference:
    sgdml/train.py:235-248). The streamed E-constrained factor build uses
    this to border the stack without ever assembling the full
    ``(M*3N + M, k)`` column block — the (M, k) E block is tiny next to
    the force block it replaces.

    Everything is in matmul (norm-expansion) form — ``||x_i - x_c^p||^2 =
    |x_i|^2 + |x_c^p|^2 - 2 x_i.x_c^p`` and ``d^T J_t = x_i.J_t -
    x_c^p.J_t`` — so no ``(I, C, P, D)`` difference tensor ever exists:
    the broadcast form allocates ``tile_i * k * P * D`` f64 (23 GB at
    k=35 inducing points, MD22 M=1000 — measured compile-OOM on a 16 GB
    chip), the matmul form two ``(I, C*P)`` blocks via MXU matmuls."""
    desc_perms = np.frombuffer(desc_perms_key[0], dtype=np.int64).reshape(
        desc_perms_key[1]
    )
    m = X.shape[0]
    s_perm = jnp.asarray(perm_incidence(desc_perms, n_atoms), dtype=X.dtype)
    Xjp, Jt_col = column_tables(X, Jc, desc_perms, col_3n_idxs, n_atoms, s_perm)
    n_cols, n_perms, dim_d = Xjp.shape

    Xj_flat = Xjp.reshape(n_cols * n_perms, dim_d)
    Jt_flat = Jt_col.reshape(n_cols * n_perms, dim_d)
    Xj2 = jnp.sum(Xjp * Xjp, axis=-1)  # (C, P)
    jdot = jnp.sum(Xjp * Jt_col, axis=-1)  # (C, P): x_c^p . J_t[:, q]

    n_ti = -(-m // tile_i)
    m_pad = n_ti * tile_i
    Xr = jnp.pad(X, ((0, m_pad - m), (0, 0)))
    out0 = jnp.zeros((m_pad, n_cols), dtype=X.dtype)

    def body(ti, out):
        i0 = ti * tile_i
        Xi = jax.lax.dynamic_slice_in_dim(Xr, i0, tile_i, 0)
        cross = (Xi @ Xj_flat.T).reshape(tile_i, n_cols, n_perms)
        d2 = jnp.sum(Xi * Xi, axis=-1)[:, None, None] + Xj2[None] - 2 * cross
        u5 = _SQRT5 * jnp.sqrt(jnp.maximum(d2, 0.0))
        w = Mat52Coeffs.grad(u5, sig)  # (I, C, P)
        cj = (Xi @ Jt_flat.T).reshape(tile_i, n_cols, n_perms) - jdot[None]
        fe = -jnp.sum(w * cj, axis=-1)
        return jax.lax.dynamic_update_slice(out, fe, (i0, 0))

    return jax.lax.fori_loop(0, n_ti, body, out0)[:m]


def assemble_kernel_E_rows(
    R_desc, R_d_desc, desc_perms, sig, n_atoms, col_3n_idxs,
    tile_i: int = 64,
):
    """The ``(M, k)`` energy-constraint row block of ``K[:, cols]`` for a
    force-column subset (see :func:`_assemble_E_rows_jit`)."""
    m = R_desc.shape[0]
    return _assemble_E_rows_jit(
        jnp.asarray(R_desc),
        jnp.asarray(R_d_desc),
        jnp.asarray(np.asarray(col_3n_idxs, dtype=np.int64)),
        sig,
        n_atoms=n_atoms,
        desc_perms_key=_perms_key(desc_perms),
        tile_i=int(min(tile_i, m)),
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        'n_atoms', 'desc_perms_key', 'tile_i', 'row_cnt', 'm_real',
        'vary_axis',
    ),
)
def _assemble_columns_range_jit(
    X, Jc, col_3n_idxs, sig, row_p0, *, n_atoms, desc_perms_key, tile_i,
    row_cnt, m_real, vary_axis=None,
):
    """Force rows of ``K[:, cols]`` for the point block
    ``[row_p0, row_p0 + row_cnt)`` only (the streaming Nystrom build's
    chunk primitive — the full (n, k) column block never exists).

    ``row_p0`` is TRACED so every chunk of a streaming sweep shares one
    compiled program (a static start would recompile per chunk — minutes
    each through the remote-compile tunnel). The caller pads ``X``/``Jc``
    so ``row_p0 + row_cnt <= X.shape[0]``; rows of padded points
    (``>= m_real``) are zeroed in-program (their descriptor garbage must
    not reach the Gram).
    """
    desc_perms = np.frombuffer(desc_perms_key[0], dtype=np.int64).reshape(
        desc_perms_key[1]
    )
    dim_i = 3 * n_atoms
    n_cols = col_3n_idxs.shape[0]
    s_perm = jnp.asarray(perm_incidence(desc_perms, n_atoms), dtype=X.dtype)
    s_id = jnp.asarray(incidence(n_atoms), dtype=X.dtype)

    Xjp, Jt_col = column_tables(X, Jc, desc_perms, col_3n_idxs, n_atoms, s_perm)

    n_ti = row_cnt // tile_i
    K0 = jnp.zeros((row_cnt * dim_i, n_cols), dtype=X.dtype)
    if vary_axis is not None:
        # Inside a shard_map with a device-dependent ``row_p0`` the loop
        # carry is device-varying; mark the initial zeros accordingly
        # (same pattern as _assemble_columns_sharded_jit).
        K0 = jax.lax.pcast(K0, vary_axis, to='varying')

    def body(ti, K):
        i0 = row_p0 + ti * tile_i
        Xi = jax.lax.dynamic_slice_in_dim(X, i0, tile_i, 0)
        Jci = jax.lax.dynamic_slice_in_dim(Jc, i0, tile_i, 0)
        blk, _, _ = column_force_tile(Xi, Jci, Xjp, Jt_col, s_id, sig)
        mask = (i0 + jnp.arange(tile_i)) < m_real
        blk = blk * jnp.repeat(mask, dim_i)[:, None].astype(blk.dtype)
        return jax.lax.dynamic_update_slice(K, blk, (ti * tile_i * dim_i, 0))

    return jax.lax.fori_loop(0, n_ti, body, K0)


def assemble_kernel_columns_range(
    X_pad, Jc_pad, desc_perms, sig, n_atoms, col_3n_idxs, row_p0: int,
    row_cnt: int, m_real: int, tile_i: int = 64,
):
    """Force rows ``K[row_p0*3N : (row_p0+row_cnt)*3N, cols]`` of the
    kernel (see :func:`_assemble_columns_range_jit`). ``X_pad``/``Jc_pad``
    are device arrays padded to at least the sweep's last chunk end;
    ``row_cnt`` must be uniform across a sweep so all chunks share one
    compile. Returns ``(row_cnt * 3N, len(cols))``."""
    n_atoms_i = int(n_atoms)
    n_cols = int(np.asarray(col_3n_idxs).shape[0])
    itemsize = np.dtype(np.asarray(X_pad).dtype).itemsize
    # Same staging cap as assemble_kernel_columns (matmul-form
    # column_force_tile: two (C, P, I, 3N) matmul outputs + ~3
    # (I, C, 3N) reduction temporaries).
    n_perms = int(np.asarray(desc_perms).shape[0])
    per_row = (2 * n_perms + 3) * n_cols * 3 * n_atoms_i * itemsize
    tile_cap = max(1, int(1.5e9 // max(per_row, 1)))
    tile_i = min(tile_i, row_cnt, tile_cap)
    while row_cnt % tile_i != 0 and tile_i > 1:
        tile_i -= 1
    return _assemble_columns_range_jit(
        X_pad,
        Jc_pad,
        jnp.asarray(np.asarray(col_3n_idxs, dtype=np.int64)),
        sig,
        jnp.asarray(int(row_p0), dtype=jnp.int32),
        n_atoms=n_atoms,
        desc_perms_key=_perms_key(desc_perms),
        tile_i=int(tile_i),
        row_cnt=int(row_cnt),
        m_real=int(m_real),
    )
