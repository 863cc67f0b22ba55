"""SPMD kernel assembly, prediction and training over a device mesh.

Shardings (1-D mesh, axis ``dev``):

* **Assembly**: kernel *rows* are sharded — each device owns a strip
  ``K[rows_local, :]`` and computes it with the same tile math as the
  single-chip path (``shard_map``; no communication during assembly, the
  column tables are replicated).
* **Prediction / CG matvec**: the query batch is sharded (data parallel);
  permuted tables are replicated. Reductions for CG dot products become
  ``psum`` over ICI, inserted by XLA from the sharding annotations.
* **Distributed solve**: dense CG on the row-sharded kernel strip: the
  matvec ``K @ v`` is a local strip matmul producing the device's rows of
  the result — communication is one all-gather per iteration.

This replaces the reference's multiprocessing pools and
``torch.nn.DataParallel`` scatter/gather (sgdml/train.py:1464-1466,
sgdml/predict.py:376-378) with compiler-scheduled ICI collectives.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..ops import descriptor as desc_ops
from ..ops.kernel import (
    expand_perm_jacobian,
    hessian_tile,
    incidence,
    perm_incidence,
    perm_tables,
)
from ..predict import predict_from_tables

__all__ = [
    'assemble_kernel_sharded',
    'predict_sharded',
    'train_step_sharded',
]


def _pad_rows(a, rows):
    return jnp.pad(a, ((0, rows - a.shape[0]),) + ((0, 0),) * (a.ndim - 1))


def assemble_kernel_sharded(
    R_desc, R_d_desc, desc_perms, sig, n_atoms, mesh: Mesh, tile_j: int = 8
):
    """Row-sharded kernel assembly: returns ``K (M*3N, M*3N)`` with rows
    distributed over the mesh (padded rows trimmed on the host view).

    Each device assembles its row strip against all (replicated, permuted)
    column tables with the single-chip tile kernel — embarrassingly
    parallel, zero communication.
    """
    axis = mesh.axis_names[0]
    n_dev = mesh.shape[axis]
    X = jnp.asarray(R_desc)
    Jc = jnp.asarray(R_d_desc)
    m, dim_d = X.shape
    dim_i = 3 * n_atoms
    dperms = np.asarray(desc_perms)
    n_perms = dperms.shape[0]

    m_pad = -(-m // n_dev) * n_dev
    Xr = _pad_rows(X, m_pad)
    Jcr = _pad_rows(Jc, m_pad)

    Xp, Jcp = perm_tables(X, Jc, dperms)  # (M, P, D): replicated columns
    s_perm = jnp.asarray(perm_incidence(dperms, n_atoms), dtype=X.dtype)
    s_id = jnp.asarray(incidence(n_atoms), dtype=X.dtype)

    n_tj = -(-m // tile_j)
    m_pad_j = n_tj * tile_j
    Xpc = jnp.pad(Xp, ((0, m_pad_j - m), (0, 0), (0, 0)))
    Jcpc = jnp.pad(Jcp, ((0, m_pad_j - m), (0, 0), (0, 0), (0, 0)))

    def strip(X_loc, Jc_loc, Xp_all, Jcp_all):
        m_loc = X_loc.shape[0]
        Ji = jnp.einsum('dn,idc->idnc', s_id, Jc_loc).reshape(
            m_loc, dim_d, dim_i
        )

        def col_tile(carry, tj):
            j0 = tj * tile_j
            Xjp = jax.lax.dynamic_slice_in_dim(Xp_all, j0, tile_j, 0)
            Jcjp = jax.lax.dynamic_slice_in_dim(Jcp_all, j0, tile_j, 0)
            Jt = expand_perm_jacobian(Jcjp, s_perm).reshape(
                tile_j * n_perms, dim_d, dim_i
            )
            Xt = Xjp.reshape(tile_j * n_perms, dim_d)
            blk = hessian_tile(X_loc, Ji, Xt, Jt, sig)
            blk = blk.reshape(m_loc, dim_i, tile_j, n_perms, dim_i).sum(axis=3)
            return carry, blk.reshape(m_loc * dim_i, tile_j * dim_i)

        _, blocks = jax.lax.scan(col_tile, None, jnp.arange(n_tj))
        # blocks: (n_tj, m_loc*3N, tile_j*3N) -> (m_loc*3N, m_pad_j*3N)
        return blocks.transpose(1, 0, 2).reshape(m_loc * dim_i, m_pad_j * dim_i)

    strip_fn = shard_map(
        strip,
        mesh=mesh,
        in_specs=(P(axis), P(axis), P(), P()),
        out_specs=P(axis),
    )
    K = strip_fn(Xr, Jcr, Xpc, Jcpc)
    return K[: m * dim_i, : m * dim_i]


def predict_sharded(
    Xq, Jcq, Xt, JA, sig, std, c, n_atoms: int, mesh: Mesh
):
    """Batch-sharded prediction: queries split over devices, tables
    replicated. Returns replicated (E, F)."""
    axis = mesh.axis_names[0]
    n_dev = mesh.shape[axis]
    B = Xq.shape[0]
    Bp = -(-B // n_dev) * n_dev
    Xq = _pad_rows(jnp.asarray(Xq), Bp)
    Jcq = _pad_rows(jnp.asarray(Jcq), Bp)

    def local(xq, jcq, xt, ja):
        return predict_from_tables(
            xq, jcq, xt, ja, None, sig, std, c, n_atoms=n_atoms
        )

    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(axis), P(axis), P(), P()),
        out_specs=(P(axis), P(axis)),
    )
    E, F = fn(Xq, Jcq, jnp.asarray(Xt), jnp.asarray(JA))
    return E[:B], F[:B]


@functools.partial(
    jax.jit,
    static_argnames=('n_atoms', 'desc_perms_key', 'mesh', 'cg_iters', 'solver'),
)
def _train_step_jit(R, F_labels, sig, lam, *, n_atoms, desc_perms_key, mesh,
                    cg_iters, solver='cg'):
    """One full, jittable, multi-chip training step (for compile-checking
    the sharded pipeline and for small-M production training):

    descriptors -> row-sharded assembly -> dense CG on the sharded strip ->
    alphas + contracted model tables.
    """
    desc_perms = np.frombuffer(desc_perms_key[0], dtype=np.int64).reshape(
        desc_perms_key[1]
    )
    axis = mesh.axis_names[0]
    n_dev = mesh.shape[axis]
    m = R.shape[0]
    dim_i = 3 * n_atoms
    n = m * dim_i

    X, Jc = desc_ops.descriptor_batch(R.reshape(m, -1), n_atoms)

    y = F_labels.reshape(-1)
    y_std = jnp.std(y)
    y = y / y_std

    # Row-sharded assembly (inline, mesh-closed version of
    # assemble_kernel_sharded so the whole step stays in one jit).
    dperms = desc_perms
    n_perms = dperms.shape[0]
    m_pad = -(-m // n_dev) * n_dev
    Xr = _pad_rows(X, m_pad)
    Jcr = _pad_rows(Jc, m_pad)
    Xp, Jcp = perm_tables(X, Jc, dperms)
    s_perm = jnp.asarray(perm_incidence(dperms, n_atoms), dtype=X.dtype)
    s_id = jnp.asarray(incidence(n_atoms), dtype=X.dtype)

    def strip(X_loc, Jc_loc, Xp_all, Jcp_all):
        m_loc = X_loc.shape[0]
        Ji = jnp.einsum('dn,idc->idnc', s_id, Jc_loc).reshape(
            m_loc, X.shape[1], dim_i
        )
        Jt = expand_perm_jacobian(Jcp_all, s_perm).reshape(
            m * n_perms, X.shape[1], dim_i
        )
        Xt = Xp_all.reshape(m * n_perms, X.shape[1])
        blk = hessian_tile(X_loc, Ji, Xt, Jt, sig)
        blk = blk.reshape(m_loc, dim_i, m, n_perms, dim_i).sum(axis=3)
        return blk.reshape(m_loc * dim_i, m * dim_i)

    K = shard_map(
        strip,
        mesh=mesh,
        in_specs=(P(axis), P(axis), P(), P()),
        out_specs=P(axis),
    )(Xr, Jcr, Xp, Jcp)  # (m_pad*3N [row-sharded], n)

    if solver == 'cholesky':
        # Distributed blocked Cholesky on the row-sharded system
        # (-K + lam I); padded rows get an identity extension.
        from ..ops.linalg import cho_solve_blocked

        n_rows = m_pad * dim_i
        A = -K
        diag = jnp.where(jnp.arange(n_rows) < n, lam, 1.0)
        A = A + jnp.diag(diag)
        b_pad = jnp.pad(y, (0, n_rows - n))
        nb = max(dim_i, 8)
        x = cho_solve_blocked(A, b_pad, nb=nb)[:n]
        r = jnp.zeros_like(x)
        alphas = -x
    else:
        # Dense unpreconditioned CG on the row-sharded system
        # A v = (-K + lam I) v. Padded rows contribute zero blocks.
        row_valid = jnp.arange(m_pad * dim_i) < n

        def A_apply(v):
            kv = K @ v  # row-sharded matmul -> (m_pad*3N,)
            kv = jnp.where(row_valid, kv, 0.0)
            return (-kv + lam * jnp.pad(v, (0, m_pad * dim_i - n)))[:n]

        b = y

        def cg_body(i, carry):
            x, r, p, rs = carry
            Ap = A_apply(p)
            alpha = rs / (p @ Ap)
            x = x + alpha * p
            r = r - alpha * Ap
            rs_new = r @ r
            p = r + (rs_new / rs) * p
            return (x, r, p, rs_new)

        x0 = jnp.zeros_like(b)
        x, r, _, _ = jax.lax.fori_loop(0, cg_iters, cg_body, (x0, b, b, b @ b))
        alphas = -x

    R_d_desc_alpha = desc_ops.jac_dot_vec(
        Jc, alphas.reshape(m, dim_i), n_atoms
    )
    return {
        'alphas_F': alphas,
        'std': y_std,
        'R_desc': X,
        'R_d_desc_alpha': R_d_desc_alpha,
        'resid': jnp.linalg.norm(r),
    }


def train_step_sharded(R, F_labels, perms, sig, lam, n_atoms, mesh,
                       cg_iters: int = 100, solver: str = 'cg'):
    """Multi-chip end-to-end training step (host wrapper).

    solver: 'cg' (dense CG on the sharded strip) or 'cholesky'
    (distributed blocked Cholesky, ops/linalg.py).
    """
    dperms = np.stack(
        [desc_ops.perm_to_desc_perm(p) for p in np.asarray(perms)]
    ).astype(np.int64)
    key = (np.ascontiguousarray(dperms).tobytes(), dperms.shape)
    return _train_step_jit(
        jnp.asarray(R),
        jnp.asarray(F_labels),
        sig,
        lam,
        n_atoms=n_atoms,
        desc_perms_key=key,
        mesh=mesh,
        cg_iters=cg_iters,
        solver=solver,
    )
