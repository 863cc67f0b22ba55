"""Block-cyclic (ScaLAPACK-style) distributed Cholesky with shrinking updates.

The mesh factorizations in ``ops/linalg.py`` / ``ops/meshchol.py`` trade
flops for static shapes: every step applies a *masked full-width* rank-nb
update, which keeps one jitted ``fori_loop`` body but performs ~3x the
minimal Cholesky flops (the mask zeroes already-factored rows instead of
shrinking the trailing matrix). This module removes that overhead the
classic dense-HPC way:

* **Python-unrolled steps** — the step index is a trace-time constant, so
  every step slices exactly the trailing submatrix it needs. Shapes stay
  static *per step* (XLA requirement) while shrinking *across* steps:
  total update flops drop from ``n^3`` to the minimal ``n^3/3``.
* **1-D block-cyclic row layout** — with contiguous row sharding a
  shrinking trailing matrix concentrates on the highest devices and the
  rest idle. Assigning logical block-row ``l`` to device ``l % n_dev``
  keeps every device's share of the trailing matrix within one block of
  even at every step, so the per-step work is ``~t_k * nb / n_dev`` on
  each device (ScaLAPACK's 1-D cyclic distribution; the 2-D extension
  would cycle block columns over a second mesh axis).
* **One collective per step** — each device panel-solves its own cyclic
  rows against the broadcast diagonal factor, then a single
  ``all_gather`` of the (masked) local panels provides the columns for
  the local trailing update. The diagonal block is shared by a tiny
  ``psum`` (nb x nb).

The factorization runs inside one ``shard_map`` program; columns are
stored in logical order full-width per device (memory per device is
``8 n^2 / n_dev`` bytes, unchanged from the masked design), rows in
cyclic order. ``cho_solve_cyclic`` returns to logical order for the
O(n^2) triangular solves, which reuse ``ops/linalg.py``.

Reference counterpart: none — the reference solves on one host with
scipy ``cho_factor`` (sgdml/solvers/analytic.py:94-99). This module is
TPU-native upside for the mesh analytic path (VERDICT r2 item 10 /
ROADMAP "block-cyclic balance").
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from . import linalg

__all__ = [
    'cyclic_row_perm',
    'blocked_cholesky_cyclic',
    'cho_solve_cyclic',
]


def cyclic_row_perm(n_blocks: int, nb: int, n_dev: int) -> np.ndarray:
    """Row permutation: storage row -> logical row.

    Storage enumerates (device, slot): device ``d`` holds logical block
    rows ``{d, d + n_dev, d + 2 n_dev, ...}`` in its contiguous shard,
    so a plain ``P(axis)`` row sharding of the permuted matrix IS the
    block-cyclic distribution.
    """
    assert n_blocks % n_dev == 0
    bpd = n_blocks // n_dev
    perm = np.empty(n_blocks * nb, dtype=np.int64)
    q = 0
    for d in range(n_dev):
        for s in range(bpd):
            l = s * n_dev + d
            perm[q * nb:(q + 1) * nb] = np.arange(l * nb, (l + 1) * nb)
            q += 1
    return perm


def _u_start(k: int, n_dev: int) -> int:
    """First local slot any device must process at step ``k`` (the
    minimum over devices of the first slot owning a trailing block)."""
    return max(0, -(-(k + 2 - n_dev) // n_dev))


def _factor_body(A_loc, *, nb: int, n_blocks: int, n_dev: int, axis: str):
    """shard_map body: factor the cyclic-row local strip in place.

    ``A_loc (bpd*nb, n)``: this device's cyclic block rows, columns in
    logical order. Returns the factor strip (logical lower triangle;
    rows above the diagonal zeroed).
    """
    bpd = n_blocks // n_dev
    d_me = jax.lax.axis_index(axis)
    # Logical block index of each local row (cyclic layout).
    loc_block = (jnp.arange(bpd * nb) // nb) * n_dev + d_me

    for k in range(n_blocks):
        d_k = k % n_dev
        s_k = k // n_dev
        c0 = k * nb
        u = _u_start(k, n_dev)
        r0 = u * nb

        # Diagonal block: owner contributes, tiny psum broadcasts.
        cand = A_loc[s_k * nb:(s_k + 1) * nb, c0:c0 + nb]
        Akk = jax.lax.psum(
            jnp.where(d_me == d_k, cand, jnp.zeros_like(cand)), axis
        )
        Lkk = jnp.linalg.cholesky(Akk)

        # Local panel over the (static, <=1-block-ragged) trailing slots.
        trailing = (loc_block >= k + 1)[r0:, None]
        R_loc = A_loc[r0:, c0:c0 + nb]
        P_loc = jax.scipy.linalg.solve_triangular(Lkk, R_loc.T, lower=True).T
        P_loc = jnp.where(trailing, P_loc, 0.0)

        # One collective: gather every device's masked panel.
        P_all = jax.lax.all_gather(P_loc, axis, axis=0, tiled=False)

        # Trailing columns are contiguous in logical storage; assemble
        # their panel blocks in logical order from the gathered array.
        if k + 1 < n_blocks:
            chunks = []
            for l in range(k + 1, n_blocks):
                d_l, s_l = l % n_dev, l // n_dev
                chunks.append(P_all[d_l, (s_l - u) * nb:(s_l - u + 1) * nb])
            S_t = jnp.concatenate(chunks, axis=0)  # (t_k, nb)
            # Shrinking rank-nb update: local trailing rows x trailing cols.
            A_loc = A_loc.at[r0:, (k + 1) * nb:].add(-(P_loc @ S_t.T))

        # Write the factored block column (zeros above the diagonal).
        col = jnp.zeros((bpd * nb, nb), A_loc.dtype).at[r0:].set(P_loc)
        diag = jnp.zeros((bpd * nb, nb), A_loc.dtype)
        diag = diag.at[s_k * nb:(s_k + 1) * nb].set(Lkk)
        col = jnp.where((loc_block == k)[:, None], diag, col)
        A_loc = A_loc.at[:, c0:c0 + nb].set(col)

    return A_loc


def blocked_cholesky_cyclic(A, nb: int, mesh: Mesh):
    """Lower Cholesky factor of SPD ``A (n, n)`` on a 1-D mesh.

    ``n`` must be a multiple of ``nb * n_dev`` (use ``cho_solve_cyclic``
    for automatic identity padding). Returns ``L`` in LOGICAL row order,
    row-sharded over the mesh; accuracy is that of the unblocked
    factorization (the update arithmetic is plain f64 GEMM).
    """
    n = A.shape[0]
    axis = mesh.axis_names[0]
    n_dev = mesh.devices.size
    assert n % nb == 0 and (n // nb) % n_dev == 0, (
        'n=%d must tile into nb=%d blocks divisible over %d devices'
        % (n, nb, n_dev)
    )
    n_blocks = n // nb
    perm = cyclic_row_perm(n_blocks, nb, n_dev)

    A_cyc = jax.device_put(
        jnp.asarray(A)[perm], NamedSharding(mesh, P(axis))
    )
    fn = shard_map(
        functools.partial(
            _factor_body, nb=nb, n_blocks=n_blocks, n_dev=n_dev, axis=axis
        ),
        mesh=mesh, in_specs=P(axis), out_specs=P(axis),
    )
    L_cyc = jax.jit(fn)(A_cyc)
    # Back to logical row order (one gather; O(n^2) data movement).
    inv = np.argsort(perm)
    return jnp.take(L_cyc, inv, axis=0)


def cho_solve_cyclic(A, b, nb: int, mesh: Mesh):
    """Solve SPD ``A x = b`` via the block-cyclic factorization.

    Pads with an identity extension to a multiple of ``nb * n_dev``; the
    O(n^2) triangular solves reuse the blocked substitution kernels.
    """
    n = A.shape[0]
    n_dev = mesh.devices.size
    tile = nb * n_dev
    n_pad = -(-n // tile) * tile
    if n_pad != n:
        A = jnp.pad(A, ((0, n_pad - n), (0, n_pad - n)))
        A = A.at[jnp.arange(n, n_pad), jnp.arange(n, n_pad)].set(1.0)
        b = jnp.pad(b, ((0, n_pad - n),) + ((0, 0),) * (b.ndim - 1))
    L = blocked_cholesky_cyclic(A, nb, mesh)
    y = linalg.blocked_tri_solve(L, b, nb, trans=False)
    x = linalg.blocked_tri_solve(L, y, nb, trans=True)
    return x[:n]
