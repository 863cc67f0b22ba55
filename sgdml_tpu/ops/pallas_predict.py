"""Pallas TPU kernel: fused GDML inference contraction.

Fuses the whole per-batch prediction pipeline —

    gram -> distances -> Matern-5/2 coefficient planes -> three
    accumulating matmuls -> (E, F_descriptor)

— into one kernel that streams table tiles through VMEM,
flash-attention-style: the ``(B, T)`` coefficient planes never touch HBM
(the XLA path spills them between matmuls). Grid is (batch tiles x table
tiles) with the table axis as a sequential reduction: outputs revisit the
same block across the minor grid dimension and accumulate in VMEM.

float32 only (the MXU has no f64 mode; the f64 path stays on XLA). Zero
padding is handled naturally: a padded table row has ``x_t = 0`` whose
weights multiply zero Jacobian entries — but ``exp(-u5/sig)`` of a padded
row is NOT zero, so padded rows are masked via a validity plane.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp

try:  # Pallas is optional at import time (CPU test environments).
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PALLAS = True
except ImportError:  # pragma: no cover
    _HAS_PALLAS = False

__all__ = ['pallas_predict_tables', 'HAS_PALLAS']

HAS_PALLAS = _HAS_PALLAS

_SQRT5 = math.sqrt(5.0)


def _kernel(xq_ref, xt_ref, ja_ref, valid_ref, sig_ref, e_ref, f_ref):
    j = pl.program_id(1)

    xq = xq_ref[:]  # (TB, Dp)
    xt = xt_ref[:]  # (TT, Dp)
    ja = ja_ref[:]  # (TT, Dp)
    valid = valid_ref[:]  # (1, TT)
    sig = sig_ref[0, 0]

    @pl.when(j == 0)
    def _():
        e_ref[:] = jnp.zeros_like(e_ref)
        f_ref[:] = jnp.zeros_like(f_ref)

    gram = jnp.dot(xq, xt.T, preferred_element_type=jnp.float32)  # (TB, TT)
    xq_sq = jnp.sum(xq * xq, axis=1, keepdims=True)  # (TB, 1)
    xt_sq = jnp.sum(xt * xt, axis=1, keepdims=True).T  # (1, TT)
    u2 = jnp.maximum(xq_sq - 2.0 * gram + xt_sq, 0.0)
    u5 = _SQRT5 * jnp.sqrt(u2)

    e = jnp.exp(-u5 / sig) * valid  # masked coefficient base
    b1 = (5.0 / (3.0 * sig * sig * sig)) * e
    w2 = b1 * (u5 + sig)

    tja = jnp.sum(xt * ja, axis=1, keepdims=True).T  # (1, TT)
    a = jnp.dot(xq, ja.T, preferred_element_type=jnp.float32) - tja

    e_ref[:] += jnp.sum(a * w2, axis=1, keepdims=True)

    w1 = a * b1 * (5.0 / sig)
    f_acc = jnp.sum(w1, axis=1, keepdims=True) * xq
    f_acc -= jnp.dot(w1, xt, preferred_element_type=jnp.float32)
    f_acc -= jnp.dot(w2, ja, preferred_element_type=jnp.float32)
    f_ref[:] += f_acc


def _round_up(x, m):
    return -(-x // m) * m


@functools.partial(jax.jit, static_argnames=('tile_b', 'tile_t'))
def _pallas_call(Xq, Xt, JA, valid, sig, *, tile_b, tile_t):
    B, Dp = Xq.shape
    T = Xt.shape[0]
    grid = (B // tile_b, T // tile_t)

    e_out, f_out = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_b, Dp), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_t, Dp), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_t, Dp), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_t), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i, j: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((tile_b, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_b, Dp), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, 1), jnp.float32),
            jax.ShapeDtypeStruct((B, Dp), jnp.float32),
        ],
    )(Xq, Xt, JA, valid, sig)
    return e_out[:, 0], f_out


def pallas_predict_tables(
    Xq, Xt, JA, sig, tile_b: int = 256, tile_t: int = 512, interpret=False
):
    """Fused (E_raw, F_descriptor) contraction over permuted tables (f32).

    Xq: ``(B, D)`` query descriptors. Xt/JA: ``(T, D)`` tables.
    Returns the *unscaled* energy accumulator ``(B,)`` and descriptor-space
    force ``(B, D)`` — same semantics as the inner loop of
    :func:`sgdml_tpu.predict.predict_from_tables` (before std/c and the
    Jacobian-transpose map).
    """
    if not _HAS_PALLAS:
        raise RuntimeError('Pallas is not available in this environment.')

    Xq = jnp.asarray(Xq, jnp.float32)
    Xt = jnp.asarray(Xt, jnp.float32)
    JA = jnp.asarray(JA, jnp.float32)

    B, D = Xq.shape
    T = Xt.shape[0]
    Dp = _round_up(D, 128)
    tile_b = min(tile_b, _round_up(B, 8))
    Bp = _round_up(B, tile_b)
    tile_t = min(tile_t, _round_up(T, 8))
    Tp = _round_up(T, tile_t)

    # The kernel is pure f32/i32; global x64 mode would leak i64 index
    # types into the Mosaic lowering (fails to legalize `func.return`).
    x64_off = jax.enable_x64(False)
    x64_off.__enter__()
    try:
        Xq_p = jnp.pad(Xq, ((0, Bp - B), (0, Dp - D)))
        Xt_p = jnp.pad(Xt, ((0, Tp - T), (0, Dp - D)))
        JA_p = jnp.pad(JA, ((0, Tp - T), (0, Dp - D)))
        valid = (jnp.arange(Tp) < T).astype(jnp.float32)[None, :]

        sig_arr = jnp.array([[sig]], dtype=jnp.float32)

        if interpret:
            # Interpreter mode for CPU correctness tests.
            grid = (Bp // tile_b, Tp // tile_t)
            e_out, f_out = pl.pallas_call(
                _kernel,
                grid=grid,
                in_specs=[
                    pl.BlockSpec((tile_b, Dp), lambda i, j: (i, 0)),
                    pl.BlockSpec((tile_t, Dp), lambda i, j: (j, 0)),
                    pl.BlockSpec((tile_t, Dp), lambda i, j: (j, 0)),
                    pl.BlockSpec((1, tile_t), lambda i, j: (0, j)),
                    pl.BlockSpec((1, 1), lambda i, j: (0, 0)),
                ],
                out_specs=[
                    pl.BlockSpec((tile_b, 1), lambda i, j: (i, 0)),
                    pl.BlockSpec((tile_b, Dp), lambda i, j: (i, 0)),
                ],
                out_shape=[
                    jax.ShapeDtypeStruct((Bp, 1), jnp.float32),
                    jax.ShapeDtypeStruct((Bp, Dp), jnp.float32),
                ],
                interpret=True,
            )(Xq_p, Xt_p, JA_p, valid, sig_arr)
            e_out = e_out[:, 0]
        else:
            e_out, f_out = _pallas_call(
                Xq_p, Xt_p, JA_p, valid, sig_arr, tile_b=tile_b, tile_t=tile_t
            )
        return e_out[:B], f_out[:B, :D]
    finally:
        x64_off.__exit__(None, None, None)
