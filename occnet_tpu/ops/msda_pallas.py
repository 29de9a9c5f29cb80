"""Fused Pallas TPU kernel for multi-scale deformable attention sampling.

The TPU-native equivalent of mmcv's `ms_deform_attn` CUDA kernel
(`modules/multi_scale_deformable_attn_function.py:10-12`, called from
`spatial_cross_attention.py:386-396`), with the same contract as
`ops/msda.multi_scale_deformable_attention` (the XLA patch-table
formulation) and the torch `grid_sample` oracle in tests.

Design (see BASELINE.md "XLA gather" facts): sampling is gather-rate-bound,
so the kernel keeps each pyramid level's (hw, D) value slice resident in
VMEM and fetches the four bilinear corners of a sample as TWO 2-row dynamic
slabs — rows (y, x), (y, x+1) are adjacent in the row-major flattening, so
one sublane-dynamic load covers both x-corners of each y-row.  Corner
weights (bilinear x attention, border-clamp remapped by
`msda._packed_axis_weights`) are scalar-prefetched per sample and applied on
the VPU; the per-query accumulator never leaves registers during the
unrolled P-sample inner loop.

Backward: `jax.custom_vjp` delegating to the XLA formulation's VJP — both
paths compute the identical function, so gradients are exact while the
kernel stays forward-only (eval/serving is where exact mode must be fast;
training uses the turbo encoder).
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from occnet_tpu.ops.msda import (
    _packed_axis_weights,
    multi_scale_deformable_attention,
)

def _blkq(P: int) -> int:
    """Queries per grid step.  Mosaic tiles 1-D 32-bit SMEM refs at 1024
    elements, so the per-block scalar streams (BLKQ*P slots) must be
    1024-aligned."""
    import math
    return math.lcm(1024, P) // P


def _interpret() -> bool:
    """Compiled on TPU backends (incl. the axon tunnel); interpreter mode
    elsewhere (the CPU test mesh)."""
    return jax.default_backend() not in ("tpu", "axon")


# max hw rows whose (hw, D<=32) f32 slice stays VMEM-resident double-buffered
# (lane padding makes a row cost 128 lanes x 4 B regardless of D)
_VMEM_ROW_BUDGET = 14336


def _sample_level_xla(value_l, bt, w4, w: int):
    """Patch-table gather for one level (see ops/msda.py): used for levels
    too large for VMEM residency.  value_l (BH, hw, D); bt (BH, Qp, P)
    packed-window base indices; w4 (BH, Qp, P, 4) combined weights."""
    BH, hw, D = value_l.shape
    table = jnp.concatenate(
        [value_l, jnp.roll(value_l, -1, axis=1),
         jnp.roll(value_l, -w, axis=1),
         jnp.roll(value_l, -(w + 1), axis=1)], axis=-1)   # (BH, hw, 4D)
    Qp, P = bt.shape[1], bt.shape[2]
    g = jnp.take_along_axis(table, bt.reshape(BH, Qp * P)[..., None], axis=1)
    g = g.reshape(BH, Qp, P, 4, D)
    return (g * w4[..., None]).sum(axis=(2, 3))


def _level_kernel(P: int, blkq: int):
    def kernel(bt_ref, bb_ref, w_ref, val_ref, out_ref):
        D = out_ref.shape[-1]

        def body(q, _):
            acc = jnp.zeros((1, D), jnp.float32)
            for p in range(P):
                i = q * P + p
                top = val_ref[0, pl.ds(bt_ref[i], 2), :]
                bot = val_ref[0, pl.ds(bb_ref[i], 2), :]
                acc = (acc
                       + w_ref[4 * i] * top[0:1, :]
                       + w_ref[4 * i + 1] * top[1:2, :]
                       + w_ref[4 * i + 2] * bot[0:1, :]
                       + w_ref[4 * i + 3] * bot[1:2, :])
            out_ref[q, :] = acc[0]
            return 0

        jax.lax.fori_loop(0, blkq, body, 0)

    return kernel


def _sample_level(value_l, bt, bb, w4, P: int):
    """value_l (BH, hw, D) f32; bt/bb (BH, Qp, P) int32 slab bases;
    w4 (BH, Qp, P, 4) f32 combined corner weights -> (BH, Qp, D) f32.

    Flat 1-D grid over (BH x query-blocks): Mosaic requires SMEM blocks to
    be 1-D (or tile-aligned), so the scalar streams are flattened and the
    value slice is selected via integer division in the index map."""
    BH, hw, D = value_l.shape
    Qp = bt.shape[1]
    BLKQ = _blkq(P)
    nq = Qp // BLKQ
    out = pl.pallas_call(
        _level_kernel(P, BLKQ),
        out_shape=jax.ShapeDtypeStruct((BH * Qp, D), jnp.float32),
        grid=(BH * nq,),
        in_specs=[
            pl.BlockSpec((BLKQ * P,), lambda i: (i,),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((BLKQ * P,), lambda i: (i,),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((BLKQ * P * 4,), lambda i: (i,),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, hw, D), lambda i: (i // nq, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((BLKQ, D), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=_interpret(),
    )(bt.reshape(-1), bb.reshape(-1), w4.reshape(-1), value_l)
    return out.reshape(BH, Qp, D)


def _forward(value, spatial_shapes, sampling_locations, attention_weights):
    B, V, H, D = value.shape
    Bq, Q, Hh, L, P, _ = sampling_locations.shape
    assert H == Hh and L == len(spatial_shapes)
    assert sum(h * w for h, w in spatial_shapes) == V
    assert all(h >= 2 and w >= 2 for h, w in spatial_shapes), (
        "degenerate (<2 cell) pyramid levels are not supported by the "
        "fused kernel; use ops.msda at toy shapes")

    BH = B * H
    value_hm = jnp.transpose(value, (0, 2, 1, 3)).reshape(BH, V, D)
    value_hm = value_hm.astype(jnp.float32)
    loc_hm = jnp.transpose(sampling_locations, (0, 2, 1, 3, 4, 5)).reshape(
        BH, Q, L, P, 2).astype(jnp.float32)
    attn_hm = jnp.transpose(attention_weights, (0, 2, 1, 3, 4)).reshape(
        BH, Q, L, P).astype(jnp.float32)

    Qp = -(-Q // _blkq(P)) * _blkq(P)
    pad = Qp - Q
    if pad:
        loc_hm = jnp.pad(loc_hm, ((0, 0), (0, pad), (0, 0), (0, 0), (0, 0)))
        attn_hm = jnp.pad(attn_hm, ((0, 0), (0, pad), (0, 0), (0, 0)))

    out = jnp.zeros((BH, Qp, D), jnp.float32)
    start = 0
    for lvl, (h, w) in enumerate(spatial_shapes):
        value_l = jax.lax.dynamic_slice_in_dim(value_hm, start, h * w,
                                               axis=1)
        start += h * w
        ll = loc_hm[:, :, lvl]                           # (BH, Qp, P, 2)
        x = ll[..., 0] * w - 0.5
        y = ll[..., 1] * h - 0.5
        x0 = jnp.floor(x)
        y0 = jnp.floor(y)
        bx, wx0, wx1 = _packed_axis_weights(x0.astype(jnp.int32), x - x0, w)
        by, wy0, wy1 = _packed_axis_weights(y0.astype(jnp.int32), y - y0, h)
        bt = by * w + bx
        bb = bt + w
        a = attn_hm[:, :, lvl]
        w4 = jnp.stack([wy0 * wx0, wy0 * wx1, wy1 * wx0, wy1 * wx1],
                       axis=-1) * a[..., None]           # (BH, Qp, P, 4)
        if h * w > _VMEM_ROW_BUDGET:
            # level too big for VMEM residency (the (hw, 32) f32 slice pads
            # to 128 lanes): use the patch-table XLA gather for this level
            out = out + _sample_level_xla(value_l, bt, w4, w)
        else:
            out = out + _sample_level(value_l, bt, bb, w4, P)

    out = out[:, :Q]
    out = jnp.transpose(out.reshape(B, H, Q, D), (0, 2, 1, 3))
    return out.reshape(B, Q, H * D).astype(value.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def _msda_pallas(value, spatial_shapes, sampling_locations,
                 attention_weights):
    return _forward(value, spatial_shapes, sampling_locations,
                    attention_weights)


def _fwd(value, spatial_shapes, sampling_locations, attention_weights):
    out = _forward(value, spatial_shapes, sampling_locations,
                   attention_weights)
    return out, (value, sampling_locations, attention_weights)


def _bwd(spatial_shapes, residuals, g):
    value, loc, attn = residuals
    _, vjp = jax.vjp(
        lambda v, l, a: multi_scale_deformable_attention(
            v, spatial_shapes, l, a), value, loc, attn)
    return vjp(g)


_msda_pallas.defvjp(_fwd, _bwd)


def multi_scale_deformable_attention_pallas(
    value: jax.Array,                    # (B, V, H, D) flattened pyramid
    spatial_shapes: Sequence[Tuple[int, int]],
    sampling_locations: jax.Array,       # (B, Q, H, L, P, 2) in [0,1]
    attention_weights: jax.Array,        # (B, Q, H, L, P)
) -> jax.Array:                          # (B, Q, H*D)
    """Fused Pallas deformable-attention sampling (contract identical to
    `msda.multi_scale_deformable_attention`); differentiable via a
    custom VJP that reuses the XLA formulation's exact gradients.
    Degenerate (<2 cell) pyramid levels — toy test shapes — fall back to
    the XLA formulation entirely."""
    shapes = tuple((int(h), int(w)) for h, w in spatial_shapes)
    if any(h < 2 or w < 2 for h, w in shapes):
        return multi_scale_deformable_attention(
            value, shapes, sampling_locations, attention_weights)
    return _msda_pallas(value, shapes, sampling_locations,
                        attention_weights)
