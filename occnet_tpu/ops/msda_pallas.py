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
import os
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
# (lane padding makes a row cost 128 lanes x 4 B regardless of D).  bf16
# values halve the row cost, doubling the budget — enough for the base-scale
# level-0 map (116x200 = 23,200 rows), so a bf16 model runs every pyramid
# level through the fused kernel with no XLA fallback.
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


def _level_kernel(P: int, blkq: int, w: int, unroll: int = 4):
    """Two-slab kernel: per sample, rows (y, x..x+1) and (y+1, x..x+1) are
    fetched as two 2-row dynamic slabs and weighted with 4 scalar FMAs.  The
    bottom base is computed in-kernel (bt + w), saving an SMEM stream, and
    `unroll` queries share one loop iteration.

    Measured alternatives that LOST to this form at base-scale shapes (v5e):
    a corner-packed `[v, roll(v,-w)]` table with one (2, 2D) load/sample
    (1.68 s vs 1.23 s in-model — the kernel is VPU-issue-bound on the
    (2, 2D) one-hot weighting, not load-bound) and the bf16 16-row aligned
    kernel (2.23 s, see _level_kernel_aligned)."""
    unroll = min(unroll, blkq)   # blkq is a power of two, so this divides

    def kernel(bt_ref, w_ref, val_ref, out_ref):
        D = out_ref.shape[-1]

        def one(q):
            # two independent accumulator chains (top-row vs bottom-row
            # corners) halve the serial FMA dependency depth per query
            acc_t = jnp.zeros((1, D), jnp.float32)
            acc_b = jnp.zeros((1, D), jnp.float32)
            for p in range(P):
                i = q * P + p
                bt = bt_ref[i]
                top = val_ref[0, pl.ds(bt, 2), :]
                bot = val_ref[0, pl.ds(bt + w, 2), :]
                acc_t = (acc_t + w_ref[4 * i] * top[0:1, :]
                         + w_ref[4 * i + 1] * top[1:2, :])
                acc_b = (acc_b + w_ref[4 * i + 2] * bot[0:1, :]
                         + w_ref[4 * i + 3] * bot[1:2, :])
            out_ref[q, :] = acc_t[0] + acc_b[0]

        def body(qu, _):
            for u in range(unroll):
                one(qu * unroll + u)
            return 0

        jax.lax.fori_loop(0, blkq // unroll, body, 0)

    return kernel


def _level_kernel_aligned(P: int, blkq: int):
    """bf16 variant: Mosaic requires dynamic sublane offsets on (16, 128)-
    tiled bf16 to be provable multiples of 8, so each 2-row slab is fetched
    as an 8-aligned 16-row block and the two live rows are selected with a
    one-hot sublane weight vector.  The weighted blocks accumulate into a
    (16, D) register tile; the cross-sublane reduction happens ONCE per
    query, outside the P-sample loop."""
    def kernel(bt_ref, bb_ref, w_ref, val_ref, out_ref):
        D = out_ref.shape[-1]
        iota = jax.lax.broadcasted_iota(jnp.int32, (16, D), 0)

        def body(q, _):
            acc = jnp.zeros((16, D), jnp.float32)
            for p in range(P):
                i = q * P + p
                bt = bt_ref[i]
                bb = bb_ref[i]
                at = pl.multiple_of((bt // 8) * 8, 8)
                ab = pl.multiple_of((bb // 8) * 8, 8)
                top = val_ref[0, pl.ds(at, 16), :].astype(jnp.float32)
                bot = val_ref[0, pl.ds(ab, 16), :].astype(jnp.float32)
                rt = bt - at
                rb = bb - ab
                wt = (jnp.where(iota == rt, w_ref[4 * i], 0.0)
                      + jnp.where(iota == rt + 1, w_ref[4 * i + 1], 0.0))
                wb = (jnp.where(iota == rb, w_ref[4 * i + 2], 0.0)
                      + jnp.where(iota == rb + 1, w_ref[4 * i + 3], 0.0))
                acc = acc + top * wt + bot * wb
            out_ref[q, :] = jnp.sum(acc, axis=0)
            return 0

        jax.lax.fori_loop(0, blkq, body, 0)

    return kernel


def _level_kernel_banded(P: int, blkq: int, lo: int, hi: int, w: int):
    """f32 band kernel for levels too large for full VMEM residency: the
    value block holds rows [lo, lo + Rb) and only samples whose slab base
    falls in [lo, hi) load-and-accumulate (pl.when skips the rest), so the
    total load count across bands equals the single-band kernel's.  The
    accumulator lives in a VMEM scratch because the guarded adds are
    stateful."""
    def kernel(bt_ref, bb_ref, w_ref, val_ref, out_ref, acc_ref):
        D = out_ref.shape[-1]

        def body(q, _):
            acc_ref[0, :] = jnp.zeros((D,), jnp.float32)
            for p in range(P):
                i = q * P + p
                bt = bt_ref[i]

                @pl.when((bt >= lo) & (bt < hi))
                def _():
                    rel = bt - lo
                    top = val_ref[0, pl.ds(rel, 2), :]
                    bot = val_ref[0, pl.ds(rel + w, 2), :]
                    acc_ref[0, :] += (w_ref[4 * i] * top[0, :]
                                      + w_ref[4 * i + 1] * top[1, :]
                                      + w_ref[4 * i + 2] * bot[0, :]
                                      + w_ref[4 * i + 3] * bot[1, :])
            out_ref[q, :] = acc_ref[0, :]
            return 0

        jax.lax.fori_loop(0, blkq, body, 0)

    return kernel


def _sample_level_banded(value_l, bt, bb, w4, P: int, w: int):
    """Row-banded fused sampling for levels whose (hw, D) f32 slice exceeds
    the VMEM budget (base-scale level 0 is 23,200 rows): split the row space
    into bands of `payload` slab bases, run the band kernel per band with a
    [lo, lo + budget) value window, and sum the partial outputs.  Slab bases
    never exceed hw - w - 2 (`_packed_axis_weights` clamps), so `nb` bands
    of payload = budget - w - 2 rows cover every sample exactly once."""
    BH, hw, D = value_l.shape
    Qp = bt.shape[1]
    BLKQ = _blkq(P)
    nq = Qp // BLKQ
    Rb = _VMEM_ROW_BUDGET
    payload = Rb - w - 2
    base_max = hw - w - 2
    nb = -(-(base_max + 1) // payload)
    pad_to = (nb - 1) * payload + Rb
    value_l = jnp.pad(value_l, ((0, 0), (0, pad_to - hw), (0, 0)))

    btf = bt.reshape(-1)
    bbf = bb.reshape(-1)
    w4f = w4.reshape(-1)
    out = None
    for k in range(nb):
        lo = k * payload
        hi = min(lo + payload, base_max + 1)
        band_val = jax.lax.slice_in_dim(value_l, lo, lo + Rb, axis=1)
        part = pl.pallas_call(
            _level_kernel_banded(P, BLKQ, lo, hi, w),
            out_shape=jax.ShapeDtypeStruct((BH * Qp, D), jnp.float32),
            grid=(BH * nq,),
            in_specs=[
                pl.BlockSpec((BLKQ * P,), lambda i: (i,),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((BLKQ * P,), lambda i: (i,),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((BLKQ * P * 4,), lambda i: (i,),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, Rb, D), lambda i: (i // nq, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((BLKQ, D), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((1, D), jnp.float32)],
            interpret=_interpret(),
        )(btf, bbf, w4f, band_val)
        out = part if out is None else out + part
    return out.reshape(BH, Qp, D)


def _sample_level(value_l, bt, bb, w4, P: int, w: int):
    """value_l (BH, hw, D); bt/bb (BH, Qp, P) int32 slab bases;
    w4 (BH, Qp, P, 4) f32 combined corner weights -> (BH, Qp, D) f32.

    Flat 1-D grid over (BH x query-blocks): Mosaic requires SMEM blocks to
    be 1-D (or tile-aligned), so the scalar streams are flattened and the
    value slice is selected via integer division in the index map."""
    BH, hw, D = value_l.shape
    Qp = bt.shape[1]
    BLKQ = _blkq(P)
    nq = Qp // BLKQ
    if value_l.dtype == jnp.bfloat16:
        # aligned-block kernel: pad rows so the 16-row fetch at the largest
        # 8-aligned base (max slab base is hw - w - 2) stays in bounds
        kernel = _level_kernel_aligned(P, BLKQ)
        hw_pad = -(-(hw + 16) // 16) * 16
        value_l = jnp.pad(value_l, ((0, 0), (0, hw_pad - hw), (0, 0)))
        hw = hw_pad
        args = (bt.reshape(-1), bb.reshape(-1), w4.reshape(-1), value_l)
        n_scalar = 3
        width = D
    else:
        kernel = _level_kernel(P, BLKQ, w)
        value_l = value_l.astype(jnp.float32)
        args = (bt.reshape(-1), w4.reshape(-1), value_l)
        n_scalar = 2
        width = D
    scalar_specs = [
        pl.BlockSpec((BLKQ * P,), lambda i: (i,), memory_space=pltpu.SMEM),
        pl.BlockSpec((BLKQ * P,), lambda i: (i,), memory_space=pltpu.SMEM),
        pl.BlockSpec((BLKQ * P * 4,), lambda i: (i,),
                     memory_space=pltpu.SMEM),
    ][3 - n_scalar:]
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((BH * Qp, D), jnp.float32),
        grid=(BH * nq,),
        in_specs=scalar_specs + [
            pl.BlockSpec((1, hw, width), lambda i: (i // nq, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((BLKQ, D), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=_interpret(),
    )(*args)
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
    # bf16 VMEM residency (opt-in): lossless for a bf16 model and doubles the
    # row budget so even level 0 fuses — but Mosaic's 8-row alignment rule
    # for bf16 forces 16-row fetches + one-hot row selection
    # (_level_kernel_aligned), measured ~1.5x slower per sample than the f32
    # 2-row kernel; in-model the f32 kernel + XLA level-0 mix wins, so f32
    # stays the default.
    use_bf16 = (value.dtype == jnp.bfloat16
                and os.environ.get("OCCNET_MSDA_BF16_VMEM") == "1")
    kern_dtype = jnp.bfloat16 if use_bf16 else jnp.float32
    row_budget = _VMEM_ROW_BUDGET * (4 // jnp.dtype(kern_dtype).itemsize)
    value_hm = value_hm.astype(kern_dtype)
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
        if h * w > row_budget:
            # level too big for full VMEM residency (the (hw, 32) slice pads
            # to 128 lanes): patch-table XLA gather (default — measured
            # faster at base shapes) or the row-banded kernel via
            # OCCNET_MSDA_LEVEL0=banded
            if os.environ.get("OCCNET_MSDA_LEVEL0", "xla") == "banded":
                out = out + _sample_level_banded(
                    value_l.astype(jnp.float32), bt, bb, w4, P, w)
            else:
                out = out + _sample_level_xla(value_l.astype(jnp.float32),
                                              bt, w4, w)
        else:
            out = out + _sample_level(value_l, bt, bb, w4, P, w)

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
    # query-chunked + rematerialised: the delegated XLA backward would
    # otherwise materialise the full (BH, Q*P, 4D) gather temporaries per
    # layer and OOM at base-scale training shapes
    _, vjp = jax.vjp(
        lambda v, l, a: multi_scale_deformable_attention(
            v, spatial_shapes, l, a, query_chunk=4096), value, loc, attn)
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
