"""Fused Pallas kernel for the dense TSA 3x3 tap attention.

`DenseTemporalSelfAttention` (models/dense_attention.py) computes, per BEV
position q, head h and queue slot n:

    out[q, h*D+d] = (1/nq) * sum_{n, t} attn[q, n, t, h] * v[n, q + tap_t, h*D+d]

i.e. a spatially-varying 3x3 filter over the (prev, current) BEV value grids —
the TPU-dense analogue of the reference TSA's 4-point deformable sampling on
the BEV plane (`temporal_self_attention.py:195-262`, offsets -> static taps).

The XLA formulation (`tap_attention_xla`, identical math to the module's
original 9-iteration shift/einsum loop) re-reads the 41 MB value grid and
round-trips a 41 MB fp32 accumulator through HBM for every tap: ~1 GB of
traffic per layer, measured ~5.5 ms/layer at base scale — the single largest
cost in the dense encoder (tools/bench_encoder_ablate.py).

The kernel (`tap_attention_pallas`) tiles the BEV rows, DMAs each value-grid
tile (+1-row/col halo) into VMEM once, and keeps the fp32 accumulator
on-chip, so HBM traffic drops to one read of v + attn and one write of out
(~75 MB/layer).  Per (queue, tap) the 8 per-head weights are expanded to the
256 channels with a tiny one-hot matmul on the MXU (heads are channel-major:
c = h*D + d), which avoids unsupported lane-interleaved broadcasts.

Backward: the op is linear in v and in attn, so the custom VJP recomputes
shifts in plain XLA (`_tap_attention_bwd`) — used by both implementations'
training paths is the same closed form; the Pallas fwd + XLA bwd pair is
validated against `jax.grad` of the XLA forward in tests/test_tsa_pallas.py.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TSA_TAPS: Tuple[Tuple[int, int], ...] = tuple(
    (dy, dx) for dy in (-1, 0, 1) for dx in (-1, 0, 1))


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _shift2d(x: jax.Array, dy: int, dx: int) -> jax.Array:
    """Zero-padded shift on (..., H, W, C): out[y, x] = in[y - dy, x - dx]."""
    h, w = x.shape[-3], x.shape[-2]
    pads = [(0, 0)] * (x.ndim - 3) + [(1, 1), (1, 1), (0, 0)]
    padded = jnp.pad(x, pads)
    ys, xs = 1 - dy, 1 - dx
    return padded[..., ys: ys + h, xs: xs + w, :]


def tap_attention_xla(vgrid: jax.Array, attn: jax.Array) -> jax.Array:
    """Reference XLA implementation.

    vgrid: (B, nq, H, W, C) value grids (projected).
    attn:  (B, H, W, nq, T, heads) softmaxed tap weights.
    Returns (B, H, W, C) float32 = (1/nq) * sum_{n,t} attn * shifted(v).
    """
    B, nq, H, W, C = vgrid.shape
    heads = attn.shape[-1]
    D = C // heads
    v = vgrid.reshape(B, nq, H, W, heads, D)
    acc = jnp.zeros((B, H, W, heads, D), jnp.float32)
    for t, (dy, dx) in enumerate(TSA_TAPS):
        shifted = _shift2d(v.reshape(B, nq, H, W, C), dy, dx)
        shifted = shifted.reshape(B, nq, H, W, heads, D)
        w_t = attn[:, :, :, :, t, :]                    # (B, H, W, nq, heads)
        acc = acc + jnp.einsum(
            "bnywhd,bywnh->bywhd", shifted, w_t,
            preferred_element_type=jnp.float32)
    return (acc / nq).reshape(B, H, W, C)


def _row_block(h: int, cap: int = 16) -> int:
    """Largest divisor of h that is <= cap (VMEM-bounded tile height)."""
    for rb in range(min(cap, h), 0, -1):
        if h % rb == 0:
            return rb
    return h


def _tap_kernel(attn_ref, vpad_ref, out_ref, vbuf, sem, *, nq, T, heads,
                RB, W, C):
    b = pl.program_id(0)
    i = pl.program_id(1)
    D = C // heads
    dma = pltpu.make_async_copy(
        vpad_ref.at[b, :, pl.ds(i * RB, RB + 2)], vbuf, sem)
    dma.start()

    # one-hot head->channel expansion E[h, c] = (c // D == h), so that
    # (RB*W, heads) @ E == per-head weights broadcast over the head's D
    # channel block (channels are head-major: c = h*D + d)
    hh = jax.lax.broadcasted_iota(jnp.int32, (heads, C), 0)
    cc = jax.lax.broadcasted_iota(jnp.int32, (heads, C), 1)
    E = (cc // D == hh).astype(jnp.float32)

    dma.wait()

    attn = attn_ref[0]                                   # (RB, W, nq*T*heads)
    acc = jnp.zeros((RB, W, C), jnp.float32)
    for n in range(nq):
        for t, (dy, dx) in enumerate(TSA_TAPS):
            off = (n * T + t) * heads
            w8 = attn[:, :, off:off + heads].astype(jnp.float32)
            wc = jax.lax.dot_general(
                w8.reshape(RB * W, heads), E, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).reshape(RB, W, C)
            # out[y, x] sums v[y - dy, x - dx] (tsa taps, _shift2d semantics)
            v = vbuf[n, 1 - dy: 1 - dy + RB, 1 - dx: 1 - dx + W, :]
            acc = acc + v.astype(jnp.float32) * wc
    out_ref[0] = (acc * (1.0 / nq)).astype(out_ref.dtype)


def _tap_attention_fwd_pallas(vgrid: jax.Array, attn: jax.Array) -> jax.Array:
    B, nq, H, W, C = vgrid.shape
    heads = attn.shape[-1]
    T = attn.shape[-2]
    RB = _row_block(H)
    # lane-pack the weights h-minor: c = (n*T + t)*heads + h
    attn_packed = attn.reshape(B, H, W, nq * T * heads).astype(jnp.bfloat16)
    # halo-pad rows/cols by 1; the padded width (the DMA slice's sublane dim)
    # must additionally be 8-aligned for Mosaic's memref slicing
    wp = -(-(W + 2) // 8) * 8
    vpad = jnp.pad(vgrid.astype(jnp.bfloat16),
                   ((0, 0), (0, 0), (1, 1), (1, wp - W - 1), (0, 0)))

    kernel = functools.partial(_tap_kernel, nq=nq, T=T, heads=heads,
                               RB=RB, W=W, C=C)
    return pl.pallas_call(
        kernel,
        grid=(B, H // RB),
        in_specs=[
            pl.BlockSpec((1, RB, W, nq * T * heads),
                         lambda b, i: (b, i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, RB, W, C), lambda b, i: (b, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, W, C), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((nq, RB + 2, wp, C), jnp.bfloat16),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=_interpret(),
    )(attn_packed, vpad)


def _tap_attention_bwd(res, g):
    """Closed-form VJP (the op is bilinear): pure XLA.

    dv[n]      = (1/nq) * sum_t shift_{-t}(expand(attn[..,n,t,:]) * g)
    dattn[...] = (1/nq) * per-head <shift_t(v[n]), g>
    """
    vgrid, attn = res
    B, nq, H, W, C = vgrid.shape
    heads = attn.shape[-1]
    T = attn.shape[-2]
    D = C // heads
    g32 = g.astype(jnp.float32)                          # (B, H, W, C)
    gh = g32.reshape(B, H, W, heads, D)
    dv = jnp.zeros((B, nq, H, W, C), jnp.float32)
    dattn = []
    for t, (dy, dx) in enumerate(TSA_TAPS):
        w_t = attn[:, :, :, :, t, :].astype(jnp.float32)  # (B, H, W, nq, hd)
        # dv: scatter g*w back through the shift (zero-pad drops borders)
        wg = jnp.einsum("bywnh,bywhd->bnywhd", w_t, gh)
        dv = dv + _shift2d(wg.reshape(B, nq, H, W, C), -dy, -dx)
        # dattn: per-head dot of the shifted value with g
        sv = _shift2d(vgrid.astype(jnp.float32), dy, dx)
        sv = sv.reshape(B, nq, H, W, heads, D)
        dattn.append(jnp.einsum("bnywhd,bywhd->bywnh", sv, gh))
    dattn = jnp.stack(dattn, axis=4)                     # (B, H, W, nq, T, hd)
    return ((dv / nq).astype(vgrid.dtype), (dattn / nq).astype(attn.dtype))


@jax.custom_vjp
def tap_attention_pallas(vgrid: jax.Array, attn: jax.Array) -> jax.Array:
    """`tap_attention_xla` semantics with the fused Pallas forward."""
    return _tap_attention_fwd_pallas(vgrid, attn)


def _fwd(vgrid, attn):
    return _tap_attention_fwd_pallas(vgrid, attn), (vgrid, attn)


tap_attention_pallas.defvjp(_fwd, _tap_attention_bwd)


def tap_attention(vgrid: jax.Array, attn: jax.Array,
                  impl: str = "auto") -> jax.Array:
    """Dispatch: "auto" = Pallas on TPU, XLA elsewhere."""
    if impl == "auto":
        impl = "pallas" if jax.default_backend() == "tpu" else "xla"
    if impl == "pallas":
        return tap_attention_pallas(vgrid, attn)
    return tap_attention_xla(vgrid, attn)
