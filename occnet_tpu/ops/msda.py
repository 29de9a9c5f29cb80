"""Multi-scale deformable attention sampling — the TPU-native equivalent of
mmcv's `ms_deform_attn_forward/backward` CUDA kernel.

The reference invokes that kernel from spatial cross-attention
(`spatial_cross_attention.py:386-393`), temporal self-attention
(`temporal_self_attention.py:240-253`) and the (unused) detection decoder; a
pure-PyTorch fallback (`multi_scale_deformable_attn_pytorch`, grid_sample with
bilinear / zeros-padding / align_corners=False) defines the semantics we match
here.  This module is the XLA formulation: vectorised corner gathers via
`take_along_axis` + bilinear weights, fused by XLA.  Backward comes from JAX AD
over the gather graph (gather grad = scatter-add, matching the CUDA kernel's
atomicAdd accumulation semantics deterministically).

A Pallas kernel with the same signature lives in `ops/msda_pallas.py`; both are
cross-checked against a torch `grid_sample` oracle in tests.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp


def bilinear_sample(
    value: jax.Array,       # (B, H, h*w, D)  per-level value, head-major
    h: int,
    w: int,
    loc: jax.Array,         # (B, H, N, 2)    normalised [0,1] xy sample points
) -> jax.Array:             # (B, H, N, D)
    """Bilinear sampling with grid_sample(align_corners=False, padding_mode=
    'zeros') semantics: pixel centres at (i + 0.5)/extent; out-of-bounds
    corners contribute zero."""
    compute_dtype = value.dtype
    loc = loc.astype(jnp.float32)
    x = loc[..., 0] * w - 0.5          # (B, H, N)
    y = loc[..., 1] * h - 0.5

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    tx = (x - x0)                       # fractional weights, fp32
    ty = (y - y0)
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    out = None
    for dy, dx in ((0, 0), (0, 1), (1, 0), (1, 1)):
        cx = x0i + dx
        cy = y0i + dy
        wgt = (tx if dx else (1.0 - tx)) * (ty if dy else (1.0 - ty))
        valid = (cx >= 0) & (cx < w) & (cy >= 0) & (cy < h)
        idx = jnp.clip(cy, 0, h - 1) * w + jnp.clip(cx, 0, w - 1)
        gathered = jnp.take_along_axis(value, idx[..., None], axis=2)
        corner = gathered * (wgt * valid).astype(compute_dtype)[..., None]
        out = corner if out is None else out + corner
    return out


def multi_scale_deformable_attention(
    value: jax.Array,                    # (B, V, H, D) flattened level pyramid
    spatial_shapes: Sequence[Tuple[int, int]],   # static [(h, w), ...]
    sampling_locations: jax.Array,       # (B, Q, H, L, P, 2) in [0,1]
    attention_weights: jax.Array,        # (B, Q, H, L, P) softmaxed over L*P
) -> jax.Array:                          # (B, Q, H*D)
    """Deformable attention core: for every (query, head) sample P points per
    level bilinearly from the value pyramid and reduce with attention weights.

    Matches mmcv `multi_scale_deformable_attn_pytorch` (the reference's CPU
    oracle for its CUDA kernel, `spatial_cross_attention.py:394-396`).
    """
    B, V, H, D = value.shape
    Bq, Q, Hh, L, P, _ = sampling_locations.shape
    assert H == Hh and L == len(spatial_shapes)
    assert sum(h * w for h, w in spatial_shapes) == V, (
        f"value length {V} != sum of {spatial_shapes}")

    value_hm = jnp.transpose(value, (0, 2, 1, 3))          # (B, H, V, D)
    # (B, H, Q, L, P, 2) then per-level (B, H, Q*P, 2)
    loc_hm = jnp.transpose(sampling_locations, (0, 2, 1, 3, 4, 5))
    w_hm = jnp.transpose(attention_weights, (0, 2, 1, 3, 4))   # (B, H, Q, L, P)
    w_hm = w_hm.astype(value.dtype)

    out = jnp.zeros((B, H, Q, D), dtype=jnp.float32)
    start = 0
    for lvl, (h, w) in enumerate(spatial_shapes):
        v = jax.lax.dynamic_slice_in_dim(value_hm, start, h * w, axis=2)
        start += h * w
        loc = loc_hm[:, :, :, lvl].reshape(B, H, Q * P, 2)
        sampled = bilinear_sample(v, h, w, loc)            # (B, H, Q*P, D)
        sampled = sampled.reshape(B, H, Q, P, D)
        # weighted reduce over sampling points; written as multiply+sum (not
        # einsum/dot_general) — the dot_general VJP's transposed reduce trips
        # a layout-assignment bug in this libtpu AOT toolchain.
        w_lvl = w_hm[:, :, :, lvl].astype(jnp.float32)
        out = out + (sampled.astype(jnp.float32) *
                     w_lvl[..., None]).sum(axis=3)
    out = jnp.transpose(out, (0, 2, 1, 3)).reshape(B, Q, H * D)
    return out.astype(value.dtype)


def multi_scale_deformable_attention_chunked(
    value: jax.Array,
    spatial_shapes: Sequence[Tuple[int, int]],
    sampling_locations: jax.Array,
    attention_weights: jax.Array,
    chunk_size: int = 10000,
) -> jax.Array:
    """Query-chunked wrapper bounding peak gather memory (the XLA analogue of
    the CUDA kernel's im2col_step batching)."""
    B, Q = sampling_locations.shape[:2]
    if Q <= chunk_size or Q % chunk_size != 0:
        return multi_scale_deformable_attention(
            value, spatial_shapes, sampling_locations, attention_weights)
    n_chunks = Q // chunk_size

    def body(carry, inputs):
        loc, w = inputs
        out = multi_scale_deformable_attention(value, spatial_shapes, loc, w)
        return carry, out

    loc_chunks = sampling_locations.reshape(
        B, n_chunks, chunk_size, *sampling_locations.shape[2:]).swapaxes(0, 1)
    w_chunks = attention_weights.reshape(
        B, n_chunks, chunk_size, *attention_weights.shape[2:]).swapaxes(0, 1)
    _, outs = jax.lax.scan(body, None, (loc_chunks, w_chunks))
    # (n_chunks, B, chunk, H*D) -> (B, Q, H*D)
    return outs.swapaxes(0, 1).reshape(B, Q, -1)
