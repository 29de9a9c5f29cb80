"""Multi-scale deformable attention sampling — the TPU-native equivalent of
mmcv's `ms_deform_attn_forward/backward` CUDA kernel.

The reference invokes that kernel from spatial cross-attention
(`spatial_cross_attention.py:386-393`), temporal self-attention
(`temporal_self_attention.py:240-253`) and the (unused) detection decoder; a
pure-PyTorch fallback (`multi_scale_deformable_attn_pytorch`, grid_sample with
bilinear / zeros-padding / align_corners=False) defines the semantics we match
here.

Two XLA formulations live here, both exact:

- `multi_scale_deformable_attention` (default): the **patch-table** gather.
  TPU gathers cost per ROW, independent of row width (measured 120-150M
  rows/s on v5e whether 32- or 128-wide), so the four bilinear corner rows
  of a sample are packed into ONE 4*D-wide row of a shifted-copy "patch
  table" (built with three rolls per level) and fetched with a single
  gather — 4x fewer gather rows than the naive per-corner form, which is
  what made exact-mode inference eval-speed viable.  Corner-clamp
  semantics at the image border are preserved by remapping the per-axis
  bilinear weights onto the clipped 2x2 window (see `_packed_axis_weights`).
- `multi_scale_deformable_attention_ref`: the straightforward per-corner
  `take_along_axis` form, kept as the readable cross-check oracle.

Backward comes from JAX AD over the gather graph (gather grad = scatter-add,
matching the CUDA kernel's atomicAdd accumulation semantics
deterministically).  A fused Pallas kernel with the same contract lives in
`ops/msda_pallas.py`; all three are cross-checked against a torch
`grid_sample` oracle in tests.
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


def bilinear_sample_packed(
    value: jax.Array,       # (B, H, h*w, D)  per-level value, head-major
    h: int,
    w: int,
    loc: jax.Array,         # (B, H, N, 2)    normalised [0,1] xy sample points
) -> jax.Array:             # (B, H, N, D)
    """`bilinear_sample` with ONE gather row per sample instead of four.

    The four bilinear corner rows are packed into a 4*D-wide row of a
    shifted-copy patch table (three rolls; see module docstring — gathers
    cost per ROW on this platform, independent of width), and the per-axis
    weights are border-clamp remapped by `_packed_axis_weights`, which
    preserves grid_sample(padding_mode='zeros') semantics exactly.  Used by
    the DCNv2 offset-window sampling (`ops/deform_conv.py`), whose cost is
    all gather rows.  Requires h >= 2 and w >= 2 (the packed window spans
    two cells per axis)."""
    assert h >= 2 and w >= 2, "packed window needs >= 2 cells per axis"
    loc = loc.astype(jnp.float32)
    x = loc[..., 0] * w - 0.5
    y = loc[..., 1] * h - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    bx, wx0, wx1 = _packed_axis_weights(x0.astype(jnp.int32), x - x0, w)
    by, wy0, wy1 = _packed_axis_weights(y0.astype(jnp.int32), y - y0, h)
    idx = by * w + bx                                   # (B, H, N)
    # packed row i = [v[i], v[i+1], v[i+w], v[i+w+1]]; the wrapped tail
    # entries of the rolls are never gathered (idx <= hw - w - 2)
    table = jnp.concatenate(
        [value, jnp.roll(value, -1, axis=2), jnp.roll(value, -w, axis=2),
         jnp.roll(value, -(w + 1), axis=2)], axis=-1)   # (B, H, hw, 4D)
    g = jnp.take_along_axis(table, idx[..., None], axis=2)
    D = value.shape[-1]
    g = g.reshape(*idx.shape, 4, D)
    w4 = jnp.stack([wy0 * wx0, wy0 * wx1, wy1 * wx0, wy1 * wx1],
                   axis=-1)                             # (B, H, N, 4)
    # multiply+sum (not dot_general) — see the layout-bug note below
    out = (g.astype(jnp.float32) * w4[..., None]).sum(axis=-2)
    return out.astype(value.dtype)


def _packed_axis_weights(c0: jax.Array, t: jax.Array, extent: int):
    """Remap one axis of the bilinear stencil onto the clipped 2-cell window.

    For floor coordinate ``c0`` (int) with fraction ``t`` the true corners are
    ``c0`` (weight 1-t) and ``c0+1`` (weight t), each zeroed when outside
    [0, extent-1].  The packed window starts at ``base = clip(c0, 0,
    extent-2)``; when the clamp shifts the window (c0 == -1 or extent-1) the
    surviving corner's weight moves to the packed slot that actually holds
    its value, so the packed product equals the reference's per-corner
    clip-and-mask exactly."""
    wl = (1.0 - t) * (c0 >= 0)
    wr = t * (c0 + 1 <= extent - 1)
    base = jnp.clip(c0, 0, extent - 2)
    w0 = jnp.where(base == c0, wl, 0.0) + jnp.where(base == c0 + 1, wr, 0.0)
    w1 = jnp.where(base == c0, wr, 0.0) + jnp.where(base + 1 == c0, wl, 0.0)
    return base, w0, w1


def multi_scale_deformable_attention(
    value: jax.Array,                    # (B, V, H, D) flattened level pyramid
    spatial_shapes: Sequence[Tuple[int, int]],   # static [(h, w), ...]
    sampling_locations: jax.Array,       # (B, Q, H, L, P, 2) in [0,1]
    attention_weights: jax.Array,        # (B, Q, H, L, P) softmaxed over L*P
    query_chunk: int = 0,
) -> jax.Array:                          # (B, Q, H*D)
    """Deformable attention core via packed corner-patch tables: ONE gather
    row per sample instead of four (gathers cost per row on TPU, regardless
    of width — BASELINE.md).  Exactly matches mmcv
    `multi_scale_deformable_attn_pytorch` (the reference's CPU oracle for
    its CUDA kernel, `spatial_cross_attention.py:394-396`); cross-checked
    against `multi_scale_deformable_attention_ref` and a torch grid_sample
    oracle in tests.

    ``query_chunk`` bounds peak gather memory (the XLA analogue of the CUDA
    kernel's im2col_step): patch tables are built once, the gather+reduce
    scans over query chunks.
    """
    B, V, H, D = value.shape
    Bq, Q, Hh, L, P, _ = sampling_locations.shape
    assert H == Hh and L == len(spatial_shapes)
    assert sum(h * w for h, w in spatial_shapes) == V, (
        f"value length {V} != sum of {spatial_shapes}")
    if any(h < 2 or w < 2 for h, w in spatial_shapes):
        # the packed 2x2 window needs >= 2 cells per axis; degenerate levels
        # only occur at toy test shapes — use the per-corner form there
        return multi_scale_deformable_attention_ref(
            value, spatial_shapes, sampling_locations, attention_weights)

    value_hm = jnp.transpose(value, (0, 2, 1, 3)).reshape(B * H, V, D)
    tables = []
    start = 0
    for h, w in spatial_shapes:
        v = jax.lax.dynamic_slice_in_dim(value_hm, start, h * w, axis=1)
        start += h * w
        # packed row i = [v[i], v[i+1], v[i+w], v[i+w+1]]; the wrapped tail
        # entries of the rolls are never gathered (base <= hw - w - 2)
        tables.append(jnp.concatenate(
            [v, jnp.roll(v, -1, axis=1), jnp.roll(v, -w, axis=1),
             jnp.roll(v, -(w + 1), axis=1)], axis=-1))    # (BH, hw, 4D)

    loc_hm = jnp.transpose(sampling_locations, (0, 2, 1, 3, 4, 5)).reshape(
        B * H, Q, L, P, 2)
    w_hm = jnp.transpose(attention_weights, (0, 2, 1, 3, 4)).reshape(
        B * H, Q, L, P)

    def compute(loc, attn):              # (BH, q, L, P, 2), (BH, q, L, P)
        q = loc.shape[1]
        out = jnp.zeros((B * H, q, D), jnp.float32)
        for lvl, (h, w) in enumerate(spatial_shapes):
            ll = loc[:, :, lvl].astype(jnp.float32)        # (BH, q, P, 2)
            x = ll[..., 0] * w - 0.5
            y = ll[..., 1] * h - 0.5
            x0 = jnp.floor(x)
            y0 = jnp.floor(y)
            bx, wx0, wx1 = _packed_axis_weights(
                x0.astype(jnp.int32), x - x0, w)
            by, wy0, wy1 = _packed_axis_weights(
                y0.astype(jnp.int32), y - y0, h)
            idx = (by * w + bx).reshape(B * H, q * P)
            g = jnp.take_along_axis(tables[lvl], idx[..., None], axis=1)
            g = g.reshape(B * H, q, P, 4, D).astype(jnp.float32)
            cw = jnp.stack([wy0 * wx0, wy0 * wx1, wy1 * wx0, wy1 * wx1],
                           axis=-1)                        # (BH, q, P, 4)
            cw = cw * attn[:, :, lvl].astype(jnp.float32)[..., None]
            # multiply+sum (not einsum/dot_general) — the dot_general VJP's
            # transposed reduce trips a layout-assignment bug in this libtpu
            # AOT toolchain (see models/norm.py)
            out = out + (g * cw[..., None]).sum(axis=(2, 3))
        return out

    if query_chunk and Q > query_chunk:
        # a non-dividing query_chunk used to fall back to UNCHUNKED silently,
        # which at base-scale training shapes (Q=12288, chunk 8000) blew the
        # per-layer gather temporaries to 6 GB each and OOMed the backward.
        # Non-dividing Q is PADDED to a whole number of chunks (zero attn
        # weights contribute zero; the pad rows are sliced off) — a divisor
        # search could degrade to chunk size 1 for prime Q (ADVICE r3)
        n_chunks = -(-Q // query_chunk)
        q_pad = n_chunks * query_chunk - Q
        if q_pad:
            loc_hm = jnp.pad(loc_hm, ((0, 0), (0, q_pad), (0, 0), (0, 0),
                                      (0, 0)))
            w_hm = jnp.pad(w_hm, ((0, 0), (0, q_pad), (0, 0), (0, 0)))

        def body(_, inputs):
            loc, attn = inputs
            # remat: without it lax.scan STACKS each chunk's gather
            # residuals for the backward, so chunking would bound the
            # forward peak but not the backward (the actual base-scale OOM);
            # recomputing the chunk gather in the bwd costs ~1 extra gather
            # pass and caps live temporaries at one chunk
            return None, jax.checkpoint(compute)(loc, attn)

        loc_chunks = loc_hm.reshape(
            B * H, n_chunks, query_chunk, L, P, 2).swapaxes(0, 1)
        w_chunks = w_hm.reshape(
            B * H, n_chunks, query_chunk, L, P).swapaxes(0, 1)
        _, outs = jax.lax.scan(body, None, (loc_chunks, w_chunks))
        out = outs.swapaxes(0, 1).reshape(B * H, n_chunks * query_chunk,
                                          D)[:, :Q]
    else:
        out = compute(loc_hm, w_hm)

    out = jnp.transpose(out.reshape(B, H, Q, D), (0, 2, 1, 3))
    return out.reshape(B, Q, H * D).astype(value.dtype)


def multi_scale_deformable_attention_ref(
    value: jax.Array,                    # (B, V, H, D) flattened level pyramid
    spatial_shapes: Sequence[Tuple[int, int]],   # static [(h, w), ...]
    sampling_locations: jax.Array,       # (B, Q, H, L, P, 2) in [0,1]
    attention_weights: jax.Array,        # (B, Q, H, L, P) softmaxed over L*P
) -> jax.Array:                          # (B, Q, H*D)
    """Per-corner reference formulation (the readable oracle): for every
    (query, head) sample P points per level bilinearly from the value
    pyramid and reduce with attention weights.

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
    """Query-chunked entry point bounding peak gather memory (the XLA
    analogue of the CUDA kernel's im2col_step batching); patch tables are
    built once, outside the chunk scan."""
    return multi_scale_deformable_attention(
        value, spatial_shapes, sampling_locations, attention_weights,
        query_chunk=chunk_size)
