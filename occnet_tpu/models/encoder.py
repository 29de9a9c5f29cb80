"""BEVFormer encoder: stacked layers of (temporal self-attn, LN, spatial
cross-attn, LN, FFN, LN) over the BEV query grid.

Equivalent of `BEVFormerEncoder`/`BEVFormerLayer` (`encoder.py:28-239,
242-406` in the reference) with the per-layer `point_sampling` hoisted out:
reference points and camera projections are computed once per forward (they
are layer-invariant — the reference recomputes spatial_shapes tensors per
layer only because of torch idioms).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from occnet_tpu.config import EncoderConfig
from occnet_tpu.geometry import (
    bev_reference_points_2d,
    bev_reference_points_3d,
    project_bev_points_to_cameras,
)
from occnet_tpu.models.norm import LayerNorm32
from occnet_tpu.models.attention import (
    SpatialCrossAttention,
    TemporalSelfAttention,
    xavier_uniform,
)
from occnet_tpu.models.dense_attention import (
    DenseSpatialCrossAttention,
    DenseTemporalSelfAttention,
)


class FFN(nn.Module):
    """mmcv-style FFN: Dense -> ReLU -> Dropout -> Dense -> Dropout + residual
    (configured at `bevformer_base_occ.py:125-126`: ffn_dim 512, dropout 0.1).
    """
    embed_dims: int
    ffn_dim: int
    dropout: float
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, *, deterministic: bool = True):
        residual = x
        y = nn.Dense(self.ffn_dim, dtype=self.dtype,
                     kernel_init=xavier_uniform, name="fc1")(x)
        y = nn.relu(y)
        y = nn.Dropout(self.dropout)(y, deterministic=deterministic)
        y = nn.Dense(self.embed_dims, dtype=self.dtype,
                     kernel_init=xavier_uniform, name="fc2")(y)
        y = nn.Dropout(self.dropout)(y, deterministic=deterministic)
        return y + residual


class BEVFormerLayer(nn.Module):
    """One encoder block with operation order
    ('self_attn','norm','cross_attn','norm','ffn','norm') — reference config
    `bevformer_base_occ.py:127-128`, dispatch `encoder.py:356-404`."""
    cfg: EncoderConfig
    embed_dims: int
    num_cams: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        query: jax.Array,                  # (B, Q, C)
        value: jax.Array,                  # (B, cams, V, C)
        bev_pos: jax.Array,                # (B, Q, C)
        hybrid_ref_2d: jax.Array,          # (B, 2, Q, 1, 2)
        ref_cam: jax.Array,                # (cams, B, Q, Z, 2)
        bev_mask: jax.Array,               # (cams, B, Q, Z)
        bev_hw: Tuple[int, int],
        img_spatial_shapes: Sequence[Tuple[int, int]],
        prev_bev: Optional[jax.Array],     # (B, 2, Q, C) or None
        *,
        deterministic: bool = True,
    ) -> jax.Array:
        ln = lambda name: LayerNorm32(  # noqa: E731
            out_dtype=self.dtype, name=name)
        if self.cfg.mode == "dense":
            query = DenseTemporalSelfAttention(
                self.cfg.tsa, embed_dims=self.embed_dims, bev_hw=bev_hw,
                dtype=self.dtype, name="self_attn")(
                query, prev_bev, bev_pos, deterministic=deterministic)
            query = ln("norm1")(query)
            # `value` carries the camera-averaged lift (B, L, Z, Q, C)
            query = DenseSpatialCrossAttention(
                self.cfg.sca, embed_dims=self.embed_dims,
                num_levels=value.shape[1], num_z=value.shape[2],
                dtype=self.dtype, name="cross_attn")(
                query, value, None, deterministic=deterministic)
            query = ln("norm2")(query)
        else:
            query = TemporalSelfAttention(
                self.cfg.tsa, embed_dims=self.embed_dims, dtype=self.dtype,
                name="self_attn")(
                query, prev_bev, bev_pos, hybrid_ref_2d, [bev_hw],
                deterministic=deterministic)
            query = ln("norm1")(query)
            query = SpatialCrossAttention(
                self.cfg.sca, embed_dims=self.embed_dims,
                num_cams=self.num_cams, dtype=self.dtype,
                name="cross_attn")(
                query, value, None, ref_cam, bev_mask, img_spatial_shapes,
                deterministic=deterministic)
            query = ln("norm2")(query)
        query = FFN(self.embed_dims, self.cfg.ffn_dim, self.cfg.ffn_dropout,
                    dtype=self.dtype, name="ffn")(
            query, deterministic=deterministic)
        query = ln("norm3")(query)
        return query


class BEVFormerEncoder(nn.Module):
    """num_layers x BEVFormerLayer with shared geometry (`encoder.py:153-239`).
    """
    cfg: EncoderConfig
    embed_dims: int
    num_cams: int
    bev_h: int
    bev_w: int
    pc_range: Tuple[float, ...]
    img_hw: Tuple[int, int]
    bev_shard_axis: str = ""
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        bev_query: jax.Array,              # (B, Q, C)
        value: jax.Array,                  # (B, cams, V, C)
        bev_pos: jax.Array,                # (B, Q, C)
        ego2img: jax.Array,                # (B, cams, 4, 4)
        img_spatial_shapes: Sequence[Tuple[int, int]],
        prev_bev: Optional[jax.Array] = None,     # (B, Q, C) aligned prev BEV
        shift_ref_2d: Optional[jax.Array] = None,  # (B, Q, 1, 2) shifted refs
        *,
        deterministic: bool = True,
    ) -> jax.Array:
        B, Q, C = bev_query.shape
        z_extent = self.pc_range[5] - self.pc_range[2]
        ref_2d = bev_reference_points_2d(self.bev_h, self.bev_w)
        ref_2d = jnp.broadcast_to(ref_2d[None], (B, Q, 1, 2))

        if self.cfg.mode == "dense":
            ref_cam = bev_mask = None   # geometry folded into the lift
        else:
            ref_3d = bev_reference_points_3d(
                self.bev_h, self.bev_w, z_extent,
                self.cfg.num_points_in_pillar)
            ref_cam, bev_mask = project_bev_points_to_cameras(
                ref_3d, self.pc_range, ego2img, self.img_hw)

        # Hybrid 2-queue reference for TSA (`encoder.py:204-212`).  The
        # reference notes its shift_ref_2d aliasing bug and keeps it; without
        # a shift both slots use the plain grid, which is also the prev_bev is
        # None path.
        if shift_ref_2d is None:
            shift_ref_2d = ref_2d
        else:
            shift_ref_2d = jnp.broadcast_to(shift_ref_2d, (B, Q, 1, 2))
        hybrid_ref_2d = jnp.stack([shift_ref_2d, ref_2d], axis=1)

        prev_queue = None
        if prev_bev is not None:
            # Queue layout [prev, initial current] built once before the layer
            # loop and shared by all layers (`encoder.py:204-215`).
            prev_queue = jnp.stack([prev_bev, bev_query], axis=1)

        def shard_q(x, q_axis):
            """Spatial (BEV-query) sharding over the model axis: the natural
            'sequence parallel' axis of this architecture (SURVEY.md
            section 5) — deformable/dense attention is query-local, so
            partitioning Q needs no collectives inside a layer."""
            if not self.bev_shard_axis:
                return x
            from jax.sharding import PartitionSpec as P
            spec = [None] * x.ndim
            spec[q_axis] = self.bev_shard_axis
            return jax.lax.with_sharding_constraint(x, P(*spec))

        bev_query = shard_q(bev_query, 1)
        if self.cfg.mode == "dense":
            value = shard_q(value, 3)       # (B, L, Z, Q, C)

        for lid in range(self.cfg.num_layers):
            bev_query = BEVFormerLayer(
                self.cfg, self.embed_dims, self.num_cams, dtype=self.dtype,
                name=f"layer{lid}")(
                bev_query, value, bev_pos, hybrid_ref_2d, ref_cam, bev_mask,
                (self.bev_h, self.bev_w), img_spatial_shapes, prev_queue,
                deterministic=deterministic)
        return bev_query
