"""Dense (gather-free) attention modules — the TPU-native fast path.

Rationale (measured, memory/tpu-gather-rates.md): per-sample deformable
gathers are rate-limited to ~65M rows/s on TPU, so the exact MSDA path
(`models/attention.py`) can never be fast.  These modules keep the reference's
information flow but restructure the sampling to dense ops:

- `DenseSpatialCrossAttention`: consumes the camera-averaged planar lift
  Ū(B, L, Z, Q, C) (`ops/planar_lift.py`), which plays the role of the
  reference's per-(query, z-anchor, level) image samples at the pillar
  reference points (`spatial_cross_attention.py:350-373` with offsets -> 0).
  Content-dependent attention weights over the L*Z slots reproduce the
  reference's softmax over levels x points; the learned per-head image-space
  offsets are traded for the dense lift (documented deviation).  The
  camera-sum/visibility-count normalisation is exact: the reference applies
  identical query-derived weights in every camera and then scatter-adds
  masked per-camera results (:149-172), which commutes with pre-averaging
  over cameras.

- `DenseTemporalSelfAttention`: the reference TSA samples 4 offset points on
  the BEV plane per head per queue slot (`temporal_self_attention.py`); here
  each head attends over a static 3x3 shifted-neighbourhood tap set per queue
  (zero-padded shifts = dense rolls), with content-dependent weights from
  concat(prev, current) exactly like the reference (:197).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from occnet_tpu.config import SCAConfig, TSAConfig
from occnet_tpu.models.attention import xavier_uniform
from occnet_tpu.ops.tsa_pallas import TSA_TAPS, _shift2d, tap_attention


class DenseSpatialCrossAttention(nn.Module):
    """BEV <- lifted camera features, weights over (level, z-anchor) slots."""
    cfg: SCAConfig
    embed_dims: int = 256
    num_levels: int = 4
    num_z: int = 8
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        query: jax.Array,          # (B, Q, C)
        lifted: jax.Array,         # (B, L, Z, Q, C) camera-averaged lift
        query_pos: Optional[jax.Array],
        *,
        deterministic: bool = True,
    ) -> jax.Array:
        B, Q, C = query.shape
        H = self.cfg.num_heads
        L, Z = self.num_levels, self.num_z
        D = self.embed_dims // H
        residual = query
        if query_pos is not None:
            query = query + query_pos

        attn = nn.Dense(H * L * Z, dtype=self.dtype,
                        kernel_init=nn.initializers.zeros,
                        bias_init=nn.initializers.zeros,
                        name="attention_weights")(query)
        attn = attn.reshape(B, Q, H, L * Z)
        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1)
        attn = attn.reshape(B, Q, H, L, Z).astype(lifted.dtype)

        # (B, L, Z, Q, H, D) x (B, Q, H, L, Z) -> (B, Q, H, D)
        v = lifted.reshape(B, L, Z, Q, H, D)
        out = jnp.einsum("blzqhd,bqhlz->bqhd", v, attn,
                         preferred_element_type=jnp.float32)
        out = out.reshape(B, Q, C).astype(self.dtype)

        out = nn.Dense(self.embed_dims, dtype=self.dtype,
                       kernel_init=xavier_uniform, name="output_proj")(out)
        out = nn.Dropout(self.cfg.dropout)(out, deterministic=deterministic)
        return out + residual


class DenseTemporalSelfAttention(nn.Module):
    """2-queue BEV self-attention over a 3x3 shifted tap set."""
    cfg: TSAConfig
    embed_dims: int = 256
    bev_hw: Tuple[int, int] = (200, 200)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        query: jax.Array,                # (B, Q, C)
        prev_bev: Optional[jax.Array],   # (B, 2, Q, C) or None
        query_pos: Optional[jax.Array],
        *,
        deterministic: bool = True,
    ) -> jax.Array:
        B, Q, C = query.shape
        H = self.cfg.num_heads
        nq = self.cfg.num_bev_queue
        T = len(TSA_TAPS)
        D = self.embed_dims // H
        bh, bw = self.bev_hw
        identity = query

        if prev_bev is None:
            value = jnp.stack([query, query], axis=1)
        else:
            value = prev_bev
        if query_pos is not None:
            query = query + query_pos
        query_aug = jnp.concatenate([value[:, 0], query], axis=-1)

        value = nn.Dense(self.embed_dims, dtype=self.dtype,
                         kernel_init=xavier_uniform, name="value_proj")(value)

        attn = nn.Dense(nq * H * T, dtype=self.dtype,
                        kernel_init=nn.initializers.zeros,
                        bias_init=nn.initializers.zeros,
                        name="attention_weights")(query_aug)
        attn = attn.reshape(B, Q, H, nq, T)
        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1)
        attn = attn.astype(self.dtype)

        vgrid = value.reshape(B, nq, bh, bw, C)
        # (B, Q, H, nq, T) -> (B, bh, bw, nq, T, H) for the fused tap kernel
        # (ops/tsa_pallas.py: one VMEM-resident pass over the value grids
        # instead of 9 shift/einsum HBM round-trips)
        attn6 = attn.transpose(0, 1, 3, 4, 2).reshape(B, bh, bw, nq, T, H)
        out = tap_attention(vgrid, attn6, impl=self.cfg.tap_impl)
        out = out.reshape(B, Q, C).astype(self.dtype)

        out = nn.Dense(self.embed_dims, dtype=self.dtype,
                       kernel_init=xavier_uniform, name="output_proj")(out)
        out = nn.Dropout(self.cfg.dropout)(out, deterministic=deterministic)
        return out + identity
