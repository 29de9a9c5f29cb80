"""BEVFormer attention modules: MSDeformableAttention3D, SpatialCrossAttention,
TemporalSelfAttention — flax.linen, batch-first, static shapes.

Reference semantics: `spatial_cross_attention.py` (SCA :75-175, MSDA3D
:273-400) and `temporal_self_attention.py` (:128-272).  The one deliberate
structural change is in SCA: the reference gathers, per camera, only the BEV
queries visible in that camera into a dynamically-sized dense tensor
(`spatial_cross_attention.py:137-167`) — dynamic `nonzero` shapes don't jit on
TPU, so here attention runs for all (camera, query) pairs with static shape,
the per-camera outputs are visibility-masked, summed, and normalised by the
per-query camera hit-count exactly as the reference's scatter-add + clamp
(:165-172).  Invisible pairs sample out-of-bounds and contribute zero, so the
result is numerically identical.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from occnet_tpu.config import SCAConfig, TSAConfig
from occnet_tpu.ops.msda import (
    multi_scale_deformable_attention,
    multi_scale_deformable_attention_chunked,
)
from occnet_tpu.ops.msda_pallas import multi_scale_deformable_attention_pallas

xavier_uniform = nn.initializers.xavier_uniform()


def radial_offset_bias(num_heads: int, num_level_slots: int,
                       num_points: int) -> np.ndarray:
    """Per-head radial grid initial offsets: head h points along angle
    2*pi*h/H, scaled 1..num_points across points — the deformable-DETR init
    scheme (`spatial_cross_attention.py:253-271`)."""
    thetas = np.arange(num_heads, dtype=np.float32) * (
        2.0 * math.pi / num_heads)
    grid = np.stack([np.cos(thetas), np.sin(thetas)], axis=-1)  # (H, 2)
    grid = grid / np.abs(grid).max(axis=-1, keepdims=True)
    grid = np.tile(grid[:, None, None, :],
                   (1, num_level_slots, num_points, 1))
    for p in range(num_points):
        grid[:, :, p, :] *= p + 1
    return grid.reshape(-1)


def _const_bias_init(values: np.ndarray):
    def init(key, shape, dtype=jnp.float32):
        assert shape == values.shape, (shape, values.shape)
        return jnp.asarray(values, dtype)
    return init


class MSDeformableAttention3D(nn.Module):
    """Deformable attention where each BEV query carries `num_Z_anchors` 2D
    reference points per camera; the H*L*P predicted offsets are distributed
    across z-anchors (`spatial_cross_attention.py:350-373`).  No output
    projection (the reference sets output_proj=None for this module)."""
    embed_dims: int = 256
    num_heads: int = 8
    num_levels: int = 4
    num_points: int = 8
    # query-chunked sampling bounds peak gather memory (the XLA analogue of
    # the CUDA kernel's im2col_step; non-dividing sizes snap to a divisor of
    # Q, and the chunk scan body is rematerialised so the BACKWARD peak is
    # also one chunk); 0 = unchunked
    query_chunk: int = 4096
    # "xla" patch-table gather | "pallas" fused kernel
    msda_impl: str = "xla"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        query: jax.Array,            # (B*, Q, C)
        value: jax.Array,            # (B*, V, C)
        reference_points: jax.Array,  # (B*, Q, Z, 2) normalised
        spatial_shapes: Sequence[Tuple[int, int]],
    ) -> jax.Array:
        bs, num_query, _ = query.shape
        H, L, P = self.num_heads, self.num_levels, self.num_points
        head_dim = self.embed_dims // H

        value = nn.Dense(self.embed_dims, dtype=self.dtype,
                         kernel_init=xavier_uniform, name="value_proj")(value)
        value = value.reshape(bs, -1, H, head_dim)

        offsets = nn.Dense(
            H * L * P * 2, dtype=self.dtype,
            kernel_init=nn.initializers.zeros,
            bias_init=_const_bias_init(radial_offset_bias(H, L, P)),
            name="sampling_offsets")(query)
        offsets = offsets.reshape(bs, num_query, H, L, P, 2)

        attn = nn.Dense(H * L * P, dtype=self.dtype,
                        kernel_init=nn.initializers.zeros,
                        bias_init=nn.initializers.zeros,
                        name="attention_weights")(query)
        attn = attn.reshape(bs, num_query, H, L * P)
        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1)
        attn = attn.reshape(bs, num_query, H, L, P)

        # Distribute the P offsets over the Z reference anchors: with Z
        # z-anchors each gets P//Z offsets (`spatial_cross_attention.py:
        # 360-373`); for the base config P == Z == 8 so one offset per anchor.
        z_anchors = reference_points.shape[2]
        assert P % z_anchors == 0, (P, z_anchors)
        per_anchor = P // z_anchors
        normalizer = jnp.asarray(
            [[w, h] for h, w in spatial_shapes], dtype=jnp.float32)
        offsets = offsets.astype(jnp.float32) / normalizer[None, None, None, :,
                                                           None, :]
        offsets = offsets.reshape(
            bs, num_query, H, L, per_anchor, z_anchors, 2)
        ref = reference_points.astype(jnp.float32)[
            :, :, None, None, None, :, :]
        loc = (ref + offsets).reshape(bs, num_query, H, L, P, 2)

        if self.msda_impl == "pallas":
            return multi_scale_deformable_attention_pallas(
                value, spatial_shapes, loc, attn)
        if self.query_chunk and num_query > self.query_chunk:
            return multi_scale_deformable_attention_chunked(
                value, spatial_shapes, loc, attn,
                chunk_size=self.query_chunk)
        return multi_scale_deformable_attention(
            value, spatial_shapes, loc, attn)


class SpatialCrossAttention(nn.Module):
    """BEV -> image cross attention over the camera feature pyramid
    (`spatial_cross_attention.py:31-175`), static-masked formulation."""
    cfg: SCAConfig
    embed_dims: int = 256
    num_cams: int = 6
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        query: jax.Array,            # (B, Q, C)
        value: jax.Array,            # (B, num_cams, V, C) camera pyramid
        query_pos: Optional[jax.Array],
        reference_points_cam: jax.Array,   # (num_cams, B, Q, Z, 2)
        bev_mask: jax.Array,               # (num_cams, B, Q, Z) bool
        spatial_shapes: Sequence[Tuple[int, int]],
        *,
        deterministic: bool = True,
    ) -> jax.Array:
        B, Q, C = query.shape
        n_cam = self.num_cams
        residual = query
        if query_pos is not None:
            query = query + query_pos

        msda = MSDeformableAttention3D(
            embed_dims=self.embed_dims, num_heads=self.cfg.num_heads,
            num_levels=self.cfg.num_levels, num_points=self.cfg.num_points,
            msda_impl=self.cfg.msda_impl,
            dtype=self.dtype, name="deformable_attention")

        v_all = value.reshape(B * n_cam, -1, C)
        ref_bc = jnp.transpose(reference_points_cam,
                               (1, 0, 2, 3, 4))          # (B, cam, Q, Z, 2)
        # visible(cam, q) = any z-anchor visible (reference :138-139 selects
        # queries whose per-camera mask sum is nonzero).
        vis_cnt = bev_mask.sum(axis=-1)                   # (n_cam, B, Q)
        visible = jnp.transpose(vis_cnt > 0, (1, 0, 2))   # (B, n_cam, Q)
        count = jnp.maximum(visible.sum(axis=1), 1).astype(jnp.float32)

        K = self.cfg.max_queries_per_cam
        ks = tuple(int(k) for k in self.cfg.per_cam_topk)
        if ks and len(ks) != n_cam:
            raise ValueError(
                f"per_cam_topk has {len(ks)} entries for {n_cam} cameras")
        if not ks and K:
            ks = (int(K),) * n_cam
        if ks and min(ks) < Q:
            # Static top-K compaction: the TPU analogue of the reference's
            # dynamic per-camera rebatch (:137-167).  Exact whenever K_c >=
            # camera c's visible-query count (selected set then covers the
            # visible set; extra slots are masked out below).  The
            # `sca_topk_overflow` intermediate counts visible queries that
            # did NOT fit — 0 certifies the compaction was exact for this
            # batch (the runtime check replacing an unjittable assert).
            # Per-camera K_c (`per_cam_topk`, calibration-derived): cameras
            # with equal K batch into one MSDA call; distinct-K groups run
            # separately — narrow-FoV cameras stop paying the widest
            # camera's row count (the reference's per-camera `max_len` is
            # dynamic per level for the same reason,
            # `spatial_cross_attention.py:141`).
            ks = tuple(min(k, Q) for k in ks)
            n_visible = visible.sum(axis=2)               # (B, n_cam)
            self.sow("intermediates", "sca_topk_overflow",
                     jnp.maximum(
                         n_visible - jnp.asarray(np.asarray(ks, np.int32)),
                         0).max())
            scores = jnp.transpose(vis_cnt, (1, 0, 2)).astype(jnp.int32)
            groups: dict = {}
            for ci, k in enumerate(ks):
                groups.setdefault(k, []).append(ci)
            slots = None
            bidx = jnp.arange(B)[:, None, None]
            for K_g, cams in sorted(groups.items()):
                cam_idx = np.asarray(cams)
                g = len(cams)
                _, sel = jax.lax.top_k(scores[:, cam_idx], K_g)  # (B,g,K_g)
                q_sel = jnp.take_along_axis(
                    jnp.broadcast_to(query[:, None], (B, g, Q, C)),
                    sel[..., None], axis=2)
                ref_sel = jnp.take_along_axis(
                    ref_bc[:, cam_idx], sel[..., None, None], axis=2)
                out_sel = msda(
                    q_sel.reshape(B * g, K_g, C),
                    value[:, cam_idx].reshape(B * g, -1, C),
                    ref_sel.reshape(B * g, K_g, -1, 2), spatial_shapes)
                out_sel = out_sel.reshape(B, g, K_g, C)
                vis_sel = jnp.take_along_axis(visible[:, cam_idx], sel,
                                              axis=2)
                out_sel = out_sel * vis_sel[..., None].astype(out_sel.dtype)
                if slots is None:
                    slots = jnp.zeros((B, Q, C), out_sel.dtype)
                # scatter-add over queries (top_k indices are distinct per
                # (batch, camera)); camera contributions sum as in the
                # dense path
                slots = slots.at[bidx, sel].add(out_sel)
        else:
            # Dense: all cameras in one batched call (B*n_cam, Q, ...).
            q_all = jnp.broadcast_to(query[:, None], (B, n_cam, Q, C))
            q_all = q_all.reshape(B * n_cam, Q, C)
            ref = ref_bc.reshape(B * n_cam, Q, -1, 2)
            out = msda(q_all, v_all, ref, spatial_shapes)
            out = out.reshape(B, n_cam, Q, C)
            slots = jnp.sum(out * visible[..., None].astype(out.dtype),
                            axis=1)
        # normalise by per-query camera hit count (reference :169-172)
        slots = (slots.astype(jnp.float32) / count[..., None]).astype(
            self.dtype)

        slots = nn.Dense(self.embed_dims, dtype=self.dtype,
                         kernel_init=xavier_uniform, name="output_proj")(slots)
        slots = nn.Dropout(self.cfg.dropout)(
            slots, deterministic=deterministic)
        return slots + residual


class TemporalSelfAttention(nn.Module):
    """BEV self-attention over the 2-slot temporal queue
    (`temporal_self_attention.py:128-272`).  With no prev_bev the queue is
    [query, query] (:177-181); offsets/weights are predicted from
    concat(prev_value, query) (:197); the two queue outputs are averaged
    (:259-262)."""
    cfg: TSAConfig
    embed_dims: int = 256
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        query: jax.Array,                 # (B, Q, C)
        prev_bev: Optional[jax.Array],    # (B, 2, Q, C) queue or None
        query_pos: Optional[jax.Array],
        reference_points: jax.Array,      # (B, 2, Q, num_levels, 2)
        spatial_shapes: Sequence[Tuple[int, int]],   # [(bev_h, bev_w)]
        *,
        deterministic: bool = True,
    ) -> jax.Array:
        B, Q, C = query.shape
        H, L, P = self.cfg.num_heads, self.cfg.num_levels, self.cfg.num_points
        nq_queue = self.cfg.num_bev_queue
        assert nq_queue == 2
        head_dim = self.embed_dims // H
        identity = query

        if prev_bev is None:
            value = jnp.stack([query, query], axis=1)    # (B, 2, Q, C)
        else:
            value = prev_bev
        if query_pos is not None:
            query = query + query_pos

        # Offsets/weights predicted from [prev_value, query].
        query_aug = jnp.concatenate([value[:, 0], query], axis=-1)

        value = nn.Dense(self.embed_dims, dtype=self.dtype,
                         kernel_init=xavier_uniform, name="value_proj")(
            value.reshape(B * nq_queue, Q, C))
        value = value.reshape(B * nq_queue, Q, H, head_dim)

        offsets = nn.Dense(
            nq_queue * H * L * P * 2, dtype=self.dtype,
            kernel_init=nn.initializers.zeros,
            bias_init=_const_bias_init(
                radial_offset_bias(H, L * nq_queue, P)),
            name="sampling_offsets")(query_aug)
        offsets = offsets.reshape(B, Q, H, nq_queue, L, P, 2)

        attn = nn.Dense(nq_queue * H * L * P, dtype=self.dtype,
                        kernel_init=nn.initializers.zeros,
                        bias_init=nn.initializers.zeros,
                        name="attention_weights")(query_aug)
        attn = attn.reshape(B, Q, H, nq_queue, L * P)
        attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1)
        attn = attn.reshape(B, Q, H, nq_queue, L, P)

        # queue-major batch: (B*2, Q, H, L, P[, 2])
        attn = jnp.transpose(attn, (0, 3, 1, 2, 4, 5)).reshape(
            B * nq_queue, Q, H, L, P)
        offsets = jnp.transpose(offsets, (0, 3, 1, 2, 4, 5, 6)).reshape(
            B * nq_queue, Q, H, L, P, 2)

        normalizer = jnp.asarray(
            [[w, h] for h, w in spatial_shapes], dtype=jnp.float32)
        ref = reference_points.reshape(B * nq_queue, Q, L, 2)
        loc = ref[:, :, None, :, None, :].astype(jnp.float32) + \
            offsets.astype(jnp.float32) / normalizer[None, None, None, :,
                                                     None, :]

        if self.cfg.msda_impl == "pallas":
            out = multi_scale_deformable_attention_pallas(
                value, spatial_shapes, loc, attn)        # (B*2, Q, C)
        elif Q > 8000 and Q % 8000 == 0:
            out = multi_scale_deformable_attention_chunked(
                value, spatial_shapes, loc, attn, chunk_size=8000)
        else:
            out = multi_scale_deformable_attention(
                value, spatial_shapes, loc, attn)        # (B*2, Q, C)
        out = out.reshape(B, nq_queue, Q, C).mean(axis=1)

        out = nn.Dense(self.embed_dims, dtype=self.dtype,
                       kernel_init=xavier_uniform, name="output_proj")(out)
        out = nn.Dropout(self.cfg.dropout)(out, deterministic=deterministic)
        return out + identity
