"""PerceptionTransformer: the object-query (detection) BEVFormer transformer.

Capability equivalent of the reference `PerceptionTransformer`
(`projects/mmdet3d_plugin/bevformer/modules/transformer.py:26-289`) — the
original BEVFormer 3D-detection transformer that the occ configs keep
registered but never invoke.  It composes the shared BEVFormer encoder with
the DETR3D object-query decoder:

- `get_bev_features` (ref :104-200): can-bus ego-motion BEV shift
  (ref :122-141 — `ops/transforms.shift_bev_ref`), prev-BEV rotation by
  `can_bus[-1]` degrees (ref :143-157 — `ops/transforms.rotate_bev`),
  can-bus embedding MLP added to the BEV queries (ref :158-162), camera/level
  embeddings + encoder (the flattened multi-level path, exact reference
  semantics).
- `__call__` (ref :203-289): `object_query_embed` split into
  (query_pos, query), 3D reference points = sigmoid(Linear(query_pos))
  (ref :76,272-274), decoder with per-layer regression branches refining
  (x, y) from code[..., :2] and z from code[..., 4:5]
  (`modules/decoder.py:105-121`); returns
  (bev_embed, inter_states, init_reference, inter_references).

The detection path always runs the exact-semantics gather encoder (the
reference has no dense analogue of this path); decoded boxes go through
`models/bbox.nms_free_decode`, training assignment through
`models/bbox.hungarian_assign_3d`.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from occnet_tpu.config import ModelConfig
from occnet_tpu.geometry import bev_reference_points_2d
from occnet_tpu.models.attention import xavier_uniform
from occnet_tpu.models.decoder import DetectionTransformerDecoder
from occnet_tpu.models.encoder import BEVFormerEncoder
from occnet_tpu.models.norm import LayerNorm32
from occnet_tpu.models.positional import LearnedPositionalEncoding2D
from occnet_tpu.ops.transforms import rotate_bev, shift_bev_ref


class CanBusMLP(nn.Module):
    """18-dim can-bus signal -> embed_dims (ref `transformer.py:77-85`):
    Linear -> ReLU -> Linear -> ReLU (-> LayerNorm when can_bus_norm)."""
    embed_dims: int
    can_bus_norm: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, can_bus: jax.Array) -> jax.Array:
        x = nn.Dense(self.embed_dims // 2, dtype=self.dtype,
                     kernel_init=xavier_uniform, name="fc1")(can_bus)
        x = nn.relu(x)
        x = nn.Dense(self.embed_dims, dtype=self.dtype,
                     kernel_init=xavier_uniform, name="fc2")(x)
        x = nn.relu(x)
        if self.can_bus_norm:
            x = LayerNorm32(out_dtype=self.dtype, name="norm")(x)
        return x


class RegBranch(nn.Module):
    """Per-decoder-layer box regression branch (BEVFormer head lineage):
    Linear -> ReLU -> Linear -> ReLU -> Linear(code_size)."""
    embed_dims: int
    code_size: int = 10

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = x.astype(jnp.float32)
        x = nn.relu(nn.Dense(self.embed_dims, name="fc1")(x))
        x = nn.relu(nn.Dense(self.embed_dims, name="fc2")(x))
        return nn.Dense(self.code_size, name="out")(x)


class PerceptionTransformer(nn.Module):
    cfg: ModelConfig
    num_query: int = 900
    code_size: int = 10
    decoder_layers: int = 6
    rotate_prev_bev: bool = True
    use_shift: bool = True
    use_can_bus: bool = True
    can_bus_norm: bool = True
    # None -> the actual grid centre (bev_w/2, bev_h/2).  The reference
    # hard-codes [100, 100] (`transformer.py:64`), correct only for its fixed
    # 200x200 grid; set explicitly for strict parity at other sizes.
    rotate_center: Optional[Tuple[float, float]] = None
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        c = self.cfg
        enc_cfg = c.encoder
        if enc_cfg.mode != "gather":
            # detection always uses exact reference semantics
            enc_cfg = dataclasses.replace(enc_cfg, mode="gather")
        self.level_embeds = self.param(
            "level_embeds", nn.initializers.normal(stddev=1.0),
            (c.num_feature_levels, c.embed_dims))
        self.cams_embeds = self.param(
            "cams_embeds", nn.initializers.normal(stddev=1.0),
            (c.num_cams, c.embed_dims))
        self.bev_embedding = self.param(
            "bev_embedding", nn.initializers.normal(stddev=1.0),
            (c.bev_h * c.bev_w, c.embed_dims))
        self.query_embedding = self.param(
            "query_embedding", nn.initializers.normal(stddev=1.0),
            (self.num_query, 2 * c.embed_dims))
        self.positional_encoding = LearnedPositionalEncoding2D(
            num_feats=c.embed_dims // 2, row_num_embed=c.bev_h,
            col_num_embed=c.bev_w, dtype=self.dtype)
        self.can_bus_mlp = CanBusMLP(c.embed_dims, self.can_bus_norm,
                                     dtype=self.dtype)
        # 3D reference-point init from the positional query half (ref :76)
        self.reference_points = nn.Dense(3, dtype=jnp.float32,
                                         kernel_init=xavier_uniform,
                                         name="reference_points")
        self.encoder = BEVFormerEncoder(
            enc_cfg, embed_dims=c.embed_dims, num_cams=c.num_cams,
            bev_h=c.bev_h, bev_w=c.bev_w, pc_range=c.pc_range,
            img_hw=(c.img_h, c.img_w), dtype=self.dtype, name="encoder")
        self.decoder = DetectionTransformerDecoder(
            num_layers=self.decoder_layers, embed_dims=c.embed_dims,
            ffn_dim=c.encoder.ffn_dim, dtype=self.dtype, name="decoder")
        self.reg_branches = [
            RegBranch(c.embed_dims, self.code_size, name=f"reg_branch{i}")
            for i in range(self.decoder_layers)]

    def flatten_mlvl_feats(self, mlvl_feats: Sequence[jax.Array]):
        """(B, cams, h, w, C) per level -> (B, cams, V, C) + shapes with
        camera/level embeddings (ref `transformer.py:166-184`)."""
        flat, shapes = [], []
        for lvl, feat in enumerate(mlvl_feats):
            b, n_cam, h, w, ch = feat.shape
            shapes.append((h, w))
            f = feat.reshape(b, n_cam, h * w, ch)
            f = f + self.cams_embeds[None, :, None, :].astype(f.dtype)
            f = f + self.level_embeds[None, None, None, lvl].astype(f.dtype)
            flat.append(f)
        return jnp.concatenate(flat, axis=2), tuple(shapes)

    def get_bev_features(
        self,
        mlvl_feats: Sequence[jax.Array],
        ego2img: jax.Array,                 # (B, cams, 4, 4)
        can_bus: Optional[jax.Array] = None,   # (B, 18)
        prev_bev: Optional[jax.Array] = None,  # (B, Q, C)
        *,
        deterministic: bool = True,
    ) -> jax.Array:
        c = self.cfg
        b = mlvl_feats[0].shape[0]
        queries = jnp.broadcast_to(
            self.bev_embedding[None],
            (b,) + self.bev_embedding.shape).astype(self.dtype)
        bev_pos = self.positional_encoding(b)

        if (prev_bev is not None and can_bus is None
                and (self.rotate_prev_bev or self.use_shift)):
            # Silently skipping the alignment would feed an unrotated /
            # unshifted prev map into temporal attention (ADVICE r2); the
            # reference always has can_bus in img_metas so it cannot hit
            # this state.
            raise ValueError(
                "prev_bev requires can_bus when rotate_prev_bev/use_shift "
                "are enabled (pass can_bus, or disable both for "
                "pre-aligned prev maps)")
        shift_ref_2d = None
        if can_bus is not None:
            cb = can_bus.astype(jnp.float32)
            if self.use_shift:
                # grid_length = metres/cell (ref config grid_length; here
                # derived from pc_range / bev size)
                gl_y = (c.pc_range[4] - c.pc_range[1]) / c.bev_h
                gl_x = (c.pc_range[3] - c.pc_range[0]) / c.bev_w
                # ref :126-129: ego_angle = can_bus[-2] (rad) in degrees
                shift = jax.vmap(lambda s: shift_bev_ref(
                    s[:2], s[-2] / jnp.pi * 180.0, (gl_y, gl_x),
                    (c.bev_h, c.bev_w)))(cb)          # (B, 2) = (x, y)
                ref_2d = bev_reference_points_2d(c.bev_h, c.bev_w)
                shift_ref_2d = (ref_2d[None] +
                                shift[:, None, None, :])   # (B, Q, 1, 2)
            if prev_bev is not None and self.rotate_prev_bev:
                # ref :143-157: rotate each prev map by can_bus[-1] degrees
                maps = prev_bev.reshape(b, c.bev_h, c.bev_w, c.embed_dims)
                center = (self.rotate_center if self.rotate_center is not None
                          else (c.bev_w / 2.0, c.bev_h / 2.0))
                maps = jax.vmap(
                    lambda m, a: rotate_bev(m, a, center=center)
                )(maps, cb[:, -1])
                prev_bev = maps.reshape(b, c.bev_h * c.bev_w, c.embed_dims)
            if self.use_can_bus:
                queries = queries + self.can_bus_mlp(cb)[:, None, :].astype(
                    queries.dtype)

        value, shapes = self.flatten_mlvl_feats(mlvl_feats)
        return self.encoder(queries, value, bev_pos, ego2img, shapes,
                            prev_bev=prev_bev, shift_ref_2d=shift_ref_2d,
                            deterministic=deterministic)

    def __call__(
        self,
        mlvl_feats: Sequence[jax.Array],
        ego2img: jax.Array,
        can_bus: Optional[jax.Array] = None,
        prev_bev: Optional[jax.Array] = None,
        *,
        deterministic: bool = True,
    ):
        c = self.cfg
        b = mlvl_feats[0].shape[0]
        bev_embed = self.get_bev_features(
            mlvl_feats, ego2img, can_bus=can_bus, prev_bev=prev_bev,
            deterministic=deterministic)

        query_pos, query = jnp.split(self.query_embedding, 2, axis=1)
        query_pos = jnp.broadcast_to(
            query_pos[None], (b,) + query_pos.shape).astype(self.dtype)
        query = jnp.broadcast_to(
            query[None], (b,) + query.shape).astype(self.dtype)
        ref = jax.nn.sigmoid(
            self.reference_points(query_pos.astype(jnp.float32)))
        init_reference = ref

        inter_states, inter_references = self.decoder(
            query, bev_embed, query_pos, ref, [(c.bev_h, c.bev_w)],
            reg_branches=self.reg_branches, deterministic=deterministic)
        return bev_embed, inter_states, init_reference, inter_references
