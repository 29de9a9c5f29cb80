"""TransformerOcc: BEV feature extraction + voxel decode + occ/flow heads.

Equivalent of the reference `TransformerOcc` (`transformer_occ.py:26-321`,
use_3d=True configuration): flattens the 4-level x 6-camera feature pyramid
with camera/level embeddings (:207-220), runs the BEVFormer encoder, reshapes
the 256-channel BEV map into (16 middle-dims x 16 z-pillars) voxels, applies a
2x Conv3d(+BN3d+ReLU) decoder (:106-131), and predicts per-voxel 17-class
logits (`predicter`, :132-136) and 2-channel flow (`flow_predicter`,
:137-141).

Output grid layout is (B, X, Y, Z, .) — matching the reference's
`outputs.permute(0, 4, 3, 2, 1)` (:308) so that flattened predictions align
with the `labels.npz` ground-truth layout and the ray-metric indexing
(`ray_metrics.py:49-60`).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from occnet_tpu.config import ModelConfig
from occnet_tpu.models.attention import xavier_uniform
from occnet_tpu.models.encoder import BEVFormerEncoder


class ConvBNReLU3D(nn.Module):
    """Conv3d(3x3x3, no bias) + BatchNorm3d + ReLU on NDHWC tensors — one
    ConvModule of the reference's voxel decoder (`transformer_occ.py:110-131`).
    """
    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, *, train: bool = False) -> jax.Array:
        x = nn.Conv(self.features, (3, 3, 3), padding=[(1, 1)] * 3,
                    use_bias=False, dtype=self.dtype,
                    kernel_init=xavier_uniform, name="conv")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=jnp.float32, name="bn")(x)
        return nn.relu(x).astype(self.dtype)


class MLPHead(nn.Module):
    """Linear -> activation -> Linear voxel predicter
    (`transformer_occ.py:132-141`)."""
    hidden: int
    out: int
    activation: str = "softplus"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = nn.Dense(self.hidden, dtype=self.dtype,
                     kernel_init=xavier_uniform, name="fc1")(x)
        x = jax.nn.softplus(x) if self.activation == "softplus" else nn.relu(x)
        return nn.Dense(self.out, dtype=self.dtype,
                        kernel_init=xavier_uniform, name="fc2")(x)


class TransformerOcc(nn.Module):
    cfg: ModelConfig
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        c = self.cfg
        self.level_embeds = self.param(
            "level_embeds", nn.initializers.normal(stddev=1.0),
            (c.num_feature_levels, c.embed_dims))
        self.cams_embeds = self.param(
            "cams_embeds", nn.initializers.normal(stddev=1.0),
            (c.num_cams, c.embed_dims))
        self.encoder = BEVFormerEncoder(
            c.encoder, embed_dims=c.embed_dims, num_cams=c.num_cams,
            bev_h=c.bev_h, bev_w=c.bev_w, pc_range=c.pc_range,
            img_hw=(c.img_h, c.img_w), bev_shard_axis=c.bev_shard_axis,
            dtype=self.dtype, name="encoder")
        if c.encoder.mode == "dense":
            # shared pre-lift value projection (dense mode; layer-shared by
            # design — the gather path keeps the reference's per-layer proj)
            import flax.linen as fnn
            self.shared_value_proj = fnn.Dense(
                c.embed_dims, dtype=self.dtype,
                kernel_init=xavier_uniform, name="shared_value_proj")
        self.decoder0 = ConvBNReLU3D(c.out_dim, dtype=self.dtype)
        self.decoder1 = ConvBNReLU3D(c.out_dim, dtype=self.dtype)
        self.predicter = MLPHead(c.out_dim * 2, c.num_classes, "softplus",
                                 dtype=self.dtype)
        self.flow_predicter = MLPHead(c.out_dim * 2, 2, "relu",
                                      dtype=self.dtype)

    def flatten_mlvl_feats(
        self, mlvl_feats: Sequence[jax.Array],
    ) -> Tuple[jax.Array, Tuple[Tuple[int, int], ...]]:
        """(B, cams, h, w, C) per level -> (B, cams, V, C) + static shapes,
        with camera and level embeddings added (`transformer_occ.py:207-224`).
        """
        flat = []
        shapes = []
        for lvl, feat in enumerate(mlvl_feats):
            b, n_cam, h, w, ch = feat.shape
            shapes.append((h, w))
            f = feat.reshape(b, n_cam, h * w, ch)
            if self.cfg.use_cams_embeds:
                f = f + self.cams_embeds[None, :, None, :].astype(f.dtype)
            f = f + self.level_embeds[None, None, None, lvl].astype(f.dtype)
            flat.append(f)
        return jnp.concatenate(flat, axis=2), tuple(shapes)

    def get_bev_features(
        self,
        mlvl_feats: Sequence[jax.Array],
        bev_queries: jax.Array,        # (Q, C) embedding table
        bev_pos: jax.Array,            # (B, Q, C)
        ego2img: jax.Array,            # (B, cams, 4, 4)
        prev_bev: Optional[jax.Array] = None,
        shift_ref_2d: Optional[jax.Array] = None,
        *,
        deterministic: bool = True,
    ) -> jax.Array:
        b = mlvl_feats[0].shape[0]
        c = self.cfg
        if c.encoder.mode == "dense":
            # TPU-native fast path: shared value projection on the (small)
            # camera feature maps, then the gather-free planar lift.  The
            # projection commutes with the (channel-linear) warp, so applying
            # it pre-lift is exact and ~40x cheaper than post-lift.
            impl = c.encoder.lift_impl
            if impl == "auto":
                impl = ("pallas" if jax.default_backend() == "tpu"
                        else "einsum")
            if impl == "pallas":
                from occnet_tpu.ops.lift_pallas import (
                    lift_and_average_pallas as lift_fn)
            else:
                from occnet_tpu.ops.planar_lift import (
                    lift_and_average as lift_fn)
            feats = [self.shared_value_proj(f) for f in self.flat_embed(
                mlvl_feats)]
            value, _count = lift_fn(
                feats, ego2img, c.pc_range, c.encoder.num_points_in_pillar,
                (c.bev_h, c.bev_w), (c.img_h, c.img_w),
                out_dtype=self.dtype)
            shapes = ()
        else:
            value, shapes = self.flatten_mlvl_feats(mlvl_feats)
        queries = jnp.broadcast_to(
            bev_queries[None], (b,) + bev_queries.shape).astype(self.dtype)
        return self.encoder(
            queries, value, bev_pos, ego2img, shapes, prev_bev=prev_bev,
            shift_ref_2d=shift_ref_2d, deterministic=deterministic)

    def flat_embed(self, mlvl_feats: Sequence[jax.Array]):
        """Camera/level embeddings on the unflattened maps (dense mode)."""
        out = []
        for lvl, feat in enumerate(mlvl_feats):
            f = feat
            if self.cfg.use_cams_embeds:
                f = f + self.cams_embeds[None, :, None, None, :].astype(
                    f.dtype)
            f = f + self.level_embeds[None, None, None, None, lvl].astype(
                f.dtype)
            out.append(f)
        return out

    def decode_voxels(self, bev_embed: jax.Array, *, train: bool = False):
        """(B, Q, C) BEV -> (B, X, Y, Z, out_dim) voxel features via the
        3D-conv cascade (`transformer_occ.py:306-308`)."""
        c = self.cfg
        b = bev_embed.shape[0]
        middle = c.embed_dims // c.pillar_h
        # Barrier: without it XLA fuses the final encoder LayerNorm's backward
        # reduce with the channel-splitting reshape below, and this libtpu AOT
        # mis-assigns the reduce layout ("expected f32[middle,pillar], actual
        # transposed").  See models/norm.py.
        bev_embed = jax.lax.optimization_barrier(bev_embed)
        # (B, H, W, C) with C = middle-major x pillar (torch channel split
        # view(bs, middle, pillar, H, W) from a (bs, C, H, W) map).
        x = bev_embed.reshape(b, c.bev_h, c.bev_w, middle, c.pillar_h)
        # -> NDHWC with D = z (pillar): (B, Z, H, W, middle)
        x = jnp.transpose(x, (0, 4, 1, 2, 3))
        x = self.decoder0(x, train=train)
        x = self.decoder1(x, train=train)
        # (B, Z, H, W, C') -> (B, X=W, Y=H, Z, C')  (torch permute(0,4,3,2,1))
        return jnp.transpose(x, (0, 3, 2, 1, 4))

    def __call__(
        self,
        mlvl_feats: Sequence[jax.Array],
        bev_queries: jax.Array,
        bev_pos: jax.Array,
        ego2img: jax.Array,
        prev_bev: Optional[jax.Array] = None,
        shift_ref_2d: Optional[jax.Array] = None,
        *,
        train: bool = False,
        deterministic: bool = True,
    ):
        bev_embed = self.get_bev_features(
            mlvl_feats, bev_queries, bev_pos, ego2img, prev_bev=prev_bev,
            shift_ref_2d=shift_ref_2d, deterministic=deterministic)
        vox = self.decode_voxels(bev_embed, train=train)
        occ = self.predicter(vox)
        flow = self.flow_predicter(vox)
        return bev_embed, occ, flow
