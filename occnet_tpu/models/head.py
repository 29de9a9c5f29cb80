"""BEVFormerOccHead: BEV query embedding + positional encoding + transformer,
plus the occupancy/flow losses and the argmax decode.

Equivalent of the reference `BEVFormerOccHead` (`bevformer_occ_head.py:
32-216`): owns the (bev_h*bev_w, embed_dims) query table (:87-89), a learned
2D positional encoding (config `bevformer_base_occ.py:130-135`), delegates to
TransformerOcc, and computes CE(occ) + L1(flow) (:181-196) / softmax-argmax
decode (:198-216).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from occnet_tpu.config import LossConfig, ModelConfig
from occnet_tpu.models.positional import LearnedPositionalEncoding2D
from occnet_tpu.models.transformer_occ import TransformerOcc


class OccHead(nn.Module):
    cfg: ModelConfig
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        c = self.cfg
        self.bev_embedding = self.param(
            "bev_embedding", nn.initializers.normal(stddev=1.0),
            (c.bev_h * c.bev_w, c.embed_dims))
        self.positional_encoding = LearnedPositionalEncoding2D(
            num_feats=c.embed_dims // 2, row_num_embed=c.bev_h,
            col_num_embed=c.bev_w, dtype=self.dtype,
            name="positional_encoding")
        self.transformer = TransformerOcc(c, dtype=self.dtype,
                                          name="transformer")

    def __call__(
        self,
        mlvl_feats: Sequence[jax.Array],
        ego2img: jax.Array,
        prev_bev: Optional[jax.Array] = None,
        shift_ref_2d: Optional[jax.Array] = None,
        *,
        only_bev: bool = False,
        train: bool = False,
        deterministic: bool = True,
    ):
        b = mlvl_feats[0].shape[0]
        bev_pos = self.positional_encoding(b)
        if only_bev:
            # History-BEV extraction path (`bevformer_occ_head.py:125-136`).
            return self.transformer.get_bev_features(
                mlvl_feats, self.bev_embedding, bev_pos, ego2img,
                prev_bev=prev_bev, shift_ref_2d=shift_ref_2d,
                deterministic=deterministic)
        bev_embed, occ, flow = self.transformer(
            mlvl_feats, self.bev_embedding, bev_pos, ego2img,
            prev_bev=prev_bev, shift_ref_2d=shift_ref_2d, train=train,
            deterministic=deterministic)
        return {"bev_embed": bev_embed, "occ": occ, "flow": flow}


def occ_flow_loss(
    occ_logits: jax.Array,        # (B, X, Y, Z, num_classes)
    flow_pred: jax.Array,         # (B, X, Y, Z, 2)
    voxel_semantics: jax.Array,   # (B, X, Y, Z) int
    voxel_flow: jax.Array,        # (B, X, Y, Z, 2)
    loss_cfg: LossConfig,
    mask_camera: Optional[jax.Array] = None,
) -> Tuple[jax.Array, jax.Array]:
    """CE over 640k voxels (mean) + L1 flow (mean over elements), weights 1.0 /
    0.25 (`bevformer_base_occ.py:84-88`, `bevformer_occ_head.py:181-196`).

    All loss math fp32 (the reference decorates loss with force_fp32).
    """
    num_classes = occ_logits.shape[-1]
    logits = occ_logits.astype(jnp.float32).reshape(-1, num_classes)
    labels = voxel_semantics.astype(jnp.int32).reshape(-1)
    logp = jax.nn.log_softmax(logits, axis=-1)
    ce = -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]

    l1 = jnp.abs(flow_pred.astype(jnp.float32) -
                 voxel_flow.astype(jnp.float32))

    # Deviation (documented in ROADMAP.md): the reference's use_mask=True
    # branch never assigns loss_flow (`bevformer_occ_head.py:184-190`, a
    # latent UnboundLocalError — dead code, configs ship use_mask=False);
    # this implements the evidently-intended masked flow L1.
    # Weighted CE uses the *torch F.cross_entropy* reduction (per-voxel loss
    # scaled by weight[label], mean normalised by sum of applied weights) —
    # deliberately NOT mmdet's `CrossEntropyLoss(class_weight=...)`, whose
    # weight_reduce_loss divides by numel.  The shipped reference configs use
    # unweighted CE (the () default) where the two agree; if a reference
    # config with class_weight is ever ported, port the reduction too.
    if loss_cfg.class_weights:
        assert len(loss_cfg.class_weights) == num_classes, (
            f"class_weights has {len(loss_cfg.class_weights)} entries for "
            f"{num_classes} classes (jnp gather would silently clamp)")
        cw = jnp.asarray(loss_cfg.class_weights, jnp.float32)
        w = cw[labels]
    else:
        w = None
    def flow_mean(extra_mask=None):
        """Weighted flow L1 mean: flow_fg_weight on voxels whose GT label
        is a flow class (< 8), optional camera mask on top."""
        l1f = l1.reshape(-1, 2)
        if loss_cfg.flow_fg_weight == 1.0 and extra_mask is None:
            return l1f.mean()
        fw = jnp.where(labels < 8, loss_cfg.flow_fg_weight, 1.0)
        if extra_mask is not None:
            fw = fw * extra_mask
        return ((l1f * fw[:, None]).sum()
                / jnp.maximum(fw.sum() * 2.0, 1e-6))

    if loss_cfg.use_mask and mask_camera is not None:
        m = mask_camera.reshape(-1).astype(jnp.float32)
        wm = m if w is None else w * m
        loss_occ = (ce * wm).sum() / jnp.maximum(wm.sum(), 1e-6)
        loss_flow = flow_mean(m)
    elif w is not None:
        loss_occ = (ce * w).sum() / jnp.maximum(w.sum(), 1e-6)
        loss_flow = flow_mean()
    else:
        loss_occ = ce.mean()
        loss_flow = flow_mean()
    return loss_cfg.occ_weight * loss_occ, loss_cfg.flow_weight * loss_flow


def get_occ(outs: dict) -> Tuple[jax.Array, jax.Array]:
    """Softmax-argmax semantic decode + raw flow
    (`bevformer_occ_head.py:198-216`)."""
    occ = jnp.argmax(outs["occ"].astype(jnp.float32), axis=-1)
    return occ, outs["flow"]
