"""OccNet: the top-level camera-to-occupancy model.

Equivalent of the reference `BEVFormerOcc` detector (`bevformer_occ.py:
20-270`): grid-mask augmentation -> image backbone -> FPN neck -> OccHead.
The train/test forward split and the history-BEV path are driven by flags
instead of mmcv's return_loss dispatch.
"""

from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from occnet_tpu.config import ModelConfig
from occnet_tpu.models.fpn import FPN
from occnet_tpu.models.head import OccHead
from occnet_tpu.models.resnet import ResNet
from occnet_tpu.models.vovnet import VoVNet
from occnet_tpu.ops.grid_mask import grid_mask


class OccNet(nn.Module):
    cfg: ModelConfig

    @property
    def dtype(self):
        return jnp.dtype(self.cfg.compute_dtype)

    def setup(self):
        c = self.cfg
        if c.backbone.type == "vovnet":
            self.backbone = VoVNet(
                spec=c.backbone.vovnet_spec,
                out_indices=c.backbone.out_indices,
                frozen_stages=c.backbone.frozen_stages, dtype=self.dtype,
                name="backbone")
        else:
            depth = int(c.backbone.type.replace("resnet", ""))
            self.backbone = ResNet(
                depth=depth, out_indices=c.backbone.out_indices,
                frozen_stages=c.backbone.frozen_stages,
                dcn_stages=c.backbone.dcn_stages,
                dcn_mode=c.backbone.dcn_mode,
                dcn_window_radius=c.backbone.dcn_window_radius,
                dcn_window_radii=tuple(c.backbone.dcn_window_radii),
                norm_eval=c.backbone.norm_eval,
                dtype=self.dtype, name="backbone")
        # FPN channels are coupled to the transformer width (the reference's
        # `_dim_` ties them, config :36,61).
        self.neck = FPN(out_channels=c.embed_dims,
                        num_outs=c.neck.num_outs,
                        relu_before_extra_convs=c.neck.relu_before_extra_convs,
                        dtype=self.dtype, name="neck")
        self.head = OccHead(c, dtype=self.dtype, name="head")

    def extract_img_feat(
        self, img: jax.Array, *, train: bool = False,
    ) -> Sequence[jax.Array]:
        """(B, cams, H, W, 3) -> list of (B, cams, h, w, C) FPN levels
        (`bevformer_occ.py:66-99`)."""
        b, n_cam, h, w, ch = img.shape
        x = img.reshape(b * n_cam, h, w, ch).astype(self.dtype)
        if train and self.cfg.use_grid_mask:
            x = grid_mask(self.make_rng("grid_mask"), x,
                          prob=self.cfg.grid_mask_prob)
        feats = (self.backbone(x, train=train)
                 if isinstance(self.backbone, ResNet) else self.backbone(x))
        feats = self.neck(feats)
        return [f.reshape(b, n_cam, *f.shape[1:]) for f in feats]

    def __call__(
        self,
        img: jax.Array,                 # (B, cams, H, W, 3) normalised
        ego2img: jax.Array,             # (B, cams, 4, 4)
        prev_bev: Optional[jax.Array] = None,
        shift_ref_2d: Optional[jax.Array] = None,
        *,
        only_bev: bool = False,
        train: bool = False,
    ):
        feats = self.extract_img_feat(img, train=train)
        return self.head(
            feats, ego2img, prev_bev=prev_bev, shift_ref_2d=shift_ref_2d,
            only_bev=only_bev, train=train, deterministic=not train)
