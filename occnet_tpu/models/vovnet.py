"""VoVNet (V2, OSA modules + eSE attention) alternative camera backbone.

Capability-parity equivalent of the reference's registered `VoVNet`
(`models/backbones/vovnet.py:10-89` spec presets, :169-374 module) — unused by
the shipped occ configs (they use ResNet-50) but part of the framework
surface.  NHWC flax implementation, faithful to the reference in:

- all 7 spec presets including the slim and depthwise (`dw`) variants;
- depthwise OSA blocks: optional 1x1 reduction when in_ch != stage_ch
  (:189-194), per-layer depthwise 3x3 WITHOUT norm/activation followed by a
  pointwise 1x1 + BN + ReLU (`dw_conv3x3`, :92-113);
- eSE applied in EVERY block — the reference constructs `eSEModule`
  unconditionally and ignores the stage-level SE flag (:229, :247-249);
- identity residual on every non-first block of a stage (:252-263);
- stage pooling = max-pool 3x3 stride 2 with *ceil_mode* (:240): bottom/right
  -inf padding only where needed, not symmetric padding;
- `frozen_stages` / `norm_eval` control (:317-319, :355-374): BN always uses
  running stats (FrozenBatchNorm); frozen stages contribute no gradient
  (stop_gradient on their activations, like the ResNet trunk).

torch checkpoints convert via `utils.torch_convert.load_vovnet_into_variables`.
"""

from __future__ import annotations

from typing import Dict, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from occnet_tpu.models.resnet import FrozenBatchNorm

# Spec table mirroring the reference `_STAGE_SPECS` (vovnet.py:10-89):
# stem channels, per-stage conv/out channels, layers per block, blocks per
# stage, depthwise flag.  (eSE is True for every preset and is applied
# unconditionally, see module docstring.)
VOVNET_SPECS: Dict[str, dict] = {
    "V-19-slim-dw-eSE": dict(stem=(64, 64, 64), conv=(64, 80, 96, 112),
                             out=(112, 256, 384, 512), layers=3,
                             blocks=(1, 1, 1, 1), dw=True),
    "V-19-dw-eSE": dict(stem=(64, 64, 64), conv=(128, 160, 192, 224),
                        out=(256, 512, 768, 1024), layers=3,
                        blocks=(1, 1, 1, 1), dw=True),
    "V-19-slim-eSE": dict(stem=(64, 64, 128), conv=(64, 80, 96, 112),
                          out=(112, 256, 384, 512), layers=3,
                          blocks=(1, 1, 1, 1), dw=False),
    "V-19-eSE": dict(stem=(64, 64, 128), conv=(128, 160, 192, 224),
                     out=(256, 512, 768, 1024), layers=3,
                     blocks=(1, 1, 1, 1), dw=False),
    "V-39-eSE": dict(stem=(64, 64, 128), conv=(128, 160, 192, 224),
                     out=(256, 512, 768, 1024), layers=5,
                     blocks=(1, 1, 2, 2), dw=False),
    "V-57-eSE": dict(stem=(64, 64, 128), conv=(128, 160, 192, 224),
                     out=(256, 512, 768, 1024), layers=5,
                     blocks=(1, 1, 4, 3), dw=False),
    "V-99-eSE": dict(stem=(64, 64, 128), conv=(128, 160, 192, 224),
                     out=(256, 512, 768, 1024), layers=5,
                     blocks=(1, 3, 9, 3), dw=False),
}


def _ceil_maxpool(x: jax.Array) -> jax.Array:
    """3x3/stride-2 max-pool with torch ceil_mode=True semantics: the last
    window may hang off the bottom/right edge (covered by -inf padding);
    no leading padding."""
    pads = []
    for d in (1, 2):
        n = x.shape[d]
        out = -(-(n - 3) // 2) + 1               # ceil((n-3)/2) + 1
        pads.append((0, max(0, (out - 1) * 2 + 3 - n)))
    return nn.max_pool(x, (3, 3), strides=(2, 2), padding=tuple(pads))


class ConvBNRelu(nn.Module):
    features: int
    kernel: int = 3
    stride: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        p = self.kernel // 2
        x = nn.Conv(self.features, (self.kernel, self.kernel),
                    strides=(self.stride, self.stride),
                    padding=[(p, p)] * 2, use_bias=False, dtype=self.dtype,
                    kernel_init=nn.initializers.he_normal(), name="conv")(x)
        x = FrozenBatchNorm(self.features, dtype=self.dtype, name="bn")(x)
        return nn.relu(x)


class DWConvBNRelu(nn.Module):
    """Depthwise 3x3 (no norm/act) -> pointwise 1x1 + BN + ReLU — the
    reference `dw_conv3x3` block (vovnet.py:92-113).  Requires in == out
    channels (depthwise)."""
    features: int
    stride: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        assert x.shape[-1] == self.features, "depthwise needs in == out"
        x = nn.Conv(self.features, (3, 3),
                    strides=(self.stride, self.stride),
                    padding=[(1, 1)] * 2, feature_group_count=self.features,
                    use_bias=False, dtype=self.dtype,
                    kernel_init=nn.initializers.he_normal(),
                    name="dw_conv")(x)
        x = nn.Conv(self.features, (1, 1), use_bias=False, dtype=self.dtype,
                    kernel_init=nn.initializers.he_normal(),
                    name="pw_conv")(x)
        x = FrozenBatchNorm(self.features, dtype=self.dtype, name="pw_bn")(x)
        return nn.relu(x)


class eSEModule(nn.Module):
    """Effective squeeze-excite: GAP -> 1x1 conv -> hsigmoid gate."""
    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        gap = x.mean(axis=(1, 2), keepdims=True)
        gate = nn.Conv(self.features, (1, 1), dtype=self.dtype,
                       name="fc")(gap)
        gate = jnp.clip(gate + 3.0, 0.0, 6.0) / 6.0     # hard sigmoid
        return x * gate


class OSABlock(nn.Module):
    conv_ch: int
    out_ch: int
    layers: int
    identity: bool
    dw: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        inp = x
        feats = [x]
        if self.dw and x.shape[-1] != self.conv_ch:
            # `conv_reduction` (vovnet.py:189-194): depthwise layers need
            # in == stage_ch, so reduce once up front
            x = ConvBNRelu(self.conv_ch, kernel=1, dtype=self.dtype,
                           name="reduction")(x)
        for i in range(self.layers):
            layer = (DWConvBNRelu(self.conv_ch, dtype=self.dtype,
                                  name=f"l{i}") if self.dw else
                     ConvBNRelu(self.conv_ch, dtype=self.dtype,
                                name=f"l{i}"))
            x = layer(x)
            feats.append(x)
        x = jnp.concatenate(feats, axis=-1)
        x = ConvBNRelu(self.out_ch, kernel=1, dtype=self.dtype,
                       name="concat")(x)
        x = eSEModule(self.out_ch, dtype=self.dtype, name="ese")(x)
        if self.identity:
            x = x + inp
        return x


class VoVNet(nn.Module):
    spec: str = "V-99-eSE"
    out_indices: Tuple[int, ...] = (1, 2, 3)   # stages 3..5 like ResNet C3-C5
    # -1 = nothing frozen; 0 = stem; k>=1 additionally freezes stages 2..k+1
    # (the reference's `frozen_stages`, vovnet.py:355-364)
    frozen_stages: int = -1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> Sequence[jax.Array]:
        s = VOVNET_SPECS[self.spec]
        stem = s["stem"]
        dw = s["dw"]
        x = ConvBNRelu(stem[0], stride=2, dtype=self.dtype, name="stem0")(x)
        if dw:
            x = DWConvBNRelu(stem[1], stride=1, dtype=self.dtype,
                             name="stem1")(x)
            x = DWConvBNRelu(stem[2], stride=2, dtype=self.dtype,
                             name="stem2")(x)
        else:
            x = ConvBNRelu(stem[1], stride=1, dtype=self.dtype,
                           name="stem1")(x)
            x = ConvBNRelu(stem[2], stride=2, dtype=self.dtype,
                           name="stem2")(x)
        if self.frozen_stages >= 0:
            x = jax.lax.stop_gradient(x)

        outs = []
        for stage in range(4):
            if stage > 0:
                x = _ceil_maxpool(x)
            for b in range(s["blocks"][stage]):
                x = OSABlock(
                    s["conv"][stage], s["out"][stage], s["layers"],
                    identity=(b > 0), dw=dw, dtype=self.dtype,
                    name=f"stage{stage + 2}_{b}")(x)
            if stage + 1 <= self.frozen_stages:
                x = jax.lax.stop_gradient(x)
            if stage in self.out_indices:
                outs.append(x)
        return outs
