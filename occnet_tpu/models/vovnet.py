"""VoVNet (V2, OSA modules + eSE attention) alternative camera backbone.

Capability-parity equivalent of the reference's registered `VoVNet`
(`models/backbones/vovnet.py:11-89` spec presets, :169-374 module) — unused by
the shipped occ configs (they use ResNet-50) but part of the framework
surface.  NHWC flax implementation with frozen BN like the ResNet trunk.
"""

from __future__ import annotations

from typing import Dict, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from occnet_tpu.models.resnet import FrozenBatchNorm

# spec: (stem_chs, stage_conv_ch, stage_out_ch, layer_per_block,
#        block_per_stage, eSE)
VOVNET_SPECS: Dict[str, dict] = {
    "V-19-eSE": dict(stem=(64, 64, 128), conv=(128, 160, 192, 224),
                     out=(256, 512, 768, 1024), layers=3,
                     blocks=(1, 1, 1, 1), ese=True),
    "V-39-eSE": dict(stem=(64, 64, 128), conv=(128, 160, 192, 224),
                     out=(256, 512, 768, 1024), layers=5,
                     blocks=(1, 1, 2, 2), ese=True),
    "V-57-eSE": dict(stem=(64, 64, 128), conv=(128, 160, 192, 224),
                     out=(256, 512, 768, 1024), layers=5,
                     blocks=(1, 1, 4, 3), ese=True),
    "V-99-eSE": dict(stem=(64, 64, 128), conv=(128, 160, 192, 224),
                     out=(256, 512, 768, 1024), layers=5,
                     blocks=(1, 3, 9, 3), ese=True),
}


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
    ese: bool
    identity: bool
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        inp = x
        feats = [x]
        for i in range(self.layers):
            x = ConvBNRelu(self.conv_ch, dtype=self.dtype, name=f"l{i}")(x)
            feats.append(x)
        x = jnp.concatenate(feats, axis=-1)
        x = ConvBNRelu(self.out_ch, kernel=1, dtype=self.dtype,
                       name="concat")(x)
        if self.ese:
            x = eSEModule(self.out_ch, dtype=self.dtype, name="ese")(x)
        if self.identity:
            x = x + inp
        return x


class VoVNet(nn.Module):
    spec: str = "V-99-eSE"
    out_indices: Tuple[int, ...] = (1, 2, 3)   # stages 3..5 like ResNet C3-C5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> Sequence[jax.Array]:
        s = VOVNET_SPECS[self.spec]
        stem = s["stem"]
        x = ConvBNRelu(stem[0], stride=2, dtype=self.dtype, name="stem0")(x)
        x = ConvBNRelu(stem[1], stride=1, dtype=self.dtype, name="stem1")(x)
        x = ConvBNRelu(stem[2], stride=2, dtype=self.dtype, name="stem2")(x)

        outs = []
        for stage in range(4):
            if stage > 0:
                x = nn.max_pool(x, (3, 3), strides=(2, 2),
                                padding=[(1, 1), (1, 1)])
            for b in range(s["blocks"][stage]):
                x = OSABlock(
                    s["conv"][stage], s["out"][stage], s["layers"], s["ese"],
                    identity=(b > 0), dtype=self.dtype,
                    name=f"stage{stage + 2}_{b}")(x)
            if stage in self.out_indices:
                outs.append(x)
        return outs
