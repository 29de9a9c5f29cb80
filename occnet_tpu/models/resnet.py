"""ResNet image backbone (flax.linen, NHWC, bf16-friendly).

TPU-native equivalent of the reference's mmdet `ResNet` backbone config
(`projects/configs/bevformer/bevformer_base_occ.py:48-58`): depth-50,
out_indices (1,2,3) -> C3/C4/C5, `frozen_stages=1` (stem + stage 1 get no
gradient), `norm_eval=True` (all BN uses running statistics — implemented as
`FrozenBatchNorm`, whose mean/var live in the non-trainable `batch_stats`
collection), "pytorch style" (stride on the 3x3 conv of each bottleneck, as in
torchvision), so torchvision resnet50/101 checkpoints convert 1:1
(`occnet_tpu.utils.torch_convert`).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

STAGE_BLOCKS = {
    50: (3, 4, 6, 3),
    101: (3, 4, 23, 3),
}


def dcn_layer_indices(depth: int, dcn_stages: Sequence[bool]) -> dict:
    """{block module name -> flat DCN-layer index} over every DCN block in
    definition order — the indexing contract of `dcn_window_radii` (the
    per-layer window radii; tools/test.py's auto-radius probe maps sown
    `dcn_radius_needed` intermediates back through this)."""
    out = {}
    idx = 0
    for stage, n in enumerate(STAGE_BLOCKS[depth]):
        if not dcn_stages[stage]:
            continue
        for b in range(n):
            out[f"layer{stage + 1}_{b}"] = idx
            idx += 1
    return out


class FrozenBatchNorm(nn.Module):
    """BatchNorm that always normalises with stored running statistics
    (the `norm_eval=True` semantics of the reference backbone).  gamma/beta
    remain trainable parameters; mean/var are fixed `batch_stats`."""
    features: int
    eps: float = 1e-5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        mean = self.variable(
            "batch_stats", "mean",
            lambda: jnp.zeros((self.features,), jnp.float32)).value
        var = self.variable(
            "batch_stats", "var",
            lambda: jnp.ones((self.features,), jnp.float32)).value
        # Fold into a single multiply-add (fp32 stats, compute dtype output).
        mul = (scale * jax.lax.rsqrt(var + self.eps)).astype(self.dtype)
        add = (bias - mean * scale * jax.lax.rsqrt(var + self.eps)).astype(
            self.dtype)
        return x * mul + add


class TrainableBatchNorm(nn.Module):
    """Standard BatchNorm (batch statistics in training, running averages in
    eval, torch momentum 0.1) with the SAME param/stat names as
    `FrozenBatchNorm`, so the two are checkpoint-compatible.  Used when the
    backbone config sets `norm_eval=False` — essential when training FROM
    SCRATCH (no ImageNet checkpoint): frozen identity statistics leave a
    50-layer trunk with no real normalisation."""
    features: int
    eps: float = 1e-5
    momentum: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        ra_mean = self.variable(
            "batch_stats", "mean",
            lambda: jnp.zeros((self.features,), jnp.float32))
        ra_var = self.variable(
            "batch_stats", "var",
            lambda: jnp.ones((self.features,), jnp.float32))
        if train:
            xf = x.astype(jnp.float32).reshape(-1, self.features)
            mean = xf.mean(axis=0)
            var = xf.var(axis=0)
            if not self.is_initializing():
                m = self.momentum
                ra_mean.value = (1 - m) * ra_mean.value + m * mean
                ra_var.value = (1 - m) * ra_var.value + m * var
        else:
            mean, var = ra_mean.value, ra_var.value
        mul = (scale * jax.lax.rsqrt(var + self.eps)).astype(self.dtype)
        add = (bias - mean * scale * jax.lax.rsqrt(var + self.eps)).astype(
            self.dtype)
        return x * mul + add


class Bottleneck(nn.Module):
    """1x1 -> 3x3(stride) -> 1x1 bottleneck with identity/projection shortcut
    ("pytorch style": stride on the middle conv, like torchvision).  With
    `dcn=True` the 3x3 becomes a modulated deformable conv (DCNv2) — the
    R101-DCN backbone variant of the BEVFormer/OccNet lineage."""
    mid: int
    stride: int = 1
    dcn: bool = False
    dcn_mode: str = "gather"
    dcn_window_radius: int = 3
    norm_eval: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        out_ch = self.mid * 4
        conv = lambda f, k, s, name: nn.Conv(  # noqa: E731
            f, (k, k), strides=(s, s), padding=[(k // 2, k // 2)] * 2,
            use_bias=False, dtype=self.dtype, name=name,
            kernel_init=nn.initializers.he_normal())

        def bn(y, feat, name):
            if self.norm_eval:
                return FrozenBatchNorm(feat, dtype=self.dtype, name=name)(y)
            return TrainableBatchNorm(feat, dtype=self.dtype, name=name)(
                y, train=train)

        identity = x
        y = conv(self.mid, 1, 1, "conv1")(x)
        y = bn(y, self.mid, "bn1")
        y = nn.relu(y)
        if self.dcn:
            from occnet_tpu.ops.deform_conv import ModulatedDeformConv
            y = ModulatedDeformConv(self.mid, kernel=3, stride=self.stride,
                                    mode=self.dcn_mode,
                                    window_radius=self.dcn_window_radius,
                                    dtype=self.dtype, name="conv2")(y)
        else:
            y = conv(self.mid, 3, self.stride, "conv2")(y)
        y = bn(y, self.mid, "bn2")
        y = nn.relu(y)
        y = conv(out_ch, 1, 1, "conv3")(y)
        y = bn(y, out_ch, "bn3")
        if identity.shape[-1] != out_ch or self.stride != 1:
            identity = conv(out_ch, 1, self.stride, "downsample_conv")(x)
            identity = bn(identity, out_ch, "downsample_bn")
        return nn.relu(y + identity)


class ResNet(nn.Module):
    """ResNet-50/101 trunk returning the feature maps named by out_indices
    (0..3 -> C2..C5)."""
    depth: int = 50
    out_indices: Tuple[int, ...] = (1, 2, 3)
    frozen_stages: int = 1
    # per-stage DCNv2 switch (mmdet `stage_with_dcn`), e.g. R101-DCN uses
    # (False, False, True, True)
    dcn_stages: Tuple[bool, ...] = (False, False, False, False)
    # DCN sampling path: "gather" (exact, any shape) or "window" (dense
    # shift-window Pallas kernel with an exactness certificate)
    dcn_mode: str = "gather"
    dcn_window_radius: int = 3
    # per-DCN-layer window radii (flat `dcn_layer_indices` order, e.g. the
    # tools/test.py one-pass auto-radius probe output); None = the global
    # dcn_window_radius for every layer
    dcn_window_radii: Tuple[int, ...] = ()
    norm_eval: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array,
                 train: bool = False) -> Sequence[jax.Array]:
        blocks = STAGE_BLOCKS[self.depth]
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)],
                    use_bias=False, dtype=self.dtype, name="conv1",
                    kernel_init=nn.initializers.he_normal())(x)
        if self.norm_eval:
            x = FrozenBatchNorm(64, dtype=self.dtype, name="bn1")(x)
        else:
            x = TrainableBatchNorm(64, dtype=self.dtype, name="bn1")(
                x, train=train)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])

        if self.frozen_stages >= 0:
            # Stem frozen: cut gradients into conv1/bn1 activations' params by
            # stopping the gradient of the activation itself (parameters below
            # receive zero grad — the frozen_stages semantics of the ref).
            x = jax.lax.stop_gradient(x)

        outs = []
        mid = 64
        dcn_idx = 0
        for stage, n_blocks in enumerate(blocks):
            for b in range(n_blocks):
                stride = 2 if (b == 0 and stage > 0) else 1
                radius = self.dcn_window_radius
                if self.dcn_stages[stage]:
                    if dcn_idx < len(self.dcn_window_radii):
                        radius = self.dcn_window_radii[dcn_idx]
                    dcn_idx += 1
                # DCN blocks are rematerialised in training: their sampling
                # kernels otherwise keep ~216 MB of 9-tap residuals PER BLOCK
                # for the backward (23 blocks in R101 layer3), which blows the
                # 16 GB HBM at base scale (measured: 19.0 GB for the
                # turbo_r101_dcn train step).  Recompute-in-backward trades
                # one extra block forward for ~5 GB of residual memory.
                block_cls = Bottleneck
                if self.dcn_stages[stage] and train:
                    block_cls = nn.remat(Bottleneck, static_argnums=(2,))
                x = block_cls(mid, stride=stride,
                              dcn=self.dcn_stages[stage],
                              dcn_mode=self.dcn_mode,
                              dcn_window_radius=radius,
                              norm_eval=self.norm_eval,
                              dtype=self.dtype,
                              name=f"layer{stage + 1}_{b}")(x, train)
            if stage + 1 <= self.frozen_stages:
                x = jax.lax.stop_gradient(x)
            if stage in self.out_indices:
                outs.append(x)
            mid *= 2
        return outs
