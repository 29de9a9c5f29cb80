"""Modulated deformable convolution (DCNv2) — XLA formulation.

Capability equivalent of mmcv's `ModulatedDeformConv2dPack` as used by the
BEVFormer/OccNet R101-DCN backbones (BASELINE.json config 3; the reference's
occ configs ship R50, but the lineage's R101-DCN config enables
`dcn=dict(type='DCNv2')` on ResNet stages 3-4).

Formulation: a regular conv predicts per-output-pixel offsets (and a sigmoid
modulation mask); each of the kh*kw taps is bilinearly sampled at its offset
position (packed corner-table gather, `ops/msda.bilinear_sample_packed`,
grid_sample zero-padding semantics) and the modulated samples contract
against the conv weight on the MXU.  The sampling is a gather (~ho*wo*K rows
per call) — the exact-at-any-offset path, mirroring how the exact
deformable-attention mode is the parity path (see README "two encoder
modes").  The fast path is the gather-free separable shift-window Pallas
kernel in `ops/dcn_window.py` (mode="window" on the module below), exact
under its per-batch overflow certificate.

Offset channel layout follows mmcv: for tap k, channels (2k, 2k+1) = (dy, dx),
mask channel k after all offsets — so converted torch checkpoints drop in.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from occnet_tpu.ops.msda import bilinear_sample, bilinear_sample_packed


def modulated_deform_conv(
    x: jax.Array,          # (B, h, w, Cin) NHWC
    offset: jax.Array,     # (B, ho, wo, 2*K) — (dy, dx) per tap, mmcv order
    mask: Optional[jax.Array],   # (B, ho, wo, K) post-sigmoid, or None (v1)
    weight: jax.Array,     # (kh, kw, Cin, Cout)
    bias: Optional[jax.Array] = None,
    stride: int = 1,
    dilation: int = 1,
) -> jax.Array:
    """'same'-style padding pad = dilation * (k - 1) // 2 (the 3x3 backbone
    case); output (B, ho, wo, Cout) with ho = ceil(h / stride)."""
    B, h, w, Cin = x.shape
    kh, kw, _, Cout = weight.shape
    K = kh * kw
    pad = dilation * (kh - 1) // 2
    ho = -(-h // stride)
    wo = -(-w // stride)

    oy = jnp.arange(ho, dtype=jnp.float32) * stride - pad
    ox = jnp.arange(wo, dtype=jnp.float32) * stride - pad
    ky = jnp.arange(kh, dtype=jnp.float32) * dilation
    kx = jnp.arange(kw, dtype=jnp.float32) * dilation
    # per-tap (row-major k = ky * kw + kx) base positions
    ky_tap = jnp.repeat(ky, kw)                          # (K,)
    kx_tap = jnp.tile(kx, kh)                            # (K,)
    base_y = oy[:, None, None] + ky_tap[None, None, :]   # (ho, 1, K)
    base_x = ox[None, :, None] + kx_tap[None, None, :]   # (1, wo, K)

    off = offset.astype(jnp.float32).reshape(B, ho, wo, K, 2)
    py = base_y[None] + off[..., 0]
    px = base_x[None] + off[..., 1]
    # normalised loc for bilinear_sample (pixel centres at (i + 0.5)/extent)
    loc = jnp.stack([(px + 0.5) / w, (py + 0.5) / h], axis=-1)
    loc = loc.reshape(B, 1, ho * wo * K, 2)

    value = x.reshape(B, 1, h * w, Cin)
    # packed-table gather: ONE row per (pixel, tap) sample instead of four —
    # gathers cost per row on this platform (BASELINE.md), and the DCN
    # offset-window sampling is all gather rows (ho*wo*K per image per call,
    # 23 calls/frame on the R101-DCN stage-3 trunk)
    sample = bilinear_sample_packed if (h >= 2 and w >= 2) else bilinear_sample
    sampled = sample(value, h, w, loc)                   # (B, 1, N, Cin)
    sampled = sampled.reshape(B, ho * wo, K, Cin)
    if mask is not None:
        sampled = sampled * mask.reshape(B, ho * wo, K, 1).astype(
            sampled.dtype)

    out = jnp.einsum("bnkc,kco->bno", sampled,
                     weight.reshape(K, Cin, Cout),
                     preferred_element_type=jnp.float32)
    out = out.reshape(B, ho, wo, Cout).astype(x.dtype)
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out


class ModulatedDeformConv(nn.Module):
    """DCNv2 layer: conv_offset (zero-init regular conv -> 2K offsets + K
    mask logits) + deformable 3x3 conv, mmcv-compatible parameter layout
    (`conv_offset` weights convert from `ModulatedDeformConv2dPack`).

    mode "gather" = the XLA packed-table sampling above (any stride /
    dilation / kernel); mode "window" = the dense shift-window Pallas
    kernel (`ops/dcn_window.py`) for the stride-1 dilation-1 3x3 layers
    (24 of the 26 R101-DCN blocks — the stage-entry stride-2 blocks keep
    the gather path), sowing its `dcn_window_overflow` exactness
    certificate as an intermediate (collected by `tools/test.py` exactly
    like `sca_topk_overflow`)."""
    features: int
    kernel: int = 3
    stride: int = 1
    dilation: int = 1
    use_bias: bool = False
    mode: str = "gather"             # "gather" | "window"
    window_radius: int = 3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        K = self.kernel * self.kernel
        pad = self.dilation * (self.kernel - 1) // 2
        co = nn.Conv(3 * K, (self.kernel, self.kernel),
                     strides=(self.stride, self.stride),
                     padding=[(pad, pad)] * 2,
                     kernel_init=nn.initializers.zeros,
                     bias_init=nn.initializers.zeros,
                     dtype=self.dtype, name="conv_offset")(x)
        off = co[..., :2 * K]
        mask = jax.nn.sigmoid(co[..., 2 * K:].astype(jnp.float32))
        weight = self.param(
            "kernel", nn.initializers.he_normal(),
            (self.kernel, self.kernel, x.shape[-1], self.features))
        bias = (self.param("bias", nn.initializers.zeros, (self.features,))
                if self.use_bias else None)
        from occnet_tpu.ops.dcn_window import (
            modulated_deform_conv_window, needed_radius, window_supported)
        eligible = window_supported(x.shape[2], self.kernel, self.stride,
                                    self.dilation)
        if eligible:
            # per-layer auto-radius statistic (dead code unless the caller
            # collects intermediates — XLA removes it in plain inference)
            self.sow("intermediates", "dcn_radius_needed",
                     needed_radius(off, x.shape[1], x.shape[2]))
        if self.mode == "window" and eligible:
            out, overflow = modulated_deform_conv_window(
                x, off, mask, weight.astype(self.dtype), bias,
                radius=self.window_radius)
            self.sow("intermediates", "dcn_window_overflow", overflow)
            return out
        return modulated_deform_conv(
            x, off, mask, weight.astype(self.dtype), bias,
            stride=self.stride, dilation=self.dilation)
