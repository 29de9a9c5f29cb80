"""Gather-free DCNv2 sampling: separable shift-window Pallas TPU kernel.

The TPU-native fast path for modulated deformable conv (mmcv
`ModulatedDeformConv2dPack`, the R101-DCN backbone's 3x3 conv2 — see
`ops/deform_conv.py`).  Motivation (measured, tools/bench_dcn.py): at DCN
shapes the sampling gather moves ~2 KB/row and runs at only ~60-90 GB/s
effective however it is formulated (packed table, 4-corner, sorted), i.e.
~15 ms per stage-3 layer — 23 such layers dominate the whole r101_dcn
frame.  But unlike deformable *attention*, DCN samples at
`pixel + tap + offset` where the learned offsets concentrate near zero
(conv_offset is zero-initialised and stays small through training), so the
bilinear corners of virtually every sample live inside a small window
around the output pixel — the sampling can be DENSE.

Kernel design (no gathers anywhere):

- Feature layout (h, C, w->128 lanes): image rows on the untiled major
  dim, channels on sublanes, image columns on lanes.
- Bilinear is separable per sample, and a sample's y-weights are shared by
  its x-corners, so the (2R+2)^2 window collapses to two passes of 2R+2
  statically-shifted full-width VPU FMAs per tap: a y-pass over row shifts
  (dynamic-start loads on the UNTILED dim — no Mosaic alignment
  constraints) and an x-pass over static lane ROLLS of the y-interp
  result.  Per-sample bilinear weights collapse into two per-slot weight
  fields built by cheap vectorised XLA ahead of the kernel.
- Lane wrap-around is harmless: rolled-in lanes are either zero padding or
  columns whose slot weight is border-zeroed, so any w <= 128 is exact.

Exactness: identical to the reference semantics whenever every
contributing sample's `floor(offset)` lies in [-R, R]^2.  Samples outside
the window are ZEROED and counted; the count is returned as an `overflow`
certificate in the style of the encoder's `sca_topk_overflow` (a nonzero
certificate means the fast path deviated and eval must abort or fall back
to the gather path).  Out-of-image corners get zero weight exactly like
grid_sample(padding_mode='zeros').

Backward: custom VJP delegating to the XLA gather formulation
(`bilinear_sample_packed`), which computes the identical function when the
certificate holds — the same contract as `ops/msda_pallas.py`.
"""

from __future__ import annotations

import functools
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from occnet_tpu.ops.msda import bilinear_sample, bilinear_sample_packed

_RB = 8              # output image rows per grid step
_CB = 32             # channels (sublanes) per grid step
_W = 128             # lane width (max supported image width)


def _interpret() -> bool:
    return jax.default_backend() not in ("tpu", "axon")


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _axis_weight_field(o, base, coord, extent, radius):
    """One axis of the separable window weights.

    o (B,h,w,K) raw offset; base (K,) tap displacement (ky-1 / kx-1);
    coord: per-pixel absolute index broadcasting to (h,w,1); returns
    (wgt (B,h,w,K,S) f32, over (B,h,w,K) bool) with S = 2*radius+2.
    Slot s holds integer displacement base - R + s; a sample's two corners
    land in slots floor(off)+R and floor(off)+R+1, border corners and
    out-of-window samples get zero weight."""
    R = radius
    S = 2 * R + 2
    f0 = jnp.floor(o)
    frac = o - f0
    over = (f0 < -R) | (f0 > R)
    f0c = jnp.clip(f0, -R, R)
    slot = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, 1, S), 4)
    sel0 = (f0c[..., None] + R == slot).astype(jnp.float32)
    sel1 = (f0c[..., None] + R + 1 == slot).astype(jnp.float32)
    wgt = sel0 * (1.0 - frac[..., None]) + sel1 * frac[..., None]
    # absolute corner coordinate of slot s: coord + base + (-R + s)
    abs_c = (coord + base[None, None, :])[None, ..., None] + (
        jnp.arange(S, dtype=jnp.float32) - R)
    inb = (abs_c >= 0) & (abs_c <= extent - 1)
    wgt = wgt * inb.astype(jnp.float32)
    # out-of-window samples are ZEROED, not clamped: a clamped sample whose
    # true position is outside the image would otherwise contribute where
    # the reference contributes nothing — zeroing keeps those exact and the
    # certificate covers every remaining deviation
    wgt = wgt * (~over[..., None]).astype(jnp.float32)
    return wgt, over


def _window_weights(offset: jax.Array, mask: Optional[jax.Array],
                    h: int, w: int, K: int, radius: int):
    """Separable per-slot weight fields + overflow certificate.

    offset (B, h, w, 2K) mmcv layout; returns (wy, wx) each
    (B, h, K*S, w) f32 — the modulation mask folds into wx — and
    overflow () int32."""
    B = offset.shape[0]
    S = 2 * radius + 2
    off = offset.astype(jnp.float32).reshape(B, h, w, K, 2)
    ky = jnp.repeat(jnp.arange(3), 3).astype(jnp.float32)     # (K,) tap dy
    kx = jnp.tile(jnp.arange(3), 3).astype(jnp.float32)

    iy = jnp.arange(h, dtype=jnp.float32)[:, None, None]      # (h, 1, 1)
    jx = jnp.arange(w, dtype=jnp.float32)[None, :, None]      # (1, w, 1)

    wy, over_y = _axis_weight_field(off[..., 0], ky - 1.0, iy, h, radius)
    wx, over_x = _axis_weight_field(off[..., 1], kx - 1.0, jx, w, radius)
    if mask is not None:
        wx = wx * mask.reshape(B, h, w, K, 1).astype(jnp.float32)

    # certificate: zeroed samples that would actually contribute (their
    # true bilinear support intersects the image)
    py = iy + (ky - 1.0)[None, None, :] + off[..., 0]         # (B,h,w,K)
    px = jx + (kx - 1.0)[None, None, :] + off[..., 1]
    contributes = (py > -1.0) & (py < h) & (px > -1.0) & (px < w)
    overflow = jnp.sum(((over_y | over_x) & contributes).astype(jnp.int32))
    # (B, h, w, K, S) -> (B, h, K*S, w): slot-major fields, columns on lanes
    to_field = lambda a: jnp.transpose(a, (0, 1, 3, 4, 2)).reshape(  # noqa
        B, h, K * S, w)
    return to_field(wy), to_field(wx), overflow


def _window_kernel(K: int, S: int, R: int, rb: int, pr: int):
    """Both weight fields index the OUTPUT pixel, so the x-mix must act on
    RAW y-shifted rows, not on a y-interpolated buffer (a y-interp at
    source column j carries column j's y-weights — wrong for the output
    pixel after the x-roll; the first kernel draft had exactly that bug).
    Loop structure: tap rows (ky) share each y-shifted slab load across
    their 3 kx taps, and lane rolls dedupe across the (kx, sx) pairs that
    map to the same absolute x-displacement."""
    def kernel(wy_ref, wx_ref, x_ref, out_ref):
        row0 = pl.program_id(2) * rb
        cb = x_ref.shape[2]
        for ky in range(3):
            accs = [jnp.zeros((rb, cb, _W), jnp.float32) for _ in range(3)]
            for sy in range(S):
                dyabs = (ky - 1) - R + sy
                xs = x_ref[0, pl.ds(row0 + pr + dyabs, rb), :, :]
                xs = xs.astype(jnp.float32)
                qs = [jnp.zeros((rb, cb, _W), jnp.float32)
                      for _ in range(3)]
                for dxabs in range(-R - 1, R + 3):
                    hits = [(kx, dxabs - kx + 1 + R) for kx in range(3)
                            if 0 <= dxabs - kx + 1 + R < S]
                    if not hits:
                        continue
                    xr = (pltpu.roll(xs, (-dxabs) % _W, axis=2)
                          if dxabs else xs)
                    for kx, sx in hits:
                        k = ky * 3 + kx
                        wxc = wx_ref[0, :, k * S + sx, :]
                        qs[kx] = qs[kx] + xr * wxc[:, None, :]
                for kx in range(3):
                    k = ky * 3 + kx
                    wyc = wy_ref[0, :, k * S + sy, :]
                    accs[kx] = accs[kx] + qs[kx] * wyc[:, None, :]
            for kx in range(3):
                out_ref[0, :, ky * 3 + kx, :, :] = (
                    accs[kx].astype(out_ref.dtype))

    return kernel


def _window_kernel_dymajor(K: int, S: int, R: int, rb: int, pr: int):
    """`_window_kernel` with the loops restructured ABSOLUTE-SHIFT-major.

    The (ky, sy) loop of `_window_kernel` loads 3*S y-shifted slabs and
    rolls each 2R+4 times, but only 2R+4 DISTINCT row shifts exist
    (dyabs = (ky-1) - R + sy collides across ky), so 24 loads / 240 rolls
    at R=3 dedupe to 10 loads / <=100 rolls.  The per-(ky, sy) partial
    accumulators (`qs`) that justified the old nesting are replaced by
    COMBINED per-(tap, sy, sx) weights wy*wx — a (rb, W) lane-row multiply,
    ~cb x cheaper than the (rb, cb, W) FMA it feeds — keeping the big-FMA
    count at 9*S*S while the roll traffic drops 2.4x.  Same math, same
    in/out layout; the default (OCCNET_DCN_KERNEL=legacy restores the old
    nesting).  Measured at R101 trunk shapes (tools/bench_dcn.py, v5e):
    stage-3 R=3 9.77 vs 10.35 ms/layer, R=2 8.69 vs 8.99; stage-4 R=3
    8.81 vs 9.46 — a ~6% win, bounded because both variants issue the
    same 9*S*S big FMAs and the kernel is VPU-issue-bound, not
    roll/load-bound."""
    def kernel(wy_ref, wx_ref, x_ref, out_ref):
        row0 = pl.program_id(2) * rb
        cb = x_ref.shape[2]
        accs = [jnp.zeros((rb, cb, _W), jnp.float32) for _ in range(K)]
        for dyabs in range(-R - 1, R + 3):
            ky_hits = [(ky, dyabs - ky + 1 + R) for ky in range(3)
                       if 0 <= dyabs - ky + 1 + R < S]
            if not ky_hits:
                continue
            xs = x_ref[0, pl.ds(row0 + pr + dyabs, rb), :, :]
            xs = xs.astype(jnp.float32)
            for dxabs in range(-R - 1, R + 3):
                kx_hits = [(kx, dxabs - kx + 1 + R) for kx in range(3)
                           if 0 <= dxabs - kx + 1 + R < S]
                if not kx_hits:
                    continue
                xr = (pltpu.roll(xs, (-dxabs) % _W, axis=2)
                      if dxabs else xs)
                for ky, sy in ky_hits:
                    for kx, sx in kx_hits:
                        k = ky * 3 + kx
                        w2 = (wy_ref[0, :, k * S + sy, :]
                              * wx_ref[0, :, k * S + sx, :])   # (rb, W)
                        accs[k] = accs[k] + xr * w2[:, None, :]
        for k in range(K):
            out_ref[0, :, k, :, :] = accs[k].astype(out_ref.dtype)

    return kernel


def _sampled_window(x, offset, mask, radius: int):
    """Modulated per-tap samples via the separable window kernel.

    x (B, h, w, C); offset (B, h, w, 2K); mask (B, h, w, K) | None.
    Returns (sampled (B, h*w, K, C) x.dtype, overflow () int32)."""
    B, h, w, C = x.shape
    K = offset.shape[-1] // 2
    R = radius
    S = 2 * R + 2
    assert w <= _W, "window kernel supports feature maps up to 128 wide"

    wy, wx, overflow = _window_weights(offset, mask, h, w, K, R)

    C_pad = _round_up(C, _CB)
    h_pad = _round_up(h, _RB)
    pr = R + 1                      # top halo: min row shift is -(R+1)
    pb = (R + 2) + (h_pad - h)      # bottom halo: max row shift is R+2
    # (B, h, w, C) -> (B, pr + h + pb, C, W) rows-major, columns on lanes
    xt = jnp.transpose(x, (0, 1, 3, 2))
    xt = jnp.pad(xt, ((0, 0), (pr, pb), (0, C_pad - C), (0, _W - w)))
    ks_pad = _round_up(K * S, 8)
    wy = jnp.pad(wy, ((0, 0), (0, h_pad - h), (0, ks_pad - K * S),
                      (0, _W - w)))
    wx = jnp.pad(wx, ((0, 0), (0, h_pad - h), (0, ks_pad - K * S),
                      (0, _W - w)))

    # NOTE: read at TRACE time — under jit the variant is frozen into the
    # compiled graph; toggling the env var after first compile has no
    # effect on live models (it is a bench/test knob, not a runtime switch)
    kern = (_window_kernel_dymajor
            if os.environ.get("OCCNET_DCN_KERNEL", "dymajor") == "dymajor"
            else _window_kernel)
    out = pl.pallas_call(
        kern(K, S, R, _RB, pr),
        out_shape=jax.ShapeDtypeStruct((B, h_pad, K, C_pad, _W), x.dtype),
        grid=(B, C_pad // _CB, h_pad // _RB),
        in_specs=[
            pl.BlockSpec((1, _RB, ks_pad, _W), lambda b, c, r: (b, r, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _RB, ks_pad, _W), lambda b, c, r: (b, r, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, pr + h + pb, _CB, _W),
                         lambda b, c, r: (b, 0, c, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, _RB, K, _CB, _W),
                               lambda b, c, r: (b, r, 0, c, 0),
                               memory_space=pltpu.VMEM),
        interpret=_interpret(),
    )(wy, wx, xt)
    # (B, h, K, C, w) -> (B, h*w, K, C)
    sampled = jnp.transpose(out[:, :h, :, :C, :w], (0, 1, 4, 2, 3))
    return sampled.reshape(B, h * w, K, C), overflow


def _sampled_gather(x, offset, mask):
    """Reference formulation of the same modulated per-tap samples (packed
    corner-table gather) — the backward delegate and the cross-check oracle.
    Mirrors `ops/deform_conv.modulated_deform_conv` at stride=dilation=1."""
    B, h, w, C = x.shape
    K = offset.shape[-1] // 2
    ky = jnp.repeat(jnp.arange(3, dtype=jnp.float32), 3)
    kx = jnp.tile(jnp.arange(3, dtype=jnp.float32), 3)
    oy = jnp.arange(h, dtype=jnp.float32)
    ox = jnp.arange(w, dtype=jnp.float32)
    off = offset.astype(jnp.float32).reshape(B, h, w, K, 2)
    py = (oy[:, None, None] + (ky - 1.0)[None, None, :])[None] + off[..., 0]
    px = (ox[None, :, None] + (kx - 1.0)[None, None, :])[None] + off[..., 1]
    loc = jnp.stack([(px + 0.5) / w, (py + 0.5) / h], axis=-1)
    loc = loc.reshape(B, 1, h * w * K, 2)
    value = x.reshape(B, 1, h * w, C)
    sample = bilinear_sample_packed if (h >= 2 and w >= 2) else bilinear_sample
    sampled = sample(value, h, w, loc).reshape(B, h * w, K, C)
    if mask is not None:
        sampled = sampled * mask.reshape(B, h * w, K, 1).astype(sampled.dtype)
    return sampled


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _sampled_window_vjp(x, offset, mask, radius):
    sampled, _ = _sampled_window(x, offset, mask, radius)
    return sampled


def _svw_fwd(x, offset, mask, radius):
    sampled, _ = _sampled_window(x, offset, mask, radius)
    return sampled, (x, offset, mask)


def _svw_bwd(radius, residuals, g):
    x, offset, mask = residuals
    if mask is None:
        _, vjp = jax.vjp(lambda x_, o_: _sampled_gather(x_, o_, None),
                         x, offset)
        return (*vjp(g), None)
    _, vjp = jax.vjp(_sampled_gather, x, offset, mask)
    return vjp(g)


_sampled_window_vjp.defvjp(_svw_fwd, _svw_bwd)


def modulated_deform_conv_window(
    x: jax.Array,          # (B, h, w, Cin) NHWC
    offset: jax.Array,     # (B, h, w, 2K) mmcv (dy, dx) per tap
    mask: Optional[jax.Array],   # (B, h, w, K) post-sigmoid, or None
    weight: jax.Array,     # (3, 3, Cin, Cout)
    bias: Optional[jax.Array] = None,
    radius: int = 3,
) -> Tuple[jax.Array, jax.Array]:
    """DCNv2 3x3 / stride 1 / dilation 1 via the separable window kernel.

    Returns (out (B, h, w, Cout), overflow () int32 — the exactness
    certificate: 0 means bit-for-bit reference semantics; nonzero means
    `radius` zeroed real samples and the result deviates)."""
    B, h, w, Cin = x.shape
    kh, kw, _, Cout = weight.shape
    assert kh == 3 and kw == 3, "window kernel covers the 3x3 backbone case"
    K = kh * kw
    _, _, overflow = _window_weights(offset, mask, h, w, K, radius)
    sampled = _sampled_window_vjp(x, offset, mask, radius)
    out = jnp.einsum("bnkc,kco->bno", sampled,
                     weight.reshape(K, Cin, Cout),
                     preferred_element_type=jnp.float32)
    out = out.reshape(B, h, w, Cout).astype(x.dtype)
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out, overflow


def window_supported(w: int, kernel: int, stride: int,
                     dilation: int) -> bool:
    """Static predicate: can this DCN layer use the window kernel?
    (stage-entry stride-2 blocks and >128-wide maps use the gather path)"""
    return kernel == 3 and stride == 1 and dilation == 1 and w <= _W


def needed_radius(offset: jax.Array, h: int, w: int) -> jax.Array:
    """Smallest window radius that makes the kernel EXACT for these offsets:
    `max |floor(off)|` over samples whose bilinear support intersects the
    image (the window is exact iff floor(off) ∈ [-R, R] for every such
    sample; fully out-of-image samples contribute nothing in the reference
    semantics either, so they never constrain R).  Sown per DCN layer as
    `dcn_radius_needed` (ops/deform_conv.py) — the basis of the ONE-pass
    per-layer auto-radius probe in tools/test.py.  Returns () int32."""
    B, ho, wo, two_k = offset.shape
    K = two_k // 2
    off = offset.astype(jnp.float32).reshape(B, ho, wo, K, 2)
    ky = jnp.repeat(jnp.arange(3, dtype=jnp.float32), 3)
    kx = jnp.tile(jnp.arange(3, dtype=jnp.float32), 3)
    iy = jnp.arange(ho, dtype=jnp.float32)[:, None, None]
    jx = jnp.arange(wo, dtype=jnp.float32)[None, :, None]
    py = (iy + (ky - 1.0)[None, None, :])[None] + off[..., 0]
    px = (jx + (kx - 1.0)[None, None, :])[None] + off[..., 1]
    contributes = (py > -1.0) & (py < h) & (px > -1.0) & (px < w)
    f = jnp.maximum(jnp.abs(jnp.floor(off[..., 0])),
                    jnp.abs(jnp.floor(off[..., 1])))
    return jnp.max(jnp.where(contributes, f, 0.0)).astype(jnp.int32)
