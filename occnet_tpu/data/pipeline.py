"""Host-side preprocessing pipeline (pure numpy).

Equivalents of the reference pipeline transforms
(`datasets/pipelines/transform_3d.py`, `loading.py`):
- `load_occ_gt`: labels.npz -> semantics [200,200,16] u8 + flow
  [200,200,16,2] f32, zeros when absent (test split) (`loading.py:21-33`).
- `photometric_distortion`: brightness/contrast/HSV-saturation/hue/channel-
  swap jitter, each applied with p=0.5 (`transform_3d.py:102-199`).
- `normalize_img`: per-channel mean/std (`transform_3d.py:65-99`).  Images
  here are decoded RGB (the reference uses BGR via cv2), so pass RGB-ordered
  mean/std — the channel permutation is absorbed by the weight converter.
- `pad_to_divisor`: bottom/right zero-pad to a size multiple
  (`transform_3d.py:11-62`).
"""

from __future__ import annotations

import os
from typing import Optional, Sequence, Tuple

import numpy as np


def load_occ_gt(occ_path: Optional[str],
                occ_size: Tuple[int, int, int] = (200, 200, 16)):
    if occ_path is not None and os.path.exists(occ_path):
        labels = np.load(occ_path)
        return (labels["semantics"].astype(np.uint8),
                labels["flow"].astype(np.float32))
    sem = np.zeros(occ_size, dtype=np.uint8)
    flow = np.zeros(occ_size + (2,), dtype=np.float32)
    return sem, flow


# --- colour-space helpers (replacing mmcv.bgr2hsv / hsv2bgr; OpenCV HSV
# convention: H in [0, 360), S,V in [0, 1] for float inputs scaled /255) -----

def _rgb_to_hsv(img: np.ndarray) -> np.ndarray:
    rgb = img / 255.0
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    maxc = rgb.max(-1)
    minc = rgb.min(-1)
    v = maxc
    delta = maxc - minc
    s = np.where(maxc > 0, delta / np.maximum(maxc, 1e-12), 0.0)
    dz = np.maximum(delta, 1e-12)
    h = np.where(maxc == r, (g - b) / dz % 6.0,
                 np.where(maxc == g, (b - r) / dz + 2.0, (r - g) / dz + 4.0))
    h = np.where(delta > 0, h * 60.0, 0.0)
    return np.stack([h, s, v], axis=-1)


def _hsv_to_rgb(hsv: np.ndarray) -> np.ndarray:
    h, s, v = hsv[..., 0] / 60.0, hsv[..., 1], hsv[..., 2]
    i = np.floor(h) % 6
    f = h - np.floor(h)
    p = v * (1 - s)
    q = v * (1 - s * f)
    t = v * (1 - s * (1 - f))
    r = np.select([i == 0, i == 1, i == 2, i == 3, i == 4], [v, q, p, p, t], v)
    g = np.select([i == 0, i == 1, i == 2, i == 3, i == 4], [t, v, v, q, p], p)
    b = np.select([i == 0, i == 1, i == 2, i == 3, i == 4], [p, p, t, v, v], q)
    return np.stack([r, g, b], axis=-1) * 255.0


def photometric_distortion(
    imgs: np.ndarray,                 # (N, H, W, 3) float32 RGB in [0,255]
    rng: np.random.RandomState,
    brightness_delta: float = 32.0,
    contrast_range: Tuple[float, float] = (0.5, 1.5),
    saturation_range: Tuple[float, float] = (0.5, 1.5),
    hue_delta: float = 18.0,
) -> np.ndarray:
    out = []
    for img in imgs:
        img = img.astype(np.float32)
        if rng.randint(2):
            img = img + rng.uniform(-brightness_delta, brightness_delta)
        mode = rng.randint(2)
        if mode == 1 and rng.randint(2):
            img = img * rng.uniform(*contrast_range)
        hsv = _rgb_to_hsv(img)
        if rng.randint(2):
            hsv[..., 1] *= rng.uniform(*saturation_range)
        if rng.randint(2):
            h = hsv[..., 0] + rng.uniform(-hue_delta, hue_delta)
            h = np.where(h > 360, h - 360, h)
            h = np.where(h < 0, h + 360, h)
            hsv[..., 0] = h
        img = _hsv_to_rgb(hsv)
        if mode == 0 and rng.randint(2):
            img = img * rng.uniform(*contrast_range)
        if rng.randint(2):
            img = img[..., rng.permutation(3)]
        out.append(img.astype(np.float32))
    return np.stack(out)


def normalize_img(imgs: np.ndarray, mean: Sequence[float],
                  std: Sequence[float]) -> np.ndarray:
    mean = np.asarray(mean, np.float32)
    std = np.asarray(std, np.float32)
    return (imgs.astype(np.float32) - mean) / std


def pad_to_divisor(imgs: np.ndarray, divisor: int = 32) -> np.ndarray:
    """(N, H, W, C) -> bottom/right zero-padded to multiples of divisor."""
    n, h, w, c = imgs.shape
    ph = (-h) % divisor
    pw = (-w) % divisor
    if ph == 0 and pw == 0:
        return imgs
    return np.pad(imgs, ((0, 0), (0, ph), (0, pw), (0, 0)))


def random_scale_image(
    imgs: np.ndarray,               # (N, H, W, 3)
    lidar2img: np.ndarray,          # (N, 4, 4)
    rng: np.random.RandomState,
    scales: Sequence[float] = (0.9, 1.0, 1.1),
):
    """Random resize of all views with lidar2img rescaling — equivalent of the
    reference's (unused) `RandomScaleImageMultiViewImage`
    (`transform_3d.py:292-331`): one scale drawn per sample, applied to every
    view, and the projection matrices' first two rows scaled to match.
    Bilinear resize in pure numpy."""
    s = scales[rng.randint(len(scales))]
    if s == 1.0:
        return imgs, lidar2img
    n, h, w, c = imgs.shape
    nh, nw = int(round(h * s)), int(round(w * s))
    ys = (np.arange(nh) + 0.5) / s - 0.5
    xs = (np.arange(nw) + 0.5) / s - 0.5
    y0 = np.clip(np.floor(ys).astype(int), 0, h - 1)
    x0 = np.clip(np.floor(xs).astype(int), 0, w - 1)
    y1 = np.clip(y0 + 1, 0, h - 1)
    x1 = np.clip(x0 + 1, 0, w - 1)
    ty = (ys - y0).clip(0, 1)[None, :, None, None]
    tx = (xs - x0).clip(0, 1)[None, None, :, None]
    out = (imgs[:, y0][:, :, x0] * (1 - ty) * (1 - tx)
           + imgs[:, y0][:, :, x1] * (1 - ty) * tx
           + imgs[:, y1][:, :, x0] * ty * (1 - tx)
           + imgs[:, y1][:, :, x1] * ty * tx)
    scale_mat = np.eye(4, dtype=lidar2img.dtype)
    scale_mat[0, 0] = scale_mat[1, 1] = s
    new_l2i = np.einsum("ij,njk->nik", scale_mat, lidar2img)
    return out.astype(imgs.dtype), new_l2i


def _rgb_to_hsv_jax(img):
    """jax port of `_rgb_to_hsv` (identical math)."""
    import jax.numpy as jnp
    rgb = img / 255.0
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    maxc = rgb.max(-1)
    minc = rgb.min(-1)
    v = maxc
    delta = maxc - minc
    s = jnp.where(maxc > 0, delta / jnp.maximum(maxc, 1e-12), 0.0)
    dz = jnp.maximum(delta, 1e-12)
    h = jnp.where(maxc == r, (g - b) / dz % 6.0,
                  jnp.where(maxc == g, (b - r) / dz + 2.0,
                            (r - g) / dz + 4.0))
    h = jnp.where(delta > 0, h * 60.0, 0.0)
    return jnp.stack([h, s, v], axis=-1)


def _hsv_to_rgb_jax(hsv):
    """jax port of `_hsv_to_rgb` (identical math)."""
    import jax.numpy as jnp
    h, s, v = hsv[..., 0] / 60.0, hsv[..., 1], hsv[..., 2]
    i = jnp.floor(h) % 6
    f = h - jnp.floor(h)
    p = v * (1 - s)
    q = v * (1 - s * f)
    t = v * (1 - s * (1 - f))
    conds = [i == 0, i == 1, i == 2, i == 3, i == 4]
    r = jnp.select(conds, [v, q, p, p, t], v)
    g = jnp.select(conds, [t, v, v, q, p], p)
    b = jnp.select(conds, [p, p, t, v, v], q)
    return jnp.stack([r, g, b], axis=-1) * 255.0


def photometric_distortion_device(
    key,
    imgs,                             # (..., H, W, 3) float32 RGB in [0,255]
    brightness_delta: float = 32.0,
    contrast_range: Tuple[float, float] = (0.5, 1.5),
    saturation_range: Tuple[float, float] = (0.5, 1.5),
    hue_delta: float = 18.0,
):
    """Jittable photometric jitter, one independent draw set per image —
    the same gates/ranges/ordering as the host `photometric_distortion`
    (reference `transform_3d.py:102-199`): brightness, contrast (pre or post
    by mode), HSV saturation + hue, channel swap, each applied with p=0.5.
    Branches become `where` selects; the HSV round-trip is unconditional,
    exactly like the host path."""
    import jax
    import jax.numpy as jnp

    def one(k, img):
        ks = jax.random.split(k, 13)
        uni = lambda kk, lo, hi: jax.random.uniform(     # noqa: E731
            kk, (), minval=lo, maxval=hi)
        gate = lambda kk: jax.random.bernoulli(kk, 0.5)  # noqa: E731

        img = jnp.where(
            gate(ks[0]),
            img + uni(ks[1], -brightness_delta, brightness_delta), img)
        mode1 = jax.random.bernoulli(ks[2], 0.5)
        img = jnp.where(mode1 & gate(ks[3]),
                        img * uni(ks[4], *contrast_range), img)
        hsv = _rgb_to_hsv_jax(img)
        s = jnp.where(gate(ks[5]),
                      hsv[..., 1] * uni(ks[6], *saturation_range),
                      hsv[..., 1])
        h = hsv[..., 0] + jnp.where(gate(ks[7]),
                                    uni(ks[8], -hue_delta, hue_delta), 0.0)
        h = jnp.where(h > 360.0, h - 360.0, h)
        h = jnp.where(h < 0.0, h + 360.0, h)
        img = _hsv_to_rgb_jax(jnp.stack([h, s, hsv[..., 2]], axis=-1))
        img = jnp.where(~mode1 & gate(ks[9]),
                        img * uni(ks[10], *contrast_range), img)
        perm = jax.random.permutation(ks[11], 3)
        img = jnp.where(gate(ks[12]), img[..., perm], img)
        return img

    lead = imgs.shape[:-3]
    flat = imgs.reshape((-1,) + imgs.shape[-3:])
    keys = jax.random.split(key, flat.shape[0])
    out = jax.vmap(one)(keys, flat)
    return out.reshape(lead + imgs.shape[-3:])


def make_device_train_augmenter(cfg, size_divisor: int = 32,
                                distort: bool = True):
    """On-device train-time counterpart of the host pipeline for uint8
    uploads: photometric distortion -> normalise -> bottom/right zero-pad,
    the host path's exact order (`NuSceneOccDataset.get_sample`).  Returns
    `augment(key, imgs)`; float inputs pass through unchanged (already
    host-processed)."""
    mean = np.asarray(cfg.img_mean, np.float32)
    std = np.asarray(cfg.img_std, np.float32)
    if not cfg.to_rgb:
        mean, std = mean[::-1].copy(), std[::-1].copy()

    def augment(key, imgs):
        import jax.numpy as jnp
        if imgs.dtype != jnp.uint8:
            return imgs                     # already host-processed
        out = imgs.astype(jnp.float32)
        if distort:
            out = photometric_distortion_device(key, out)
        out = (out - mean) / std
        h, w = out.shape[-3], out.shape[-2]
        ph, pw = (-h) % size_divisor, (-w) % size_divisor
        if ph or pw:
            pad = [(0, 0)] * (out.ndim - 3) + [(0, ph), (0, pw), (0, 0)]
            out = jnp.pad(out, pad)
        return out

    return augment


def make_device_normalizer(cfg, size_divisor: int = 32):
    """On-device counterpart of `normalize_img` + `pad_to_divisor` for uint8
    batches uploaded raw (`NuSceneOccDataset(device_normalize=True)`): 4x+
    less host->device image traffic.  The dataset ships the UNPADDED uint8
    images; this normalises then bottom/right zero-pads on device — the same
    order as the host path (and the reference, `transform_3d.py:11-62` after
    `:65-99`), so the result is bitwise-identical at every image size,
    including divisor-unaligned ones like nuScenes 900x1600."""
    mean = np.asarray(cfg.img_mean, np.float32)
    std = np.asarray(cfg.img_std, np.float32)
    if not cfg.to_rgb:
        mean, std = mean[::-1].copy(), std[::-1].copy()

    def normalize(imgs):
        import jax.numpy as jnp
        if imgs.dtype != jnp.uint8:
            return imgs                     # already host-normalised
        out = (imgs.astype(jnp.float32) - mean) / std
        h, w = out.shape[-3], out.shape[-2]
        ph, pw = (-h) % size_divisor, (-w) % size_divisor
        if ph or pw:
            pad = [(0, 0)] * (out.ndim - 3) + [(0, ph), (0, pw), (0, 0)]
            out = jnp.pad(out, pad)
        return out

    return normalize
