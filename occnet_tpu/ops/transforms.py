"""Image-plane transforms used by the temporal BEV path.

`rotate_bev` replaces the reference's host-side torchvision `rotate` of the
prev-BEV map (`transformer_occ.py:195-205`, center=[100,100], default NEAREST
interpolation) with a jittable inverse-affine resample.  `shift_bev_ref`
computes the ego-motion BEV shift from can-bus translation, the temporal-
alignment math documented in `transformer.py:122-141` (the spec the occ
transformer omits)."""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp


def rotate_bev(
    bev: jax.Array,            # (H, W, C)
    angle_deg: jax.Array,      # scalar, counter-clockwise degrees
    center: Tuple[float, float] = (100.0, 100.0),
    method: str = "nearest",
) -> jax.Array:
    """Rotate a BEV map about `center` (x, y in pixel coords).

    Matches torchvision `rotate(img, angle, center=...)`: output pixel (y, x)
    samples input at the inverse rotation about the centre.
    """
    h, w, _ = bev.shape
    theta = -angle_deg * jnp.pi / 180.0   # inverse map for CCW rotation
    cos, sin = jnp.cos(theta), jnp.sin(theta)
    cx, cy = center
    ys, xs = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                          jnp.arange(w, dtype=jnp.float32), indexing="ij")
    x0 = xs - cx
    y0 = ys - cy
    src_x = cos * x0 - sin * y0 + cx
    src_y = sin * x0 + cos * y0 + cy

    if method == "nearest":
        ix = jnp.round(src_x).astype(jnp.int32)
        iy = jnp.round(src_y).astype(jnp.int32)
        valid = (ix >= 0) & (ix < w) & (iy >= 0) & (iy < h)
        ix = jnp.clip(ix, 0, w - 1)
        iy = jnp.clip(iy, 0, h - 1)
        out = bev[iy, ix]
        return out * valid[..., None].astype(bev.dtype)
    # bilinear
    x0f = jnp.floor(src_x)
    y0f = jnp.floor(src_y)
    tx = (src_x - x0f)[..., None].astype(bev.dtype)
    ty = (src_y - y0f)[..., None].astype(bev.dtype)
    out = jnp.zeros_like(bev)
    for dy in (0, 1):
        for dx in (0, 1):
            ix = x0f.astype(jnp.int32) + dx
            iy = y0f.astype(jnp.int32) + dy
            valid = (ix >= 0) & (ix < w) & (iy >= 0) & (iy < h)
            wgt = (tx if dx else 1 - tx) * (ty if dy else 1 - ty)
            ixc = jnp.clip(ix, 0, w - 1)
            iyc = jnp.clip(iy, 0, h - 1)
            out = out + bev[iyc, ixc] * wgt * valid[..., None].astype(
                bev.dtype)
    return out


def shift_bev_ref(
    can_bus_delta_xy: jax.Array,   # (2,) ego translation since prev frame (m)
    ego_angle_deg: jax.Array,      # scalar current ego yaw (deg)
    grid_length: Tuple[float, float],   # (metres/cell y, metres/cell x)
    bev_hw: Tuple[int, int],
    use_shift: bool = True,
) -> jax.Array:
    """Normalised (shift_x, shift_y) of the BEV grid between frames — the
    can-bus shift of `transformer.py:122-141`."""
    delta_x, delta_y = can_bus_delta_xy[0], can_bus_delta_xy[1]
    translation = jnp.sqrt(delta_x ** 2 + delta_y ** 2)
    translation_angle = jnp.arctan2(delta_y, delta_x) * 180.0 / jnp.pi
    bev_angle = ego_angle_deg - translation_angle
    gl_y, gl_x = grid_length
    bev_h, bev_w = bev_hw
    shift_y = translation * jnp.cos(bev_angle / 180.0 * jnp.pi) / gl_y / bev_h
    shift_x = translation * jnp.sin(bev_angle / 180.0 * jnp.pi) / gl_x / bev_w
    scale = 1.0 if use_shift else 0.0
    return jnp.stack([shift_x * scale, shift_y * scale])
