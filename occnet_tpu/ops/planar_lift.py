"""Gather-free 2D->3D lift: planar-homography warping of camera features onto
the BEV grid, factored into banded-matrix matmuls (MXU-native).

This is the TPU-first replacement for per-sample deformable sampling in
spatial cross-attention.  Key facts driving the design (measured, see
memory/tpu-gather-rates.md): XLA gathers run at ~65M rows/s on TPU regardless
of row width, so the reference's sample-per-(query, head, level, point)
pattern (`spatial_cross_attention.py:386-393`, >=25M gathered rows per
encoder layer) has a hard ~0.4 s/layer floor.  Instead:

For a FIXED height z, the map from BEV-plane coordinates to image pixels is an
exact plane-to-plane homography.  Warping an image-feature level onto the
200x200 BEV grid therefore factors into two 1D linear resamples:

  - a BEV row (constant grid y) projects to a LINE in the image, so
    pass 1 resamples each feature column along image-y onto that line, and
    pass 2 resamples along the line (image-x) onto the BEV columns.

Each 1D resample is a matmul with an on-the-fly 2-banded interpolation matrix
(hat weights), so the whole lift is `einsum` work on the MXU with no gathers.
Sampling positions match the reference's grid_sample convention
(align_corners=False: feature coord = normalised*extent - 0.5, zero padding
outside).  The two-pass factorisation samples the two x-neighbours at their
own line heights rather than a shared one — a sub-pixel deviation from true
bilinear, standard for separable warps.

Rows whose image line is steeper than 45 degrees resample y-first poorly, so
both pass orders are computed and selected per BEV row by line slope.
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp


def plane_homographies(
    ego2img: jax.Array,            # (..., 4, 4) fp32
    pc_range: Sequence[float],
    z_anchors: jax.Array,          # (Z,) heights in metres (ego frame)
    bev_hw: Tuple[int, int],
) -> jax.Array:
    """3x3 homographies M with (u, v, w)^T = M @ (ix, iy, 1)^T mapping BEV
    cell indices (cell centres at integer ix, iy) to image pixel coords.

    Returns (..., Z, 3, 3).
    """
    bev_h, bev_w = bev_hw
    pc = jnp.asarray(pc_range, jnp.float32)
    dx = (pc[3] - pc[0]) / bev_w
    dy = (pc[4] - pc[1]) / bev_h
    x0 = pc[0] + 0.5 * dx
    y0 = pc[1] + 0.5 * dy

    E = ego2img[..., :3, :]        # (..., 3, 4)
    col_x = E[..., 0] * dx                                   # (..., 3)
    col_y = E[..., 1] * dy
    # (..., Z, 3) constant column: E @ (x0, y0, z, 1)
    const = (E[..., None, :, 0] * x0 + E[..., None, :, 1] * y0
             + E[..., None, :, 2] * z_anchors[:, None]
             + E[..., None, :, 3])
    Z = z_anchors.shape[0]
    col_x = jnp.broadcast_to(col_x[..., None, :], const.shape)
    col_y = jnp.broadcast_to(col_y[..., None, :], const.shape)
    return jnp.stack([col_x, col_y, const], axis=-1)   # (..., Z, 3, 3)


def _hat(dist: jax.Array) -> jax.Array:
    return jnp.maximum(0.0, 1.0 - jnp.abs(dist))


def _band_limit(pos: jax.Array, n: int) -> jax.Array:
    """Zero-padding semantics: positions outside [-1, n] get no support;
    clamp keeps the hat-matrix construction stable."""
    valid = (pos > -1.0) & (pos < n)
    return jnp.where(valid, pos, -2.0)


def warp_level_to_bev(
    feat: jax.Array,       # (h, w, C) one camera feature level
    M: jax.Array,          # (3, 3) BEV-cell -> FEATURE-pixel homography
    bev_hw: Tuple[int, int],
    eps: float = 1e-4,
    band_dtype=jnp.float32,
) -> Tuple[jax.Array, jax.Array]:
    """Warp one feature level onto the BEV grid for one (camera, z) plane.

    M maps (ix, iy, 1) -> (xf*w_hom, yf*w_hom, w_hom) in FEATURE pixel
    coordinates (grid_sample convention: feature centres at integers after
    the -0.5 shift, i.e. caller pre-folds the normalisation).

    Returns (bev_feat (bev_h, bev_w, C), valid (bev_h, bev_w)).
    """
    h, w, C = feat.shape
    bev_h, bev_w = bev_hw
    f32 = jnp.float32

    ix = jnp.arange(bev_w, dtype=f32)
    iy = jnp.arange(bev_h, dtype=f32)

    # Projective coords for all BEV cells (dense, cheap).
    px = (M[0, 0] * ix[None, :] + M[0, 1] * iy[:, None] + M[0, 2])
    py = (M[1, 0] * ix[None, :] + M[1, 1] * iy[:, None] + M[1, 2])
    pw = (M[2, 0] * ix[None, :] + M[2, 1] * iy[:, None] + M[2, 2])
    in_front = pw > eps
    xf = px / jnp.where(in_front, pw, eps)          # (bev_h, bev_w)
    yf = py / jnp.where(in_front, pw, eps)

    valid = (in_front & (xf > -0.5) & (xf < w - 0.5)
             & (yf > -0.5) & (yf < h - 0.5))

    # Per BEV row r: the image of the line {iy = r} under the homography is
    # the image LINE through the homogeneous points p_inf = M[:,0] (the row's
    # point at infinity) and p_r = M[:,1]*r + M[:,2].  Computing it
    # algebraically (cross product) stays exact even when parts of the row
    # project behind the camera (endpoint fitting does not).
    p_inf = M[:, 0]                                  # (3,)
    p_r = M[:, 1][None, :] * iy[:, None] + M[:, 2][None, :]   # (bev_h, 3)
    line = jnp.cross(jnp.broadcast_to(p_inf, p_r.shape), p_r)  # l.x=0
    l0, l1, l2 = line[:, 0], line[:, 1], line[:, 2]
    steep = jnp.abs(l1) < jnp.abs(l0)                # (bev_h,)
    safe = lambda d: jnp.where(jnp.abs(d) < 1e-8,    # noqa: E731
                               jnp.where(d < 0, -1e-8, 1e-8), d)
    a = -l0 / safe(l1)        # y = a*x + b
    b = -l2 / safe(l1)
    a2 = -l1 / safe(l0)       # x = a2*y + b2
    b2 = -l2 / safe(l0)

    feat = feat.astype(band_dtype)
    not_steep = (~steep).astype(f32)
    steep_f = steep.astype(f32)

    # ---- order A pass 1: tmp[r, x, c] = interp_y feat[a[r]*x + b[r], x, c]
    # (pass-1 hat weights pre-masked by the per-row order selection so each
    # row is produced by exactly one order and pass 2 merges into one einsum)
    xs = jnp.arange(w, dtype=f32)
    ypos = a[:, None] * xs[None, :] + b[:, None]            # (bev_h, w)
    ypos = _band_limit(ypos, h)
    ygrid = jnp.arange(h, dtype=f32)
    W1 = _hat(ypos[:, :, None] - ygrid[None, None, :])      # (bev_h, w, h)
    tmpA = jnp.einsum("rxh,hxc->rxc", W1.astype(band_dtype), feat,
                      preferred_element_type=jnp.float32).astype(band_dtype)

    # ---- order B pass 1: tmpB[r, y, c] = interp_x feat[y, a2[r]*y + b2[r]]
    xposB = a2[:, None] * ygrid[None, :] + b2[:, None]       # (bev_h, h)
    xposB = _band_limit(xposB, w)
    W1b = _hat(xposB[:, :, None] - xs[None, None, :])        # (bev_h, h, w)
    tmpB = jnp.einsum("rhx,hxc->rhc", W1b.astype(band_dtype), feat,
                      preferred_element_type=jnp.float32).astype(band_dtype)

    # ---- merged pass 2 over the concatenated [x-axis | y-axis] support ----
    xpos = _band_limit(xf, w)                                # (bev_h, bev_w)
    W2 = _hat(xpos[:, :, None] - xs[None, None, :]) * \
        not_steep[:, None, None]                             # (bev_h,bev_w,w)
    yposB = _band_limit(yf, h)
    W2b = _hat(yposB[:, :, None] - ygrid[None, None, :]) * \
        steep_f[:, None, None]                               # (bev_h,bev_w,h)
    W2m = jnp.concatenate([W2, W2b], axis=-1).astype(band_dtype)
    tmp = jnp.concatenate([tmpA, tmpB], axis=1)              # (bev_h, w+h, c)
    out = jnp.einsum("rik,rkc->ric", W2m, tmp,
                     preferred_element_type=jnp.float32)
    out = out * valid[..., None]
    return out, valid


def lift_features_to_bev(
    mlvl_feats: Sequence[jax.Array],   # per level (B, cams, h, w, C)
    ego2img: jax.Array,                # (B, cams, 4, 4)
    pc_range: Sequence[float],
    num_z: int,
    bev_hw: Tuple[int, int],
    img_hw: Tuple[int, int],
    out_dtype=jnp.bfloat16,
):
    """Full lift: every (level, camera, z-anchor) plane warped to BEV.

    z anchors match the reference's pillar sampling (`encoder.py:66-67`):
    linspace(0.5, Z-0.5, num_z)/Z over the pc z-range.

    Returns:
      U:     (B, L, cams, Z, bev_h*bev_w, C)
      valid: (B, cams, Z, bev_h*bev_w) from the finest level's footprint
    """
    z_extent = float(pc_range[5]) - float(pc_range[2])   # static
    z_norm = jnp.linspace(0.5, z_extent - 0.5, num_z) / z_extent
    z_anchors = z_norm * z_extent + float(pc_range[2])

    H = plane_homographies(ego2img.astype(jnp.float32), pc_range, z_anchors,
                           bev_hw)                      # (B, cams, Z, 3, 3)

    img_h, img_w = img_hw
    outs = []
    valid0 = None
    for lvl, feat in enumerate(mlvl_feats):
        B, cams, h, w, C = feat.shape
        # homography in feature-pixel coords with the grid_sample
        # align_corners=False shift: xf = u * (w / img_w) - 0.5
        S = jnp.asarray([[w / img_w, 0, -0.5],
                         [0, h / img_h, -0.5],
                         [0, 0, 1.0]], jnp.float32)
        # shift row folds into the projective w row: xf*pw = sx*u*pw - 0.5*pw
        Ml = jnp.einsum("ij,bczjk->bczik", S, H)

        # scan over (cams*Z) to bound the banded-matrix working set
        # (~20 MB per plane at level 0); vmap only over batch.
        f_flat = jnp.broadcast_to(
            feat[:, :, None], (B, cams, num_z, h, w, C)).reshape(
            B, cams * num_z, h, w, C).swapaxes(0, 1)
        m_flat = Ml.reshape(B, cams * num_z, 3, 3).swapaxes(0, 1)

        def warp_plane(args):
            f, m = args      # f: (B, h, w, C), m: (B, 3, 3)
            out, vld = jax.vmap(
                lambda ff, mm: warp_level_to_bev(ff, mm, bev_hw))(f, m)
            return out.astype(out_dtype), vld

        out, valid = jax.lax.map(warp_plane, (f_flat, m_flat))
        out = out.swapaxes(0, 1).reshape(B, cams, num_z, -1, C)
        outs.append(out)
        if lvl == 0:
            valid0 = valid.swapaxes(0, 1).reshape(B, cams, num_z, -1)
    U = jnp.stack(outs, axis=1)       # (B, L, cams, Z, Q, C)
    return U, valid0


def lift_and_average(
    mlvl_feats: Sequence[jax.Array],   # per level (B, cams, h, w, C)
    ego2img: jax.Array,                # (B, cams, 4, 4)
    pc_range: Sequence[float],
    num_z: int,
    bev_hw: Tuple[int, int],
    img_hw: Tuple[int, int],
    out_dtype=jnp.bfloat16,
):
    """Lift + camera-average in one pass (never materialises the per-camera
    volume): U_bar[b,l,z,q] = sum_cam U / count[b,q], count = #cameras where
    any z-anchor of query q is visible — the reference SCA's scatter-add +
    clamp(count) normalisation (`spatial_cross_attention.py:165-172`).

    Returns (U_bar (B, L, Z, Q, C) out_dtype, count (B, Q) f32).
    """
    z_extent = float(pc_range[5]) - float(pc_range[2])   # static
    z_norm = jnp.linspace(0.5, z_extent - 0.5, num_z) / z_extent
    z_anchors = z_norm * z_extent + float(pc_range[2])
    H = plane_homographies(ego2img.astype(jnp.float32), pc_range, z_anchors,
                           bev_hw)                        # (B, cams, Z, 3, 3)
    img_h, img_w = img_hw
    bev_h, bev_w = bev_hw
    Q = bev_h * bev_w

    u_levels = []
    count = None
    for lvl, feat in enumerate(mlvl_feats):
        B, cams, h, w, C = feat.shape
        S = jnp.asarray([[w / img_w, 0, -0.5],
                         [0, h / img_h, -0.5],
                         [0, 0, 1.0]], jnp.float32)
        Ml = jnp.einsum("ij,bczjk->bczik", S, H)          # (B, cams, Z, 3, 3)

        feat_cam_major = feat.swapaxes(0, 1)              # (cams, B, h, w, C)
        m_cam_major = Ml.swapaxes(0, 1)                   # (cams, B, Z, 3, 3)

        def z_map(f_b, m_bz):
            # f_b: (B, h, w, C); m_bz: (B, Z, 3, 3).  All z planes in one
            # multi-z warp with batch-leading einsum layouts.
            outs, vlds = jax.vmap(
                lambda ff, mm: warp_level_multi_z(ff, mm, bev_hw))(f_b, m_bz)
            # (B, Z, bev_h, bev_w, C) -> (B, Z, Q, C)
            outs = outs.reshape(f_b.shape[0], num_z, Q, C)
            vlds = vlds.reshape(f_b.shape[0], num_z, Q)
            return outs, vlds

        def cam_body(carry, inputs):
            u_sum, cnt = carry
            f_b, m_bz = inputs
            outs, vlds = z_map(f_b, m_bz)
            return (u_sum + outs,
                    cnt + vlds.any(axis=1).astype(jnp.float32)), None

        init = (jnp.zeros((B, num_z, Q, C), jnp.float32),
                jnp.zeros((B, Q), jnp.float32))
        (u_sum, cnt), _ = jax.lax.scan(
            cam_body, init, (feat_cam_major, m_cam_major))
        u_levels.append(u_sum)
        if lvl == 0:
            # count uses the finest level's footprint (the reference's mask
            # is level-independent; levels differ only by sub-pixel borders)
            count = cnt

    count = jnp.maximum(count, 1.0)
    U_bar = jnp.stack(u_levels, axis=1) / count[:, None, None, :, None]
    return U_bar.astype(out_dtype), count


def warp_level_multi_z(
    feat: jax.Array,       # (h, w, C) one camera feature level
    Mz: jax.Array,         # (Z, 3, 3) feature-pixel homographies, one per z
    bev_hw: Tuple[int, int],
    eps: float = 1e-4,
    band_dtype=jnp.bfloat16,
) -> Tuple[jax.Array, jax.Array]:
    """All z-planes of one (camera, level) in one shot, with einsum operand
    layouts arranged batch-leading so XLA's batched matmuls run without
    relayout copies (the vmapped per-plane version spends most of its time in
    transposes).  Same math as `warp_level_to_bev`.

    Returns (out (Z, bev_h, bev_w, C) f32, valid (Z, bev_h, bev_w) bool).
    """
    h, w, C = feat.shape
    bev_h, bev_w = bev_hw
    Z = Mz.shape[0]
    f32 = jnp.float32

    ix = jnp.arange(bev_w, dtype=f32)
    iy = jnp.arange(bev_h, dtype=f32)
    xs = jnp.arange(w, dtype=f32)
    ygrid = jnp.arange(h, dtype=f32)

    # dense projective coords: (Z, bev_h, bev_w)
    px = (Mz[:, 0, 0, None, None] * ix[None, None, :]
          + Mz[:, 0, 1, None, None] * iy[None, :, None]
          + Mz[:, 0, 2, None, None])
    py = (Mz[:, 1, 0, None, None] * ix[None, None, :]
          + Mz[:, 1, 1, None, None] * iy[None, :, None]
          + Mz[:, 1, 2, None, None])
    pw = (Mz[:, 2, 0, None, None] * ix[None, None, :]
          + Mz[:, 2, 1, None, None] * iy[None, :, None]
          + Mz[:, 2, 2, None, None])
    in_front = pw > eps
    xf = px / jnp.where(in_front, pw, eps)
    yf = py / jnp.where(in_front, pw, eps)
    valid = (in_front & (xf > -0.5) & (xf < w - 0.5)
             & (yf > -0.5) & (yf < h - 0.5))

    # image line of BEV row r for plane z: through p_inf = M[:,0] and
    # p_r = M[:,1]*r + M[:,2]  -> (Z, bev_h, 3)
    p_inf = Mz[:, :, 0]                                    # (Z, 3)
    p_r = Mz[:, None, :, 1] * iy[None, :, None] + Mz[:, None, :, 2]
    line = jnp.cross(jnp.broadcast_to(p_inf[:, None, :], p_r.shape), p_r)
    l0, l1, l2 = line[..., 0], line[..., 1], line[..., 2]  # (Z, bev_h)
    steep = jnp.abs(l1) < jnp.abs(l0)
    safe = lambda d: jnp.where(jnp.abs(d) < 1e-8,          # noqa: E731
                               jnp.where(d < 0, -1e-8, 1e-8), d)
    a = -l0 / safe(l1)
    b = -l2 / safe(l1)
    a2 = -l1 / safe(l0)
    b2 = -l2 / safe(l0)

    featw = jnp.transpose(feat, (1, 0, 2)).astype(band_dtype)  # (w, h, C)
    not_steep = (~steep).astype(f32)
    steep_f = steep.astype(f32)

    # pass 1 A: batch x leading on both operands.
    # W1 (x, Z*bev_h, h); out (x, Z*bev_h, C)
    ypos = a[None, :, :] * xs[:, None, None] + b[None, :, :]   # (w, Z, r)
    ypos = _band_limit(ypos, h).reshape(w, Z * bev_h)
    W1 = _hat(ypos[:, :, None] - ygrid[None, None, :])
    tmpA = jnp.einsum("xrh,xhc->xrc", W1.astype(band_dtype), featw,
                      preferred_element_type=jnp.float32)
    # -> (Z, r, x, C)
    tmpA = jnp.transpose(tmpA.reshape(w, Z, bev_h, C), (1, 2, 0, 3))

    # pass 1 B: batch y leading. W1b (h, Z*r, w); feat (h, w, C)
    xposB = a2[None, :, :] * ygrid[:, None, None] + b2[None, :, :]
    xposB = _band_limit(xposB, w).reshape(h, Z * bev_h)
    W1b = _hat(xposB[:, :, None] - xs[None, None, :])
    tmpB = jnp.einsum("yrx,yxc->yrc", W1b.astype(band_dtype),
                      feat.astype(band_dtype),
                      preferred_element_type=jnp.float32)
    tmpB = jnp.transpose(tmpB.reshape(h, Z, bev_h, C), (1, 2, 0, 3))

    # merged pass 2: batch (Z*r) leading on both operands.
    xpos = _band_limit(xf, w)                                  # (Z, r, i)
    W2 = _hat(xpos[..., None] - xs[None, None, None, :]) * \
        not_steep[..., None, None]
    yposB = _band_limit(yf, h)
    W2b = _hat(yposB[..., None] - ygrid[None, None, None, :]) * \
        steep_f[..., None, None]
    W2m = jnp.concatenate([W2, W2b], axis=-1)        # (Z, r, i, w+h)
    tmp = jnp.concatenate([tmpA, tmpB], axis=2)      # (Z, r, w+h, C)
    out = jnp.einsum("zrik,zrkc->zric", W2m.astype(band_dtype),
                     tmp.astype(band_dtype),
                     preferred_element_type=jnp.float32)
    out = out * valid[..., None]
    return out, valid


def _pass1_multi_z(feat, Mz, bev_hw, band_dtype=jnp.bfloat16, eps=1e-4):
    """Pass-1 of the two-pass warp for all z planes of one camera level.

    Returns (tmp (Z, bev_h, w+h, C), W2m (Z, bev_h, bev_w, w+h) bf16 with
    validity folded in, valid (Z, bev_h, bev_w) bool)."""
    h, w, C = feat.shape
    bev_h, bev_w = bev_hw
    Z = Mz.shape[0]
    f32 = jnp.float32
    ix = jnp.arange(bev_w, dtype=f32)
    iy = jnp.arange(bev_h, dtype=f32)
    xs = jnp.arange(w, dtype=f32)
    ygrid = jnp.arange(h, dtype=f32)

    px = (Mz[:, 0, 0, None, None] * ix[None, None, :]
          + Mz[:, 0, 1, None, None] * iy[None, :, None]
          + Mz[:, 0, 2, None, None])
    py = (Mz[:, 1, 0, None, None] * ix[None, None, :]
          + Mz[:, 1, 1, None, None] * iy[None, :, None]
          + Mz[:, 1, 2, None, None])
    pw = (Mz[:, 2, 0, None, None] * ix[None, None, :]
          + Mz[:, 2, 1, None, None] * iy[None, :, None]
          + Mz[:, 2, 2, None, None])
    in_front = pw > eps
    xf = px / jnp.where(in_front, pw, eps)
    yf = py / jnp.where(in_front, pw, eps)
    valid = (in_front & (xf > -0.5) & (xf < w - 0.5)
             & (yf > -0.5) & (yf < h - 0.5))

    p_inf = Mz[:, :, 0]
    p_r = Mz[:, None, :, 1] * iy[None, :, None] + Mz[:, None, :, 2]
    line = jnp.cross(jnp.broadcast_to(p_inf[:, None, :], p_r.shape), p_r)
    l0, l1, l2 = line[..., 0], line[..., 1], line[..., 2]
    steep = jnp.abs(l1) < jnp.abs(l0)
    safe = lambda d: jnp.where(jnp.abs(d) < 1e-8,          # noqa: E731
                               jnp.where(d < 0, -1e-8, 1e-8), d)
    a = -l0 / safe(l1)
    b = -l2 / safe(l1)
    a2 = -l1 / safe(l0)
    b2 = -l2 / safe(l0)

    featw = jnp.transpose(feat, (1, 0, 2)).astype(band_dtype)  # (w, h, C)
    ypos = a[None, :, :] * xs[:, None, None] + b[None, :, :]
    ypos = _band_limit(ypos, h).reshape(w, Z * bev_h)
    W1 = _hat(ypos[:, :, None] - ygrid[None, None, :])
    tmpA = jnp.einsum("xrh,xhc->xrc", W1.astype(band_dtype), featw,
                      preferred_element_type=jnp.float32)
    tmpA = jnp.transpose(tmpA.reshape(w, Z, bev_h, C), (1, 2, 0, 3))

    xposB = a2[None, :, :] * ygrid[:, None, None] + b2[None, :, :]
    xposB = _band_limit(xposB, w).reshape(h, Z * bev_h)
    W1b = _hat(xposB[:, :, None] - xs[None, None, :])
    tmpB = jnp.einsum("yrx,yxc->yrc", W1b.astype(band_dtype),
                      feat.astype(band_dtype),
                      preferred_element_type=jnp.float32)
    tmpB = jnp.transpose(tmpB.reshape(h, Z, bev_h, C), (1, 2, 0, 3))
    tmp = jnp.concatenate([tmpA, tmpB], axis=2).astype(band_dtype)

    not_steep = (~steep).astype(f32)
    steep_f = steep.astype(f32)
    xpos = _band_limit(xf, w)
    W2 = _hat(xpos[..., None] - xs[None, None, None, :]) * \
        not_steep[..., None, None]
    yposB = _band_limit(yf, h)
    W2b = _hat(yposB[..., None] - ygrid[None, None, None, :]) * \
        steep_f[..., None, None]
    W2m = jnp.concatenate([W2, W2b], axis=-1)
    # fold the per-(cam, z, cell) validity into the pass-2 weights so the
    # camera sum needs no separate mask/accumulator traffic
    W2m = (W2m * valid[..., None]).astype(band_dtype)
    return tmp, W2m, valid


def lift_and_average_fused(
    mlvl_feats: Sequence[jax.Array],   # per level (B, cams, h, w, C)
    ego2img: jax.Array,                # (B, cams, 4, 4)
    pc_range: Sequence[float],
    num_z: int,
    bev_hw: Tuple[int, int],
    img_hw: Tuple[int, int],
    out_dtype=jnp.bfloat16,
):
    """`lift_and_average` with the camera sum folded into one pass-2 einsum
    per level: out[z,q,c] = sum_{cam,k} W2m[cam,z,q,k] * tmp[cam,z,k,c] — no
    per-camera accumulator round-trips."""
    z_extent = float(pc_range[5]) - float(pc_range[2])
    z_norm = jnp.linspace(0.5, z_extent - 0.5, num_z) / z_extent
    z_anchors = z_norm * z_extent + float(pc_range[2])
    H = plane_homographies(ego2img.astype(jnp.float32), pc_range, z_anchors,
                           bev_hw)
    img_h, img_w = img_hw
    bev_h, bev_w = bev_hw
    Q = bev_h * bev_w

    u_levels = []
    count = None
    for lvl, feat in enumerate(mlvl_feats):
        B, cams, h, w, C = feat.shape
        S = jnp.asarray([[w / img_w, 0, -0.5],
                         [0, h / img_h, -0.5],
                         [0, 0, 1.0]], jnp.float32)
        Ml = jnp.einsum("ij,bczjk->bczik", S, H)

        def one_batch(f_c, m_c):
            tmp, W2m, valid = jax.vmap(
                lambda ff, mm: _pass1_multi_z(ff, mm, bev_hw))(f_c, m_c)
            out = jnp.einsum("mzrik,mzrkc->zric", W2m, tmp,
                             preferred_element_type=jnp.float32)
            cnt = valid.any(axis=1).sum(axis=0).astype(jnp.float32)
            return out.reshape(num_z, Q, C), cnt.reshape(Q)

        out, cnt = jax.vmap(one_batch)(feat, Ml)
        u_levels.append(out)
        if lvl == 0:
            count = cnt
    count = jnp.maximum(count, 1.0)
    U_bar = jnp.stack(u_levels, axis=1) / count[:, None, None, :, None]
    return U_bar.astype(out_dtype), count
