"""BEV/camera geometry: reference-point generation and camera projection.

TPU-native equivalents of `BEVFormerEncoder.get_reference_points`
(`encoder.py:50-89`) and `point_sampling` (`encoder.py:92-151`) in the
reference — pure batched einsum/broadcast functions, fp32 throughout (the
reference force-casts this path to fp32, `encoder.py:91-92`).

Conventions (matching the reference):
- BEV queries are laid out row-major over (h, w) = (y, x); normalised
  coordinates use pixel centres: (i + 0.5) / extent.
- 3D reference points: `num_points_in_pillar` z-anchors per BEV cell,
  normalised xyz in [0,1]^3 over the pc_range box.
- Camera projection composes `lidar2img @ ego2lidar` per camera and divides by
  depth; visibility = depth > eps and projected point strictly inside the
  (padded) image.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp


def bev_reference_points_3d(
    bev_h: int, bev_w: int, z_range: float, num_points_in_pillar: int,
) -> jax.Array:
    """3D pillar reference points for spatial cross-attention.

    Returns (num_points_in_pillar, bev_h*bev_w, 3) normalised xyz, matching
    `get_reference_points(..., dim='3d')` (`encoder.py:65-75`): z-anchors at
    linspace(0.5, Z-0.5, D)/Z, xy at cell centres.
    """
    d = num_points_in_pillar
    zs = jnp.linspace(0.5, z_range - 0.5, d, dtype=jnp.float32) / z_range
    xs = (jnp.arange(bev_w, dtype=jnp.float32) + 0.5) / bev_w
    ys = (jnp.arange(bev_h, dtype=jnp.float32) + 0.5) / bev_h
    # (d, h, w) grids
    zg = jnp.broadcast_to(zs[:, None, None], (d, bev_h, bev_w))
    xg = jnp.broadcast_to(xs[None, None, :], (d, bev_h, bev_w))
    yg = jnp.broadcast_to(ys[None, :, None], (d, bev_h, bev_w))
    ref = jnp.stack([xg, yg, zg], axis=-1)            # (d, h, w, 3)
    return ref.reshape(d, bev_h * bev_w, 3)


def bev_reference_points_2d(bev_h: int, bev_w: int) -> jax.Array:
    """2D BEV-plane reference points for temporal self-attention.

    Returns (bev_h*bev_w, 1, 2) normalised xy (1 = num_levels), matching
    `get_reference_points(..., dim='2d')` (`encoder.py:78-89`).
    """
    ys, xs = jnp.meshgrid(
        (jnp.arange(bev_h, dtype=jnp.float32) + 0.5) / bev_h,
        (jnp.arange(bev_w, dtype=jnp.float32) + 0.5) / bev_w,
        indexing="ij",
    )
    ref = jnp.stack([xs.reshape(-1), ys.reshape(-1)], axis=-1)
    return ref[:, None, :]


def project_bev_points_to_cameras(
    ref_3d: jax.Array,           # (D, Nq, 3) normalised xyz
    pc_range: Sequence[float],
    ego2img: jax.Array,          # (B, num_cams, 4, 4) = lidar2img @ ego2lidar
    img_hw: Tuple[int, int],     # padded image (h, w) used for normalisation
    eps: float = 1e-5,
) -> Tuple[jax.Array, jax.Array]:
    """Project pillar reference points into every camera.

    Equivalent of `point_sampling` (`encoder.py:92-151`) with the two 4x4
    matmuls pre-composed into `ego2img` (done once per batch outside the
    encoder loop instead of per layer).  All math fp32.

    Returns:
      ref_cam: (num_cams, B, Nq, D, 2) normalised image xy in [0,1]
      mask:    (num_cams, B, Nq, D) bool visibility
    """
    pc = jnp.asarray(pc_range, dtype=jnp.float32)
    ref = ref_3d.astype(jnp.float32)
    xyz = ref * (pc[3:6] - pc[0:3]) + pc[0:3]          # (D, Nq, 3) metres (ego)
    xyz1 = jnp.concatenate([xyz, jnp.ones_like(xyz[..., :1])], axis=-1)

    # (B, C, 4, 4) @ (D, Nq, 4) -> (B, C, D, Nq, 4)
    pts = jnp.einsum(
        "bcij,dqj->bcdqi", ego2img.astype(jnp.float32), xyz1,
        preferred_element_type=jnp.float32)

    depth = pts[..., 2:3]
    in_front = depth > eps
    xy = pts[..., 0:2] / jnp.maximum(depth, eps)
    h, w = img_hw
    xy = xy / jnp.asarray([w, h], dtype=jnp.float32)

    mask = (
        in_front[..., 0]
        & (xy[..., 0] > 0.0) & (xy[..., 0] < 1.0)
        & (xy[..., 1] > 0.0) & (xy[..., 1] < 1.0)
    )
    # NaNs (degenerate projections) are masked out like torch.nan_to_num on the
    # reference's bool mask (`encoder.py:140-144`).
    mask = mask & jnp.isfinite(xy).all(axis=-1)
    xy = jnp.nan_to_num(xy)

    # -> (C, B, Nq, D, 2) / (C, B, Nq, D), the layout SCA consumes
    # (reference comment `spatial_cross_attention.py:135`).
    ref_cam = jnp.transpose(xy, (1, 0, 3, 2, 4))
    vis = jnp.transpose(mask, (1, 0, 3, 2))
    return ref_cam, vis


def compose_ego2img(lidar2img: jax.Array, ego2lidar: jax.Array) -> jax.Array:
    """Fold the reference's per-point double matmul (`encoder.py:126`) into one
    per-camera matrix: ego2img = lidar2img @ ego2lidar.

    lidar2img: (B, C, 4, 4); ego2lidar: (B, 4, 4) -> (B, C, 4, 4)
    """
    return jnp.einsum(
        "bcij,bjk->bcik",
        lidar2img.astype(jnp.float32),
        ego2lidar.astype(jnp.float32),
        preferred_element_type=jnp.float32,
    )


def calibration_topk(
    model_cfg,
    ego2img: jax.Array,      # (B, cams, 4, 4) for one representative frame
    margin: float = 1.02,
    multiple: int = 1024,
    per_camera: bool = False,
):
    """Calibration-derived SCA top-K: project the BEV pillar grid through one
    frame's cameras and size `max_queries_per_cam` to the worst per-camera
    visible-query count (+margin, rounded up to `multiple`, capped at Q).
    With `per_camera=True`, return a per-camera tuple K_c instead (for
    `SCAConfig.per_cam_topk`): narrow-FoV cameras get a smaller K than wide
    ones, cutting SCA sampling rows on asymmetric rigs like nuScenes (five
    ~70-degree cameras + one 110-degree back camera).

    The TPU analogue of the reference's dynamic per-camera `max_len`
    (`spatial_cross_attention.py:141`): the camera rig is constant per
    dataset, so one frame bounds them all up to calibration drift — and the
    `sca_topk_overflow` certificate still hard-fails eval if any frame ever
    exceeds the chosen K (tools/test.py).
    """
    m = model_cfg
    q = m.bev_h * m.bev_w
    ref3d = bev_reference_points_3d(
        m.bev_h, m.bev_w, m.pc_range[5] - m.pc_range[2],
        m.encoder.num_points_in_pillar)
    _, bev_mask = project_bev_points_to_cameras(
        ref3d, m.pc_range, ego2img, (m.img_h, m.img_w))
    import numpy as np

    # clamp below by one `multiple`: a degenerate camera (no visible
    # queries) would otherwise get 0, which SCAConfig interprets as "dense
    # all-Q" — the opposite of a small compaction (ADVICE r3)
    def snap(count: int) -> int:
        return min(q, max(multiple, -(-int(count * margin) // multiple)
                          * multiple))

    vis_counts = (np.asarray(bev_mask).sum(-1) > 0).sum(-1)   # (cams, B)
    if per_camera:
        return tuple(snap(int(c)) for c in vis_counts.max(-1))
    return snap(int(vis_counts.max()))
