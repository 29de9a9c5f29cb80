"""Geometry golden tests: reference points + camera projection vs a numpy
oracle that follows `encoder.py:50-151` of the reference step by step."""

import numpy as np
import jax.numpy as jnp

from occnet_tpu.geometry import (
    bev_reference_points_2d,
    bev_reference_points_3d,
    compose_ego2img,
    project_bev_points_to_cameras,
)

PC_RANGE = (-40.0, -40.0, -1.0, 40.0, 40.0, 5.4)


def test_ref3d_values():
    h, w, d = 4, 5, 3
    z_extent = PC_RANGE[5] - PC_RANGE[2]
    ref = np.asarray(bev_reference_points_3d(h, w, z_extent, d))
    assert ref.shape == (d, h * w, 3)
    # z anchors: linspace(0.5, Z-0.5, d)/Z
    want_z = np.linspace(0.5, z_extent - 0.5, d) / z_extent
    np.testing.assert_allclose(ref[:, 0, 2], want_z, rtol=1e-6)
    # first query is cell (y=0, x=0): x=(0.5)/w, y=(0.5)/h
    np.testing.assert_allclose(ref[0, 0, :2], [0.5 / w, 0.5 / h], rtol=1e-6)
    # query index q = y*w + x
    q = 2 * w + 3
    np.testing.assert_allclose(ref[0, q, :2], [3.5 / w, 2.5 / h], rtol=1e-6)


def test_ref2d_values():
    h, w = 3, 4
    ref = np.asarray(bev_reference_points_2d(h, w))
    assert ref.shape == (h * w, 1, 2)
    q = 1 * w + 2
    np.testing.assert_allclose(ref[q, 0], [2.5 / w, 1.5 / h], rtol=1e-6)


def _numpy_projection_oracle(ref3d, pc_range, lidar2img, ego2lidar, img_hw,
                             eps=1e-5):
    """Follows point_sampling (`encoder.py:104-151`)."""
    d, nq, _ = ref3d.shape
    b, c = lidar2img.shape[:2]
    pc = np.asarray(pc_range)
    xyz = ref3d * (pc[3:6] - pc[0:3]) + pc[0:3]
    xyz1 = np.concatenate([xyz, np.ones_like(xyz[..., :1])], -1)  # (d,nq,4)
    ref_cam = np.zeros((c, b, nq, d, 2))
    mask = np.zeros((c, b, nq, d), bool)
    for bi in range(b):
        for ci in range(c):
            m = lidar2img[bi, ci] @ ego2lidar[bi]
            p = xyz1 @ m.T                                  # (d, nq, 4)
            depth = p[..., 2]
            in_front = depth > eps
            xy = p[..., :2] / np.maximum(depth[..., None], eps)
            xy[..., 0] /= img_hw[1]
            xy[..., 1] /= img_hw[0]
            ok = (in_front & (xy[..., 0] > 0) & (xy[..., 0] < 1)
                  & (xy[..., 1] > 0) & (xy[..., 1] < 1))
            ref_cam[ci, bi] = xy.transpose(1, 0, 2)
            mask[ci, bi] = ok.transpose(1, 0)
    return ref_cam, mask


def test_projection_matches_oracle():
    rng = np.random.RandomState(0)
    b, c, d, h, w = 2, 3, 4, 6, 5
    z_extent = PC_RANGE[5] - PC_RANGE[2]
    ref3d = np.asarray(bev_reference_points_3d(h, w, z_extent, d))

    # plausible pinhole cameras: random rotation + translation + intrinsics
    lidar2img = np.zeros((b, c, 4, 4))
    for bi in range(b):
        for ci in range(c):
            angle = rng.uniform(0, 2 * np.pi)
            R = np.array([[np.cos(angle), -np.sin(angle), 0],
                          [0, 0, -1],
                          [np.sin(angle), np.cos(angle), 0.0]])
            t = rng.uniform(-2, 2, 3)
            K = np.array([[800.0, 0, 700], [0, 800, 450], [0, 0, 1]])
            m = np.eye(4)
            m[:3, :3] = K @ R
            m[:3, 3] = K @ t
            lidar2img[bi, ci] = m
    ego2lidar = np.tile(np.eye(4), (b, 1, 1))
    ego2lidar[:, :3, 3] = rng.uniform(-1, 1, (b, 3))

    img_hw = (900, 1400)
    ego2img = compose_ego2img(jnp.asarray(lidar2img), jnp.asarray(ego2lidar))
    got_ref, got_mask = project_bev_points_to_cameras(
        jnp.asarray(ref3d), PC_RANGE, ego2img, img_hw)
    want_ref, want_mask = _numpy_projection_oracle(
        ref3d, PC_RANGE, lidar2img, ego2lidar, img_hw)

    got_mask = np.asarray(got_mask)
    np.testing.assert_array_equal(got_mask, want_mask)
    # compare projected xy only where visible (outside, values are arbitrary)
    np.testing.assert_allclose(np.asarray(got_ref)[got_mask],
                               want_ref[want_mask], atol=1e-4)
    assert got_mask.any(), "test geometry should have some visible points"


def test_calibration_topk():
    """calibration_topk sizes K to the worst per-camera visible count
    (+2%, 1024-rounded, capped at Q) for a representative frame."""
    import jax.numpy as jnp
    from occnet_tpu.config import get_config
    from occnet_tpu.geometry import calibration_topk
    from tools.train import make_synthetic_batch

    cfg = get_config("base_occ")
    rng = np.random.RandomState(0)
    batch = make_synthetic_batch(cfg, 1, rng)
    k = calibration_topk(cfg.model, jnp.asarray(batch["ego2img"]))
    # the synthetic ring rig sees 9,929-9,999 queries per camera
    assert k == 10240
    # degenerate rig (all cameras see nothing finite): never exceeds Q,
    # stays a positive multiple of 1024, and never returns 0 (0 would mean
    # "dense all-queries" to SCAConfig — ADVICE r3)
    k0 = calibration_topk(cfg.model, jnp.zeros_like(
        jnp.asarray(batch["ego2img"])))
    assert 1024 <= k0 <= cfg.model.bev_h * cfg.model.bev_w and k0 % 1024 == 0
