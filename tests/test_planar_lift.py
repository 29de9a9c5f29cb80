"""Planar-lift tests: exactness on axis-aligned maps, closeness to true
bilinear sampling under projective maps, validity masks, and the full
multi-level lift wiring."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from occnet_tpu.geometry import bev_reference_points_3d
from occnet_tpu.ops.msda import bilinear_sample
from occnet_tpu.ops.planar_lift import (
    lift_features_to_bev,
    plane_homographies,
    warp_level_to_bev,
)

PC_RANGE = (-40.0, -40.0, -1.0, 40.0, 40.0, 5.4)


def direct_sample(feat, M, bev_hw):
    """Oracle: true bilinear sample of feat at the homography positions."""
    h, w, C = feat.shape
    bev_h, bev_w = bev_hw
    iy, ix = np.meshgrid(np.arange(bev_h), np.arange(bev_w), indexing="ij")
    p = (M @ np.stack([ix.ravel(), iy.ravel(),
                       np.ones(ix.size)], 0)).T            # (Q, 3)
    valid = p[:, 2] > 1e-4
    xf = p[:, 0] / np.where(valid, p[:, 2], 1e-4)
    yf = p[:, 1] / np.where(valid, p[:, 2], 1e-4)
    # normalised coords for bilinear_sample (pixel centres at integers)
    loc = np.stack([(xf + 0.5) / w, (yf + 0.5) / h],
                   -1).astype(np.float32)[None, None]
    out = np.asarray(bilinear_sample(
        jnp.asarray(feat.reshape(1, 1, h * w, C)), h, w, jnp.asarray(loc)))
    valid &= ((xf > -0.5) & (xf < w - 0.5) & (yf > -0.5) & (yf < h - 0.5))
    return (out[0, 0] * valid[:, None]).reshape(bev_h, bev_w, C), \
        valid.reshape(bev_h, bev_w)


def test_axis_aligned_exact():
    """Pure scale+translation homography: two-pass == bilinear exactly."""
    rng = np.random.RandomState(0)
    feat = rng.randn(24, 40, 8).astype(np.float32)
    M = np.array([[0.37, 0.0, 2.3], [0.0, 0.21, 1.7], [0.0, 0.0, 1.0]],
                 np.float32)
    got, gv = warp_level_to_bev(jnp.asarray(feat), jnp.asarray(M), (16, 20))
    want, wv = direct_sample(feat, M, (16, 20))
    np.testing.assert_array_equal(np.asarray(gv), wv)
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5)


def test_projective_close_to_bilinear():
    """General homography: two-pass within sub-pixel error of bilinear for a
    smooth feature map."""
    ys, xs = np.meshgrid(np.arange(30), np.arange(48), indexing="ij")
    feat = np.stack([np.sin(xs / 5.0) + ys / 20.0,
                     np.cos(ys / 4.0) * xs / 30.0], -1).astype(np.float32)
    M = np.array([[0.8, 0.15, 3.0], [0.1, 0.5, 2.0],
                  [0.002, 0.004, 1.0]], np.float32)
    got, gv = warp_level_to_bev(jnp.asarray(feat), jnp.asarray(M), (20, 20))
    want, wv = direct_sample(feat, M, (20, 20))
    np.testing.assert_array_equal(np.asarray(gv), wv)
    mask = wv[..., None]
    err = np.abs(np.asarray(got) - want) * mask
    assert err.max() < 0.05, err.max()


def test_behind_camera_masked():
    feat = np.ones((10, 12, 1), np.float32)
    # w row makes half the grid negative-depth
    M = np.array([[0.5, 0.0, 2.0], [0.0, 0.5, 2.0], [0.0, 0.2, -1.0]],
                 np.float32)
    got, gv = warp_level_to_bev(jnp.asarray(feat), jnp.asarray(M), (12, 12))
    gv = np.asarray(gv)
    assert (~gv).any()
    np.testing.assert_allclose(np.asarray(got)[~gv], 0.0, atol=1e-6)


def test_plane_homography_matches_pointwise_projection():
    """M @ (ix, iy, 1) must equal ego2img @ (x(ix), y(iy), z, 1)."""
    rng = np.random.RandomState(3)
    E = np.eye(4); E[:3, :3] = rng.randn(3, 3); E[:3, 3] = rng.randn(3)
    z_anchors = jnp.asarray([0.5, 2.0])
    M = np.asarray(plane_homographies(jnp.asarray(E, jnp.float32)[None],
                                      PC_RANGE, z_anchors, (10, 10)))[0]
    dx = 80.0 / 10
    for zk, z in enumerate([0.5, 2.0]):
        for ix, iy in [(0, 0), (3, 7), (9, 9)]:
            x = -40 + (ix + 0.5) * dx
            y = -40 + (iy + 0.5) * dx
            want = (E @ np.array([x, y, z, 1.0]))[:3]
            got = M[zk] @ np.array([ix, iy, 1.0])
            np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_lift_matches_pillar_projection():
    """End-to-end: lifted features at valid cells equal bilinear samples of
    the image at the projected pillar reference points (same geometry as
    project_bev_points_to_cameras)."""
    rng = np.random.RandomState(1)
    img_hw = (64, 96)
    bev_hw = (12, 12)
    num_z = 3
    # one synthetic forward camera
    K = np.array([[60.0, 0, 48], [0, 60, 32], [0, 0, 1]])
    R = np.array([[0.0, -1.0, 0.0], [0.0, 0.0, -1.0], [1.0, 0.0, 0.0]])
    E = np.eye(4, dtype=np.float32)
    E[:3, :3] = K @ R
    ego2img = jnp.asarray(E)[None, None]

    h, w, C = 8, 12, 4          # one level, stride 8
    # smooth feature map: the two-pass warp samples the line's own heights at
    # the two x-neighbours (sub-pixel deviation from true bilinear), which
    # only agrees with the oracle on smooth signals
    ys, xs = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    feat = np.stack([np.sin(xs / 3.0 + c) + np.cos(ys / 2.0 - c) * 0.5
                     for c in range(C)], -1).astype(np.float32)
    feats = [jnp.asarray(feat)[None, None]]

    U, valid = lift_features_to_bev(feats, ego2img, PC_RANGE, num_z, bev_hw,
                                    img_hw, out_dtype=jnp.float32)
    assert U.shape == (1, 1, 1, num_z, bev_hw[0] * bev_hw[1], C)
    got = np.asarray(U[0, 0, 0])            # (Z, Q, C)
    vld = np.asarray(valid[0, 0])           # (Z, Q)
    assert vld.any()

    # oracle via the pillar projection used by the exact path
    from occnet_tpu.geometry import project_bev_points_to_cameras
    ref3d = bev_reference_points_3d(bev_hw[0], bev_hw[1],
                                    PC_RANGE[5] - PC_RANGE[2], num_z)
    ref_cam, mask = project_bev_points_to_cameras(ref3d, PC_RANGE, ego2img,
                                                  img_hw)
    ref_cam = np.asarray(ref_cam)[0, 0]     # (Q, Z, 2) normalised to image
    loc = jnp.asarray(ref_cam.transpose(1, 0, 2)[None, None])  # (1,1,Z*?)...
    loc = loc.reshape(1, 1, -1, 2)
    sampled = np.asarray(bilinear_sample(
        jnp.asarray(feat.reshape(1, 1, h * w, C)), h, w, loc))
    want = sampled.reshape(num_z, -1, C)

    sel = vld & np.asarray(mask)[0, 0].T    # (Z, Q) both-valid
    assert sel.any()
    np.testing.assert_allclose(got[sel], want[sel], atol=0.06, rtol=0.05)


def test_fused_lift_matches_scan_lift():
    """lift_and_average_fused must equal lift_and_average."""
    from occnet_tpu.ops.planar_lift import (lift_and_average,
                                            lift_and_average_fused)
    rng = np.random.RandomState(0)
    img_hw = (64, 96)
    feats = []
    for s in (8, 16):
        h, w = img_hw[0] // s, img_hw[1] // s
        feats.append(jnp.asarray(
            rng.randn(1, 3, h, w, 16).astype(np.float32)))
    ego2img = np.zeros((1, 3, 4, 4), np.float32)
    K = np.array([[60.0, 0, 48], [0, 60, 32], [0, 0, 1]])
    base = np.array([[0.0, -1.0, 0.0], [0.0, 0.0, -1.0], [1.0, 0.0, 0.0]])
    for ci in range(3):
        a = 2 * np.pi * ci / 3
        Rz = np.array([[np.cos(a), -np.sin(a), 0],
                       [np.sin(a), np.cos(a), 0], [0, 0, 1.0]])
        m = np.eye(4, dtype=np.float32)
        m[:3, :3] = K @ (Rz @ base).T
        ego2img[0, ci] = m
    ego2img = jnp.asarray(ego2img)

    a1, c1 = lift_and_average(feats, ego2img, PC_RANGE, 4, (14, 14), img_hw)
    a2, c2 = lift_and_average_fused(feats, ego2img, PC_RANGE, 4, (14, 14),
                                    img_hw)
    np.testing.assert_array_equal(np.asarray(c1), np.asarray(c2))
    d = np.abs(np.asarray(a1, np.float32) - np.asarray(a2, np.float32))
    assert d.max() < 0.05, d.max()   # bf16 accumulation-order differences
    assert np.asarray(c1).max() >= 1
