"""Data-layer tests: quaternion utils vs analytic cases, samplers' shard
guarantees, pipeline transforms, camera-matrix construction on a synthetic
infos dict, ego-origin extraction."""

import os

import numpy as np
import pytest

from occnet_tpu.data.quat import quat_to_rot, quaternion_yaw, transform_matrix
from occnet_tpu.data.sampler import (
    contiguous_shard_indices, shuffled_shard_indices)
from occnet_tpu.data.pipeline import (
    _hsv_to_rgb, _rgb_to_hsv, normalize_img, pad_to_divisor)
from occnet_tpu.data.nuscenes import build_camera_matrices
from occnet_tpu.evaluation.ego_pose import extract_ego_origins, pad_origins


def test_quat_identity_and_yaw():
    np.testing.assert_allclose(quat_to_rot([1, 0, 0, 0]), np.eye(3),
                               atol=1e-12)
    # 90deg about z: w=cos(45), z=sin(45)
    q = [np.cos(np.pi / 4), 0, 0, np.sin(np.pi / 4)]
    R = quat_to_rot(q)
    np.testing.assert_allclose(R @ [1, 0, 0], [0, 1, 0], atol=1e-12)
    np.testing.assert_allclose(quaternion_yaw(q), np.pi / 2, atol=1e-12)


def test_transform_matrix_inverse():
    q = [np.cos(0.3), 0.1, 0.2, np.sin(0.3)]
    q = q / np.linalg.norm(q)
    t = [1.0, -2.0, 0.5]
    m = transform_matrix(t, q)
    mi = transform_matrix(t, q, inverse=True)
    np.testing.assert_allclose(m @ mi, np.eye(4), atol=1e-12)


def test_shuffled_shards_cover_everything():
    n, shards = 103, 8
    all_idx = np.concatenate([
        shuffled_shard_indices(n, shards, s, epoch=3) for s in range(shards)])
    assert len(all_idx) == -(-n // shards) * shards
    assert set(all_idx.tolist()) == set(range(n))
    # deterministic per epoch
    a = shuffled_shard_indices(n, shards, 2, epoch=3)
    b = shuffled_shard_indices(n, shards, 2, epoch=3)
    np.testing.assert_array_equal(a, b)
    c = shuffled_shard_indices(n, shards, 2, epoch=4)
    assert not np.array_equal(a, c)


def test_contiguous_shards_are_ordered_blocks():
    n, shards = 10, 4
    blocks = [contiguous_shard_indices(n, shards, s) for s in range(shards)]
    flat = np.concatenate(blocks)
    assert len(flat) == 12
    # concatenation preserves dataset order (the eval-collection guarantee)
    np.testing.assert_array_equal(flat[:n], np.arange(n))


def test_hsv_roundtrip():
    rng = np.random.RandomState(0)
    img = rng.uniform(0, 255, (5, 7, 3)).astype(np.float32)
    back = _hsv_to_rgb(_rgb_to_hsv(img))
    np.testing.assert_allclose(back, img, atol=1e-3)


def test_normalize_and_pad():
    img = np.ones((2, 30, 50, 3), np.float32) * 100
    out = normalize_img(img, [100, 100, 100], [2, 2, 2])
    np.testing.assert_allclose(out, 0.0)
    padded = pad_to_divisor(img, 32)
    assert padded.shape == (2, 32, 64, 3)
    assert padded[:, 30:].sum() == 0


def _synthetic_info(token="tok0", scene="scene-001", offset=(0.0, 0.0)):
    cams = {}
    # camera axes in lidar frame: x right (-y_l), y down (-z_l), z forward
    # (+x_l), yawed per camera
    base = np.array([[0.0, 0.0, 1.0], [-1.0, 0.0, 0.0], [0.0, -1.0, 0.0]])
    for i, name in enumerate(["CAM_FRONT", "CAM_FRONT_RIGHT", "CAM_FRONT_LEFT",
                              "CAM_BACK", "CAM_BACK_LEFT", "CAM_BACK_RIGHT"]):
        a = 2 * np.pi * i / 6
        Rz = np.array([[np.cos(a), -np.sin(a), 0],
                       [np.sin(a), np.cos(a), 0], [0, 0, 1.0]])
        R = Rz @ base
        cams[name] = {
            "data_path": f"imgs/{name}.jpg",
            "cam_intrinsic": np.array([[1000.0, 0, 800], [0, 1000, 450],
                                       [0, 0, 1]]),
            "sensor2lidar_rotation": R,
            "sensor2lidar_translation": np.array([1.0, 0.0, 1.5]),
        }
    return {
        "token": token,
        "cams": cams,
        "lidar2ego_translation": [0.94, 0.0, 1.84],
        "lidar2ego_rotation": [1.0, 0.0, 0.0, 0.0],
        "ego2global_translation": [100.0 + offset[0], 50.0 + offset[1], 0.0],
        "ego2global_rotation": [1.0, 0.0, 0.0, 0.0],
        "occ_path": f"openocc_v2/{scene}/{token}/labels.npz",
        "timestamp": 0,
    }


def test_build_camera_matrices_projects_sanely():
    geo = build_camera_matrices(_synthetic_info())
    assert geo["lidar2img"].shape == (6, 4, 4)
    # a point 10m in front of the front camera should project inside image
    l2i = geo["lidar2img"][0]
    p = l2i @ np.array([11.0, 0.0, 1.5, 1.0])   # in front of cam at x=1+10
    xy = p[:2] / p[2]
    assert p[2] > 0
    assert 0 < xy[0] < 1600 and 0 < xy[1] < 900


def test_ego_origin_extraction():
    infos = [_synthetic_info(f"tok{i}", "scene-001", offset=(5.0 * i, 0.0))
             for i in range(12)]
    out = extract_ego_origins(infos)
    assert len(out) == 12
    token, origins = out[0]
    assert token == "tok0"
    # frames further than 39m from tok0 are dropped; 5m spacing -> 8 frames
    # within bound (0..35m), all at |x| < 39
    assert origins.shape[1] == 3
    assert (np.abs(origins[:, 0]) < 39).all()
    padded, valid = pad_origins(origins, 8)
    assert padded.shape == (8, 3)
    assert valid.sum() == min(len(origins), 8)
    # the reference frame itself contributes the lidar->ego-transformed zero
    # origin
    lidar2ego_t = np.array([0.94, 0.0, 1.84])
    assert any(np.allclose(o, lidar2ego_t, atol=1e-5) for o in origins)


def test_prefetch_loader_order_and_determinism(tmp_path):
    """PrefetchLoader yields batches in index order with deterministic
    augmentation RNG."""
    from occnet_tpu.data.loader import PrefetchLoader

    class FakeDataset:
        def get_sample(self, idx, rng=None):
            jitter = 0.0 if rng is None else rng.rand()
            return {"img": np.full((2, 2), idx, np.float32) + jitter,
                    "idx": idx}

        def collate(self, samples):
            return {"img": np.stack([s["img"] for s in samples]),
                    "idx": [s["idx"] for s in samples]}

    ds = FakeDataset()
    indices = list(range(10))
    ld1 = list(PrefetchLoader(ds, 2, indices, seed=3, epoch=1,
                              num_workers=3, prefetch=2))
    ld2 = list(PrefetchLoader(ds, 2, indices, seed=3, epoch=1,
                              num_workers=2, prefetch=1))
    assert len(ld1) == 5
    assert [b["idx"] for b in ld1] == [[0, 1], [2, 3], [4, 5], [6, 7], [8, 9]]
    for b1, b2 in zip(ld1, ld2):
        np.testing.assert_array_equal(b1["img"], b2["img"])
    # different epoch -> different augmentation
    ld3 = list(PrefetchLoader(ds, 2, indices, seed=3, epoch=2))
    assert not all(np.array_equal(a["img"], b["img"])
                   for a, b in zip(ld1, ld3))


def test_device_normalize_matches_host(tmp_path):
    """uint8 upload + on-device normalise/pad == host-normalised pipeline,
    bitwise, at BOTH divisor-aligned and unaligned (nuScenes-900-like) image
    sizes — the device path normalises then pads, matching the host order."""
    import sys
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from test_cli import _write_miniset
    import jax
    import jax.numpy as jnp
    from occnet_tpu.config import get_config
    from occnet_tpu.data import NuSceneOccDataset
    from occnet_tpu.data.pipeline import make_device_normalizer
    import dataclasses

    cfg = get_config("tiny_occ")
    m = cfg.model
    for case, (ih, iw) in (("aligned", (m.img_h, m.img_w)),
                           ("unaligned", (90, 160))):
        root = str(tmp_path / f"data_{case}")
        os.makedirs(root, exist_ok=True)
        ann = _write_miniset(root, 1, (ih, iw),
                             grid=(m.bev_w, m.bev_h, m.pillar_h))
        dcfg = dataclasses.replace(cfg.data, data_root=root)
        host = NuSceneOccDataset(dcfg, ann, training=False)
        dev = NuSceneOccDataset(dcfg, ann, training=False,
                                device_normalize=True)
        s_host = host.get_sample(0)
        s_dev = dev.get_sample(0)
        assert s_dev["img"].dtype == np.uint8
        assert s_dev["img"].shape[1] == ih       # unpadded upload
        norm = make_device_normalizer(dcfg, dev.size_divisor)
        out = np.asarray(jax.jit(norm)(jnp.asarray(s_dev["img"])))
        assert out.shape == s_host["img"].shape
        np.testing.assert_array_equal(out, s_host["img"])


def test_lightwheel_concat_train_dataset(tmp_path):
    """`base_occ_w_lightwheel`-style construction: nuScenes + LightwheelOcc
    trainsets concatenated via `build_train_dataset`; the lightwheel half
    exercises the quaternion-calibration branch and must produce the same
    camera geometry as the matrix-calibration half (same fixture poses)."""
    import sys
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from test_cli import _write_miniset
    import dataclasses
    from occnet_tpu.config import get_config
    from occnet_tpu.data import ConcatOccDataset, build_train_dataset

    cfg = get_config("base_occ_w_lightwheel")
    assert cfg.data.extra_trainsets           # preset carries the concat
    m = get_config("tiny_occ").model
    nusc_root = str(tmp_path / "nusc")
    lw_root = str(tmp_path / "lightwheel")
    os.makedirs(nusc_root), os.makedirs(lw_root)
    _write_miniset(nusc_root, 2, (m.img_h, m.img_w),
                   grid=(m.bev_w, m.bev_h, m.pillar_h),
                   ann_name="infos_train.pkl")
    _write_miniset(lw_root, 3, (m.img_h, m.img_w),
                   grid=(m.bev_w, m.bev_h, m.pillar_h),
                   version="LightwheelOcc-v1.0", ann_name="lw_train.pkl")

    dcfg = dataclasses.replace(
        get_config("tiny_occ").data, data_root=nusc_root,
        train_ann="infos_train.pkl",
        extra_trainsets=((lw_root, "lw_train.pkl"),))
    ds = build_train_dataset(dcfg, training=False)
    assert isinstance(ds, ConcatOccDataset)
    assert len(ds) == 5
    s_nusc = ds.get_sample(0)
    s_lw = ds.get_sample(2)                   # first lightwheel sample
    assert s_lw["img"].shape == s_nusc["img"].shape
    # same fixture poses -> quaternion branch reproduces the matrix branch
    np.testing.assert_allclose(s_lw["ego2img"], s_nusc["ego2img"],
                               rtol=1e-5, atol=1e-4)
    batch = ds.collate([s_nusc, s_lw])
    assert batch["img"].shape[0] == 2
    # without extra trainsets the factory returns the plain dataset
    plain = build_train_dataset(
        dataclasses.replace(dcfg, extra_trainsets=()), training=False)
    assert not isinstance(plain, ConcatOccDataset) and len(plain) == 2


def test_device_train_augmenter_matches_host_without_distortion():
    """distort=False on uint8 == host normalize->pad bitwise, incl. a
    divisor-unaligned height (the nuScenes 900 case, scaled down)."""
    import dataclasses
    import jax
    from occnet_tpu.config import get_config
    from occnet_tpu.data.pipeline import make_device_train_augmenter

    cfg = get_config("tiny_occ").data
    rng = np.random.RandomState(0)
    imgs = rng.randint(0, 256, (2, 3, 57, 96, 3)).astype(np.uint8)
    mean = np.asarray(cfg.img_mean, np.float32)
    std = np.asarray(cfg.img_std, np.float32)
    if not cfg.to_rgb:
        mean, std = mean[::-1].copy(), std[::-1].copy()
    host = np.stack([pad_to_divisor(normalize_img(s, mean, std), 32)
                     for s in imgs])
    aug = make_device_train_augmenter(cfg, size_divisor=32, distort=False)
    dev = np.asarray(aug(None, jax.numpy.asarray(imgs)))
    assert dev.shape == host.shape == (2, 3, 64, 96, 3)
    np.testing.assert_array_equal(dev, host)
    # float input passes through untouched
    f = jax.numpy.asarray(host)
    assert aug(None, f) is f


def test_hsv_jax_matches_numpy():
    from occnet_tpu.data.pipeline import _hsv_to_rgb_jax, _rgb_to_hsv_jax

    rng = np.random.RandomState(1)
    img = rng.rand(5, 7, 3).astype(np.float32) * 255.0
    np.testing.assert_allclose(np.asarray(_rgb_to_hsv_jax(img)),
                               _rgb_to_hsv(img), rtol=1e-5, atol=1e-3)
    hsv = _rgb_to_hsv(img)
    np.testing.assert_allclose(np.asarray(_hsv_to_rgb_jax(hsv)),
                               _hsv_to_rgb(hsv), rtol=1e-5, atol=1e-3)


def test_photometric_distortion_device_distribution():
    """Each jitter branch fires for ~half the images across keys, and the
    untouched-branch output round-trips the input (HSV-only error)."""
    import jax
    from occnet_tpu.data.pipeline import photometric_distortion_device

    rng = np.random.RandomState(2)
    imgs = rng.randint(0, 256, (32, 6, 8, 3)).astype(np.float32)
    out = np.asarray(jax.jit(photometric_distortion_device)(
        jax.random.PRNGKey(0), jax.numpy.asarray(imgs)))
    assert out.shape == imgs.shape and np.isfinite(out).all()
    # per-image max deviation; HSV round-trip alone is ~1e-3
    dev = np.abs(out - imgs).reshape(32, -1).max(axis=1)
    changed = (dev > 1.0).sum()
    # each of ~6 p=0.5 gates can fire; P(untouched) ~ 3% per image
    assert changed >= 24, f"implausible jitter rate: {changed}/32"
    # deterministic in the key
    out2 = np.asarray(jax.jit(photometric_distortion_device)(
        jax.random.PRNGKey(0), jax.numpy.asarray(imgs)))
    np.testing.assert_array_equal(out, out2)
