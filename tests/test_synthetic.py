"""Synthetic geometric benchmark tests: scene generation, camera-render
geometric consistency, dataset protocol, and the parameterized ray-metric
geometry (cubic tiny grid) round-tripping GT-vs-GT at RayIoU == 1.0."""

import dataclasses
import os

import numpy as np

import jax.numpy as jnp

from occnet_tpu.config import synth_tiny_occ
from occnet_tpu.data.synthetic import (
    FREE_ID, GROUND_ID, SyntheticOccDataset, class_palette, make_scene,
    ring_camera_rig, render_views)

OCC_SIZE = (20, 20, 6)
PC_RANGE = (-8.0, -8.0, -1.0, 8.0, 8.0, 3.8)    # cubic 0.8 m voxels
IMG_HW = (32, 64)


def test_make_scene_structure():
    sem, flow = make_scene(0, OCC_SIZE)
    assert sem.shape == OCC_SIZE and flow.shape == OCC_SIZE + (2,)
    # ground plane everywhere the bottom layer wasn't overwritten by a box
    assert (sem[:, :, 0] != FREE_ID).all()
    assert (sem[:, :, 0] == GROUND_ID).mean() > 0.5
    # some boxes above ground, free space dominates the upper layers
    assert (sem[:, :, 1:] != FREE_ID).sum() > 0
    assert (sem[:, :, 3:] == FREE_ID).mean() > 0.5
    # determinism + seed sensitivity
    sem2, _ = make_scene(0, OCC_SIZE)
    np.testing.assert_array_equal(sem, sem2)
    assert (make_scene(1, OCC_SIZE)[0] != sem).any()
    # flow: class-determined, zero on static classes
    assert (flow[sem == GROUND_ID] == 0).all()
    box = (sem != FREE_ID) & (sem < 8)
    if box.any():
        assert (np.abs(flow[box]).sum(-1) > 0).all()


def test_render_views_geometry():
    """A box dead ahead of camera 0 (+x) paints the image centre with its
    palette colour; the top rows (above the horizon) stay sky."""
    X, Y, Z = OCC_SIZE
    sem = np.full(OCC_SIZE, FREE_ID, np.int32)
    sem[:, :, 0] = GROUND_ID
    cls = 3                                       # bus
    # ~4-6 m ahead of camera 0 (+x), top at 1.4 m < the 1.5 m camera height
    # so the image's top rows stay sky
    sem[15:18, 9:12, 1:3] = cls
    rig = ring_camera_rig(2, IMG_HW)
    pal = class_palette()
    imgs = np.asarray(render_views(
        jnp.asarray(sem), jnp.asarray(rig["R"]), jnp.asarray(rig["t"]),
        jnp.asarray(rig["K"]), jnp.asarray(pal), IMG_HW, PC_RANGE, 50))
    assert imgs.shape == (2, *IMG_HW, 3) and imgs.dtype == np.uint8
    h, w = IMG_HW
    centre = imgs[0, h // 2 - 2: h // 2 + 2, w // 2 - 2: w // 2 + 2]
    # colour ratio match (shading scales all channels equally)
    c = centre.reshape(-1, 3).mean(0)
    expect = pal[cls] / max(pal[cls].max(), 1e-6)
    got = c / max(c.max(), 1e-6)
    np.testing.assert_allclose(got, expect, atol=0.1)
    # sky at the very top (camera pitched down 10 deg, box below horizon+fov)
    sky = imgs[0, 0, :]
    assert (sky[:, 2].astype(int) >= sky[:, 0].astype(int)).all()
    assert sky[:, 2].mean() > 100


def test_dataset_protocol_and_eval_geometry():
    cfg = synth_tiny_occ()
    # shrink to CPU-test scale, keeping voxels cubic
    model = dataclasses.replace(
        cfg.model, img_h=IMG_HW[0], img_w=IMG_HW[1], num_cams=2,
        pc_range=PC_RANGE)
    data = dataclasses.replace(cfg.data, occ_size=OCC_SIZE)
    ds = SyntheticOccDataset(data, model, 3, seed=0, training=True)
    assert len(ds) == 3
    rng = np.random.RandomState(0)
    s = ds.get_sample(0, rng)
    assert s["img"].shape == (2, *IMG_HW, 3)
    assert s["voxel_semantics"].shape == OCC_SIZE
    assert s["ego2img"].shape == (2, 4, 4)
    batch = ds.collate([ds.get_sample(i, rng) for i in range(2)])
    assert batch["img"].shape == (2, 2, *IMG_HW, 3)

    # render_scale: low-res ray cast + pixel-repeat keeps the model shape
    ds2 = SyntheticOccDataset(data, model, 1, seed=0, training=False,
                              render_scale=2)
    s2 = ds2.get_sample(0)
    assert s2["img"].shape == (2, *IMG_HW, 3)
    # 2x2 blocks are constant (pixel-repeat structure)
    raw = ds2.samples[0][0]
    assert (raw[:, ::2, ::2] == raw[:, 1::2, ::2]).all()
    assert (raw[:, ::2, ::2] == raw[:, ::2, 1::2]).all()

    # ego-origin extraction: one valid origin at the ego centre per sample
    from occnet_tpu.evaluation.ego_pose import extract_ego_origins, \
        pad_origins
    origins = dict(extract_ego_origins(ds.infos))
    assert set(origins) == {"synth-0", "synth-1", "synth-2"}
    np.testing.assert_allclose(origins["synth-0"], np.zeros((1, 3)))

    # parameterized ray-metric geometry: GT-vs-GT scores RayIoU == 1.0 on
    # the tiny cubic grid (validates voxel_size/pc_range plumbing)
    from occnet_tpu.evaluation import (RayMetricAccumulator,
                                       generate_lidar_rays,
                                       occ_score_from_metrics)
    from occnet_tpu.evaluation.ray_metrics import render_pred_gt
    sem = jnp.asarray(s["voxel_semantics"])
    flow = jnp.asarray(s["voxel_flow"])
    rays = jnp.asarray(generate_lidar_rays())
    padded, valid = pad_origins(origins["synth-0"], 8)
    pred, gt = render_pred_gt(sem, flow, sem, flow, rays,
                              jnp.asarray(padded), jnp.asarray(valid),
                              voxel_size=0.8, pc_range=PC_RANGE)
    acc = RayMetricAccumulator()
    acc.update(pred, gt)
    scores = occ_score_from_metrics(acc.finalize())
    assert abs(scores["RayIoU"] - 1.0) < 1e-6
    assert scores["mAVE"] == 0.0 or np.isnan(scores["mAVE"])


def test_dataset_scene_cache_roundtrip(tmp_path):
    """cache_dir: second construction loads bit-identical scenes from disk
    without rendering (the tunnel-flap restart path of tools/synth_learn.py)."""
    cfg = synth_tiny_occ()
    model = dataclasses.replace(
        cfg.model, img_h=IMG_HW[0], img_w=IMG_HW[1], num_cams=2,
        pc_range=PC_RANGE)
    data = dataclasses.replace(cfg.data, occ_size=OCC_SIZE)
    d = str(tmp_path)
    ds1 = SyntheticOccDataset(data, model, 2, seed=3, cache_dir=d)
    files = [f for f in os.listdir(d) if f.endswith(".npz")]
    assert len(files) == 1
    ds2 = SyntheticOccDataset(data, model, 2, seed=3, cache_dir=d)
    for a, b in zip(ds1.samples, ds2.samples):
        for x, y in zip(a, b):
            np.testing.assert_array_equal(x, y)
    assert ds1.infos == ds2.infos
    # a different seed must MISS the cache (distinct key -> second file)
    SyntheticOccDataset(data, model, 2, seed=4, cache_dir=d)
    assert len([f for f in os.listdir(d) if f.endswith(".npz")]) == 2


def test_device_normalize_uint8_bitwise_matches_host_path():
    """`SyntheticOccDataset(device_normalize=True)` ships raw uint8 and the
    jitted device pipeline (distortion off) must produce bitwise the same
    normalised images as the host float path (r5: 4x less H2D, measured
    2.8 -> 0.35 s/it at base scale through the tunnel)."""
    import dataclasses
    import jax.numpy as jnp
    from occnet_tpu.config import get_config
    from occnet_tpu.data.pipeline import (make_device_normalizer,
                                          make_device_train_augmenter)
    from occnet_tpu.data.synthetic import SyntheticOccDataset

    cfg = get_config("synth_tiny_occ")
    kw = dict(n_samples=2, seed=0, training=False)
    host = SyntheticOccDataset(cfg.data, cfg.model, **kw)
    dev = SyntheticOccDataset(cfg.data, cfg.model, device_normalize=True,
                              **kw)
    s_host = host.get_sample(0)
    s_dev = dev.get_sample(0)
    assert s_dev["img"].dtype == np.uint8
    norm = make_device_normalizer(cfg.data)
    aug = make_device_train_augmenter(cfg.data, distort=False)
    out_n = np.asarray(norm(jnp.asarray(s_dev["img"])))
    out_a = np.asarray(aug(None, jnp.asarray(s_dev["img"])))
    np.testing.assert_array_equal(out_n, s_host["img"].astype(np.float32))
    np.testing.assert_array_equal(out_a, s_host["img"].astype(np.float32))
