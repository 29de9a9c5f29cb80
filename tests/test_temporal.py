"""Temporal path tests: ego-pose deltas, prev-BEV alignment, history-BEV
extraction, video train step, streaming inference state."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from occnet_tpu.config import tiny_turbo_occ
from occnet_tpu.models.detector import OccNet
from occnet_tpu.training.temporal import (
    StreamingInferenceState,
    align_prev_bev,
    ego_deltas_from_poses,
    make_history_bev_fn,
)


def _yaw_pose(x, y, yaw_deg):
    a = np.deg2rad(yaw_deg)
    m = np.eye(4)
    m[:2, :2] = [[np.cos(a), -np.sin(a)], [np.sin(a), np.cos(a)]]
    m[0, 3] = x
    m[1, 3] = y
    return m


def test_ego_deltas():
    p0 = _yaw_pose(0, 0, 10)
    p1 = _yaw_pose(3, 4, 40)
    delta_xy, yaw_delta, yaw_curr = ego_deltas_from_poses(p0, p1)
    np.testing.assert_allclose(yaw_delta, 30.0, atol=1e-4)
    np.testing.assert_allclose(yaw_curr, 40.0, atol=1e-4)
    # translation expressed in the prev-ego frame
    want = np.linalg.inv(p0)[:2, :2] @ [3, 4] + np.linalg.inv(p0)[:2, 3]
    np.testing.assert_allclose(delta_xy, want, atol=1e-4)


def test_align_prev_bev_rotation():
    h = w = 8
    c = 2
    bev = np.zeros((1, h * w, c), np.float32)
    bev[0, 2 * w + 4] = 1.0    # (y=2, x=4)
    out = align_prev_bev(jnp.asarray(bev), jnp.asarray([90.0]), (h, w),
                         rotate_center=(3.5, 3.5))
    out = np.asarray(out).reshape(h, w, c)
    # 90deg CCW about centre: the hot pixel moves to a single new cell
    assert out.sum() == pytest.approx(2.0, abs=1e-5)
    ys, xs = np.nonzero(out[..., 0])
    assert len(ys) == 1 and (ys[0], xs[0]) != (2, 4)


@pytest.fixture(scope="module")
def tiny_model():
    cfg = tiny_turbo_occ()
    model_cfg = dataclasses.replace(
        cfg.model, img_h=32, img_w=48, bev_h=6, bev_w=6, pillar_h=2,
        embed_dims=16, out_dim=4, num_cams=2, compute_dtype="float32",
        encoder=dataclasses.replace(cfg.model.encoder, num_layers=1,
                                    ffn_dim=32, num_points_in_pillar=2))
    cfg = dataclasses.replace(cfg, model=model_cfg)
    model = OccNet(cfg.model)
    rng = np.random.RandomState(0)
    img = rng.randn(1, 2, 32, 48, 3).astype(np.float32)
    ego2img = np.tile(np.eye(4, dtype=np.float32), (1, 2, 1, 1))
    K = np.array([[24.0, 0, 24], [0, 24, 16], [0, 0, 1]])
    base = np.array([[0.0, -1, 0], [0, 0, -1], [1, 0, 0.0]])
    ego2img[0, 0, :3, :3] = (K @ base).astype(np.float32)
    ego2img[0, 1, :3, :3] = (K @ -base).astype(np.float32)
    params = model.init({"params": jax.random.PRNGKey(0)},
                        jnp.asarray(img), jnp.asarray(ego2img))
    return cfg, model, params, jnp.asarray(img), jnp.asarray(ego2img)


def test_history_bev_fn_chains(tiny_model):
    cfg, model, params, img, ego2img = tiny_model
    m = cfg.model
    T = 3
    imgs_q = jnp.broadcast_to(img[:, None], (1, T) + img.shape[1:])
    ego_q = jnp.broadcast_to(ego2img[:, None], (1, T) + ego2img.shape[1:])
    rot = jnp.zeros((1, T))
    shifts = jnp.zeros((1, T, 2))
    exists = jnp.ones((1, T), bool)
    fn = make_history_bev_fn(model, cfg)
    prev = fn(params["params"], params.get("batch_stats", {}),
              imgs_q, ego_q, rot, shifts, exists)
    assert prev.shape == (1, m.bev_h * m.bev_w, m.embed_dims)
    assert np.isfinite(np.asarray(prev)).all()
    # chaining changes the result vs the single-frame BEV
    single = model.apply(params, img, ego2img, only_bev=True)
    assert not np.allclose(np.asarray(prev), np.asarray(single), atol=1e-6)


def test_streaming_inference_resets_on_scene_change(tiny_model):
    cfg, model, params, img, ego2img = tiny_model
    state = StreamingInferenceState(cfg, model, params["params"],
                                    params.get("batch_stats", {}))
    out1 = state.step(img, ego2img, "scene-A", _yaw_pose(0, 0, 0))
    assert state.prev_scene == "scene-A"
    out2 = state.step(img, ego2img, "scene-A", _yaw_pose(1.0, 0, 5))
    # temporal second frame differs from the first (prev_bev engaged)
    assert not np.allclose(np.asarray(out1["occ"]), np.asarray(out2["occ"]))
    out3 = state.step(img, ego2img, "scene-B", _yaw_pose(0, 0, 0))
    # scene reset -> identical to a fresh single-frame pass
    np.testing.assert_allclose(np.asarray(out3["occ"]),
                               np.asarray(out1["occ"]), atol=1e-5)


def test_run_evaluation_pipeline(tiny_model):
    """In-training eval hook wiring: inference -> render -> scores."""
    cfg, model, params, img, ego2img = tiny_model

    class FakeVal:
        def __init__(self):
            self.infos = [{
                "token": f"tok{i}",
                "occ_path": f"openocc_v2/scene-X/tok{i}/labels.npz",
                "lidar2ego_translation": [0.9, 0.0, 1.8],
                "lidar2ego_rotation": [1.0, 0, 0, 0],
                "ego2global_translation": [10.0 * i, 0.0, 0.0],
                "ego2global_rotation": [1.0, 0, 0, 0],
            } for i in range(2)]

        def __len__(self):
            return 2

        def get_sample(self, i, rng=None):
            m = cfg.model
            return {
                "img": np.asarray(img[0]),
                "ego2img": np.asarray(ego2img[0]),
                "voxel_semantics": np.full(
                    (m.bev_w, m.bev_h, m.pillar_h), 16, np.int32),
                "voxel_flow": np.zeros(
                    (m.bev_w, m.bev_h, m.pillar_h, 2), np.float32),
                "token": f"tok{i}",
            }

    from occnet_tpu.training.eval_loop import run_evaluation
    scores = run_evaluation(cfg, model, params["params"],
                            params.get("batch_stats", {}), FakeVal(),
                            log=lambda *a: None)
    assert set(scores) >= {"RayIoU", "mAVE", "OccScore"}


def test_clip_dataset_scene_boundaries_and_alignment(tmp_path):
    """ClipDataset: clips stay within scenes, left-pad with prev_exists=False,
    and per-transition rot/shift match the device-side alignment math
    (ego_deltas_from_poses + shift_bev_ref)."""
    import os
    import sys
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from test_cli import _write_miniset
    import dataclasses
    import jax.numpy as jnp
    from occnet_tpu.config import get_config
    from occnet_tpu.data import ClipDataset, NuSceneOccDataset
    from occnet_tpu.ops.transforms import shift_bev_ref
    from occnet_tpu.training.temporal import ego_deltas_from_poses

    cfg = get_config("tiny_occ")
    m = cfg.model
    root = str(tmp_path / "data")
    os.makedirs(root)
    ann = _write_miniset(root, 6, (m.img_h, m.img_w),
                         grid=(m.bev_w, m.bev_h, m.pillar_h), n_scenes=2)
    dcfg = dataclasses.replace(cfg.data, data_root=root)
    base = NuSceneOccDataset(dcfg, ann, training=False)
    ds = ClipDataset(base, queue_length=3, pc_range=m.pc_range,
                     bev_hw=(m.bev_h, m.bev_w))
    assert len(ds) == 6

    # frames 0-2 scene 1, 3-5 scene 2
    np.testing.assert_array_equal(ds.clip_indices(0), [0, 0, 0])
    np.testing.assert_array_equal(ds.clip_indices(1), [0, 0, 1])
    np.testing.assert_array_equal(ds.clip_indices(2), [0, 1, 2])
    np.testing.assert_array_equal(ds.clip_indices(3), [3, 3, 3])
    np.testing.assert_array_equal(ds.clip_indices(4), [3, 3, 4])

    s = ds.get_sample(2)
    assert s["img"].shape[0] == 3
    assert s["prev_exists"].tolist() == [False, True, True]
    assert s["rot_deg"][0] == 0.0 and abs(s["rot_deg"][2]) > 0
    assert s["token"] == base.sample_token(2)
    # GT comes from the final frame
    np.testing.assert_array_equal(s["voxel_semantics"],
                                  base.get_sample(2)["voxel_semantics"])

    # alignment oracle: same quantities through the device-side helpers
    f1 = base.get_sample(1)
    f2 = base.get_sample(2)
    d_xy, yaw_d, yaw_c = ego_deltas_from_poses(
        f1["ego2global"].astype(np.float64),
        f2["ego2global"].astype(np.float64))
    np.testing.assert_allclose(s["rot_deg"][2], yaw_d, rtol=1e-5, atol=1e-5)
    grid_len = ((m.pc_range[4] - m.pc_range[1]) / m.bev_h,
                (m.pc_range[3] - m.pc_range[0]) / m.bev_w)
    want_shift = np.asarray(shift_bev_ref(
        jnp.asarray(d_xy), jnp.float32(yaw_c), grid_len,
        (m.bev_h, m.bev_w)))
    np.testing.assert_allclose(s["shifts"][2], want_shift, rtol=1e-4,
                               atol=1e-5)
    np.testing.assert_allclose(s["shift"], s["shifts"][2])

    # scene starts reset: first clip of scene 2 has no predecessors at all
    s3 = ds.get_sample(3)
    assert s3["prev_exists"].tolist() == [False, False, False]
    np.testing.assert_array_equal(s3["rot_deg"], 0.0)

    batch = ds.collate([s, s3])
    assert batch["img"].shape[:2] == (2, 3)
    assert batch["tokens"] == [s["token"], s3["token"]]
