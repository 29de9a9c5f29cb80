"""Raw-table ego-pose scanner (`data/devkit_ego_pose.py`) vs the reference
semantics of `nuscenes_ego_pose_loader.py:13-155`, cross-checked against the
infos-based extractor (`evaluation/ego_pose.py`) on equivalent fabricated
nuScenes DB tables."""

import numpy as np
import pytest

from occnet_tpu.data.devkit_ego_pose import EgoPoseScanner, NuScenesTables
from occnet_tpu.evaluation.ego_pose import extract_ego_origins


def _yaw_quat(deg):
    a = np.deg2rad(deg) / 2
    return [float(np.cos(a)), 0.0, 0.0, float(np.sin(a))]


def _fabricate(n_frames=12, far_frame=5):
    """One 12-frame scene on a curved path (frame `far_frame` teleported out
    of the +/-39 m bound) plus a 2-frame Singapore scene; returns (tables,
    infos) describing identical geometry."""
    rng = np.random.RandomState(0)
    scenes, samples, sample_datas, ego_poses, calibs, logs = [], [], [], [], [], []
    infos = []

    lidar2ego_t = [0.9, 0.1, 1.8]
    lidar2ego_q = _yaw_quat(3.0)

    def add_scene(name, log_loc, n, start_xy, step_xy, far=None):
        log_tok = f"log-{name}"
        logs.append({"token": log_tok, "location": log_loc})
        toks = [f"{name}-s{i}" for i in range(n)]
        scenes.append({"token": f"scene-{name}", "name": name,
                       "log_token": log_tok, "first_sample_token": toks[0]})
        calib_tok = f"cs-{name}"
        calibs.append({"token": calib_tok, "translation": lidar2ego_t,
                       "rotation": lidar2ego_q})
        for i, tok in enumerate(toks):
            x = start_xy[0] + step_xy[0] * i
            y = start_xy[1] + step_xy[1] * i + 0.05 * i * i
            if far is not None and i == far:
                x += 500.0
            yaw = 2.5 * i
            ep_tok = f"ep-{tok}"
            sd_tok = f"sd-{tok}"
            ego_poses.append({"token": ep_tok, "translation": [x, y, 0.2],
                              "rotation": _yaw_quat(yaw)})
            sample_datas.append({"token": sd_tok, "ego_pose_token": ep_tok,
                                 "calibrated_sensor_token": calib_tok})
            samples.append({"token": tok, "timestamp": 1000 + i,
                            "data": {"LIDAR_TOP": sd_tok},
                            "next": toks[i + 1] if i + 1 < n else ""})
            infos.append({"token": tok, "scene_token": f"scene-{name}",
                          "lidar2ego_translation": lidar2ego_t,
                          "lidar2ego_rotation": lidar2ego_q,
                          "ego2global_translation": [x, y, 0.2],
                          "ego2global_rotation": _yaw_quat(yaw)})

    add_scene("boston-1", "boston-seaport", n_frames, (10.0, -4.0),
              (3.0, 1.0), far=far_frame)
    add_scene("sg-1", "singapore-onenorth", 2, (0.0, 0.0), (2.0, 0.0))

    tables = NuScenesTables("/nonexistent", tables={
        "scene": scenes, "sample": samples, "sample_data": sample_datas,
        "ego_pose": ego_poses, "calibrated_sensor": calibs, "log": logs})
    return tables, infos


def test_matches_infos_extractor():
    tables, infos = _fabricate()
    scanner = EgoPoseScanner(tables)
    by_token = dict(extract_ego_origins(infos))
    assert len(scanner) == len(infos)
    for i in range(len(scanner)):
        tok, origins = scanner[i]
        np.testing.assert_allclose(origins, by_token[tok],
                                   rtol=0, atol=1e-5)


def test_bound_and_subsample():
    tables, _ = _fabricate(n_frames=12, far_frame=5)
    scanner = EgoPoseScanner(tables)
    tok, origins = scanner[0]
    # 12 in-scene frames, one teleported outside +/-39 m, some of the curve's
    # tail beyond the bound from frame 0; never more than 8 selected
    assert origins.shape[1] == 3 and origins.shape[0] <= 8
    assert np.all(np.abs(origins[:, :2]) < 39.0)
    # the reference frame's own origin is lidar2ego @ [0,0,0,1]
    np.testing.assert_allclose(origins[0], [0.9, 0.1, 1.8], atol=1e-6)


def test_split_filter_and_flip_flags():
    tables, _ = _fabricate()
    full = EgoPoseScanner(tables)
    assert full.flip_flags[:12] == [False] * 12
    assert full.flip_flags[12:] == [True, True]
    only_sg = EgoPoseScanner(tables, split_scenes=["sg-1"])
    assert len(only_sg) == 2
    assert all(t.startswith("sg-1") for t in only_sg.sample_tokens)


def test_chain_order_follows_next_pointers():
    tables, _ = _fabricate()
    scanner = EgoPoseScanner(tables)
    assert scanner.sample_tokens[:3] == ["boston-1-s0", "boston-1-s1",
                                         "boston-1-s2"]
    assert scanner.timestamps[:3] == [1000, 1001, 1002]
