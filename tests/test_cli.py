"""End-to-end CLI drives on a fabricated on-disk nuScenes/OpenOcc miniset:
tools/test.py --eval and --format-only run the full path (infos pkl ->
image decode -> inference -> render -> metrics/submission), single process.
"""

import gzip
import os
import pickle
import sys

import numpy as np
import pytest

# Every test here spawns fresh-process tools/{train,test}.py runs that
# recompile from scratch on this 1-core host (minutes each) — slow tier.
pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _write_miniset(root, n_frames, img_hw, grid=(200, 200, 16),
                   version="v1.0-mini", ann_name="infos_val.pkl",
                   n_scenes=1):
    """Fabricate data_root with jpgs, occ labels npz, and an infos pkl.

    With a LightwheelOcc `version` the sensor2lidar_rotation is written as a
    quaternion (the branch `nuscenes_occ.py:91-99` keys on the metadata
    version string)."""
    from PIL import Image

    lightwheel = "LightwheelOcc" in version
    h, w = img_hw
    cam_names = ["CAM_FRONT", "CAM_FRONT_RIGHT", "CAM_FRONT_LEFT",
                 "CAM_BACK", "CAM_BACK_LEFT", "CAM_BACK_RIGHT"]
    os.makedirs(os.path.join(root, "imgs"), exist_ok=True)
    rng = np.random.RandomState(0)
    base = np.array([[0.0, 0.0, 1.0], [-1.0, 0.0, 0.0], [0.0, -1.0, 0.0]])
    infos = []
    per_scene = -(-n_frames // n_scenes)
    for fi in range(n_frames):
        token = f"tok{fi}"
        scene = f"scene-{fi // per_scene + 1:04d}"
        # a small yaw per frame exercises the temporal-alignment rotation
        yaw = 0.05 * (fi % per_scene)
        ego_rot = [np.cos(yaw / 2), 0.0, 0.0, np.sin(yaw / 2)]
        cams = {}
        for ci, name in enumerate(cam_names):
            rel = f"imgs/{token}_{name}.jpg"
            img = rng.randint(0, 255, (h, w, 3), np.uint8)
            Image.fromarray(img).save(os.path.join(root, rel), quality=90)
            a = 2 * np.pi * ci / 6
            Rz = np.array([[np.cos(a), -np.sin(a), 0],
                           [np.sin(a), np.cos(a), 0], [0, 0, 1.0]])
            rot = Rz @ base
            if lightwheel:
                # wxyz quaternion of the rotation matrix (LightwheelOcc
                # infos store quats; datasets branch on the version string)
                t = np.trace(rot)
                qw = np.sqrt(max(t + 1.0, 1e-12)) / 2.0
                rot_q = np.array([
                    qw, (rot[2, 1] - rot[1, 2]) / (4 * qw),
                    (rot[0, 2] - rot[2, 0]) / (4 * qw),
                    (rot[1, 0] - rot[0, 1]) / (4 * qw)])
            cams[name] = {
                "data_path": rel,
                "cam_intrinsic": np.array(
                    [[w / 2.0, 0, w / 2], [0, w / 2.0, h / 2], [0, 0, 1]]),
                "sensor2lidar_rotation": rot_q if lightwheel else rot,
                "sensor2lidar_translation": np.array([1.0, 0.0, 1.5]),
            }
        occ_rel = f"openocc_v2/{scene}/{token}/labels.npz"
        os.makedirs(os.path.dirname(os.path.join(root, occ_rel)),
                    exist_ok=True)
        sem = np.full(grid, 16, np.uint8)
        mask = rng.rand(*grid) < 0.01
        sem[mask] = rng.randint(0, 16, int(mask.sum()))
        np.savez_compressed(
            os.path.join(root, occ_rel), semantics=sem,
            flow=np.zeros((*grid, 2), np.float16))
        infos.append({
            "token": token,
            "cams": cams,
            "lidar2ego_translation": [0.94, 0.0, 1.84],
            "lidar2ego_rotation": [1.0, 0.0, 0.0, 0.0],
            "ego2global_translation": [100.0 + 2.0 * fi, 50.0, 0.0],
            "ego2global_rotation": ego_rot,
            "occ_path": occ_rel,
            "scene_token": scene,
            "timestamp": fi,
        })
    ann = os.path.join(root, ann_name)
    with open(ann, "wb") as f:
        pickle.dump({"infos": infos, "metadata": {"version": version}}, f)
    return ann


def test_test_cli_eval_and_submission(tmp_path, monkeypatch):
    from occnet_tpu.config import get_config

    cfg = get_config("tiny_occ")
    root = str(tmp_path / "data")
    os.makedirs(root, exist_ok=True)
    m = cfg.model
    _write_miniset(root, 3, (m.img_h, m.img_w),
                   grid=(m.bev_w, m.bev_h, m.pillar_h))

    sub = str(tmp_path / "sub.gz")
    work = str(tmp_path / "work")
    argv = ["test.py", "--config", "tiny_occ", "--eval", "--format-only",
            "--device-normalize",
            "--out", sub, "--work-dir", work, "--max-samples", "3",
            "--set", f"data.data_root={root}", "data.val_ann=infos_val.pkl"]
    monkeypatch.setattr(sys, "argv", argv)
    # load tools/test.py under a non-clashing module name (stdlib has `test`)
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "occnet_test_cli", os.path.join(REPO, "tools", "test.py"))
    test_mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(test_mod)
    test_mod.main()

    import json
    with open(os.path.join(work, "eval_results.json")) as f:
        scores = json.load(f)
    assert all(np.isfinite(v) for v in scores.values())
    with gzip.open(sub, "rb") as f:
        payload = pickle.load(f)
    assert set(payload["results"]) == {"tok0", "tok1", "tok2"}


def test_overrides_parse_empty_default_tuples():
    """CLI strings into empty-default tuple fields (per_cam_topk,
    dcn_window_radii) parse NUMERICALLY, not as strings."""
    from occnet_tpu.config import apply_overrides, get_config

    cfg = apply_overrides(get_config("tiny_occ"), {
        "model.backbone.dcn_window_radii": "1,0,2",
        "model.encoder.sca.per_cam_topk": "(64,64,128)",
    })
    assert cfg.model.backbone.dcn_window_radii == (1, 0, 2)
    assert cfg.model.encoder.sca.per_cam_topk == (64, 64, 128)


def test_test_cli_auto_dcn_radius_probe(tmp_path, monkeypatch, capsys):
    """Window-mode eval runs the ONE-pass per-layer radius probe: with
    zero-init conv_offset every window-eligible layer needs R=0, the probe
    reports per-layer radii, and eval completes with finite scores."""
    from occnet_tpu.config import get_config

    cfg = get_config("tiny_occ")
    root = str(tmp_path / "data")
    os.makedirs(root, exist_ok=True)
    m = cfg.model
    _write_miniset(root, 2, (m.img_h, m.img_w),
                   grid=(m.bev_w, m.bev_h, m.pillar_h))

    work = str(tmp_path / "work")
    argv = ["test.py", "--config", "tiny_occ", "--eval",
            "--work-dir", work, "--max-samples", "2",
            "--set", f"data.data_root={root}", "data.val_ann=infos_val.pkl",
            "model.backbone.dcn_stages=false,false,true,true",
            "model.backbone.dcn_mode=window"]
    monkeypatch.setattr(sys, "argv", argv)
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "occnet_test_cli_dcn", os.path.join(REPO, "tools", "test.py"))
    test_mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(test_mod)
    test_mod.main()

    out = capsys.readouterr().out
    assert "auto DCN radii" in out
    # zero-init offsets: every probed layer needs radius 0
    import re
    radii = re.search(r"auto DCN radii \(per layer[^)]*\): \[([^\]]*)\]",
                      out)
    assert radii is not None
    probed = [int(v) for v in radii.group(1).split(",")]
    assert all(r == 0 for r in probed)

    import json
    with open(os.path.join(work, "eval_results.json")) as f:
        scores = json.load(f)
    assert all(np.isfinite(v) for v in scores.values())


def test_ray_casting_and_metric_cli(tmp_path, monkeypatch):
    """Offline codepath: pred .npz dir + infos -> pred/GT pcd .gz ->
    metric CLI scores; GT-as-pred must score OccScore 1.0."""
    import importlib.util
    import json

    root = str(tmp_path / "data")
    os.makedirs(root, exist_ok=True)
    ann = _write_miniset(root, 2, (64, 96))
    # predictions = the GT grids themselves
    pred_dir = str(tmp_path / "preds")
    os.makedirs(pred_dir, exist_ok=True)
    with open(ann, "rb") as f:
        infos = pickle.load(f)["infos"]
    for info in infos:
        gt = np.load(os.path.join(root, info["occ_path"]))
        np.savez(os.path.join(pred_dir, f"{info['token']}.npz"),
                 semantics=gt["semantics"], flow=gt["flow"])

    def run(path, argv):
        spec = importlib.util.spec_from_file_location(
            "occnet_cli_" + os.path.basename(path)[:-3],
            os.path.join(REPO, "tools", path))
        mod = importlib.util.module_from_spec(spec)
        monkeypatch.setattr(sys, "argv", argv)
        spec.loader.exec_module(mod)
        mod.main()

    pred_out = str(tmp_path / "pred.gz")
    gt_out = str(tmp_path / "gt.gz")
    run("ray_casting.py",
        ["ray_casting.py", "--pred-dir", pred_dir, "--infos", ann,
         "--data-root", root, "--pred-out", pred_out, "--gt-out", gt_out])
    out_json = str(tmp_path / "scores.json")
    run("metric.py", ["metric.py", "--pred", pred_out, "--gt", gt_out,
                      "--out", out_json])
    with open(out_json) as f:
        scores = json.load(f)
    assert abs(scores["OccScore"] - 1.0) < 1e-9, scores


def test_video_streaming_eval_cli(tmp_path, monkeypatch):
    """tools/test.py --video: streaming temporal inference over a 2-scene
    sequence (prev-BEV chained within scenes, reset across them)."""
    import importlib.util
    import json

    root = str(tmp_path / "data")
    os.makedirs(root, exist_ok=True)
    cfg_mod = importlib.import_module("occnet_tpu.config")
    m = cfg_mod.get_config("tiny_occ").model
    _write_miniset(root, 4, (m.img_h, m.img_w),
                   grid=(m.bev_w, m.bev_h, m.pillar_h), n_scenes=2)

    work = str(tmp_path / "work")
    argv = ["test.py", "--config", "tiny_occ", "--eval", "--video",
            "--work-dir", work, "--max-samples", "4",
            "--set", f"data.data_root={root}", "data.val_ann=infos_val.pkl"]
    monkeypatch.setattr(sys, "argv", argv)
    spec = importlib.util.spec_from_file_location(
        "occnet_test_cli_video", os.path.join(REPO, "tools", "test.py"))
    test_mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(test_mod)
    test_mod.main()

    with open(os.path.join(work, "eval_results.json")) as f:
        scores = json.load(f)
    assert np.isfinite(scores["RayIoU"])


def test_train_cli_synthetic_geometric(tmp_path):
    """tools/train.py --synthetic-geometric: trains on generated geometric
    scenes, applies --autoscale-lr, and fires the DYNAMIC eval interval
    ('2:1' = every epoch from epoch 2) with RayIoU on the held-out
    synthetic val split.  1-virtual-device subprocess, micro model."""
    import json
    import subprocess

    work = str(tmp_path / "work")
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    env["PYTHONPATH"] = REPO
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "train.py"),
         "--config", "synth_tiny_occ", "--work-dir", work,
         "--synthetic-geometric", "4", "--max-steps", "4",
         "--autoscale-lr", "--eval-dynamic-intervals", "2:1",
         "--log-interval", "1", "--ckpt-interval-epochs", "1000",
         # micro geometry, CUBIC 0.8 m voxels: 20x20x6 over +/-8 m, -1..3.8
         "--set", "model.img_h=32", "model.img_w=64", "model.bev_h=20",
         "model.bev_w=20", "model.pillar_h=6", "model.embed_dims=48",
         "model.out_dim=8", "model.num_cams=2",
         "model.compute_dtype=float32",
         "model.pc_range=-8,-8,-1,8,8,3.8", "model.encoder.num_layers=1",
         "model.encoder.ffn_dim=64", "model.encoder.num_points_in_pillar=2",
         "data.occ_size=20,20,6", "data.batch_size_per_device=2",
         "data.workers=2", "eval.occ_size=20,20,6", "eval.voxel_size=0.8",
         "eval.pc_range=-8,-8,-1,8,8,3.8"],
        env=env, capture_output=True, text=True, timeout=1800)
    assert r.returncode == 0, r.stderr[-3000:] + r.stdout[-1000:]
    blob = r.stdout + r.stderr
    assert "autoscale-lr" in blob
    with open(os.path.join(work, "metrics.jsonl")) as f:
        events = [json.loads(line) for line in f]
    evals = [e for e in events if e.get("tag") == "eval"]
    # dynamic interval '2:1': no eval after epoch 1, one after epoch 2
    assert len(evals) == 1 and evals[0]["step"] == 4
    assert np.isfinite(evals[0]["RayIoU"])
    trains = [e for e in events if e.get("tag") == "train"]
    assert trains and np.isfinite(trains[-1]["loss"])
    assert trains[-1]["cert_overflow"] == 0


def test_train_cli_temporal_queue(tmp_path):
    """tools/train.py --temporal-queue 2: video-runner training on scene
    clips from the on-disk miniset.  Runs in a 2-virtual-device subprocess
    (global batch 2) — the in-process 8-device mesh makes an 8-clip batch,
    far too heavy for this 1-core host."""
    import json
    import subprocess

    root = str(tmp_path / "data")
    os.makedirs(root, exist_ok=True)
    import importlib
    cfg_mod = importlib.import_module("occnet_tpu.config")
    m = cfg_mod.get_config("tiny_occ").model
    _write_miniset(root, 4, (m.img_h, m.img_w),
                   grid=(m.bev_w, m.bev_h, m.pillar_h), n_scenes=2,
                   ann_name="infos_train.pkl")

    work = str(tmp_path / "work")
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    env["PYTHONPATH"] = REPO
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "train.py"),
         "--config", "tiny_occ", "--work-dir", work,
         "--max-steps", "1", "--temporal-queue", "2",
         "--log-interval", "1", "--ckpt-interval-epochs", "1000",
         "--set", f"data.data_root={root}",
         "data.train_ann=infos_train.pkl", "data.workers=2"],
        env=env, capture_output=True, text=True, timeout=1800)
    assert r.returncode == 0, r.stderr[-3000:] + r.stdout[-1000:]
    logs = [f for f in os.listdir(work) if f.startswith("train_")]
    assert logs
    # the structured metric stream (TensorBoard-hook equivalent) logged the
    # step with the scalar set the reference's logger hooks carry
    with open(os.path.join(work, "metrics.jsonl")) as f:
        events = [json.loads(line) for line in f]
    # a peak-HBM event may follow the final train event (r5)
    train_events = [e for e in events if e.get("tag") == "train"]
    assert train_events
    for key in ("loss", "loss_occ", "loss_flow", "grad_norm", "lr",
                "s_per_it"):
        assert np.isfinite(train_events[-1][key]), key
