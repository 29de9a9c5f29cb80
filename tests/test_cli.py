"""End-to-end CLI drives on a fabricated on-disk nuScenes/OpenOcc miniset:
tools/test.py --eval and --format-only run the full path (infos pkl ->
image decode -> inference -> render -> metrics/submission), single process.
"""

import gzip
import os
import pickle
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _write_miniset(root, n_frames, img_hw, grid=(200, 200, 16)):
    """Fabricate data_root with jpgs, occ labels npz, and an infos pkl."""
    from PIL import Image

    h, w = img_hw
    cam_names = ["CAM_FRONT", "CAM_FRONT_RIGHT", "CAM_FRONT_LEFT",
                 "CAM_BACK", "CAM_BACK_LEFT", "CAM_BACK_RIGHT"]
    os.makedirs(os.path.join(root, "imgs"), exist_ok=True)
    rng = np.random.RandomState(0)
    base = np.array([[0.0, 0.0, 1.0], [-1.0, 0.0, 0.0], [0.0, -1.0, 0.0]])
    infos = []
    for fi in range(n_frames):
        token = f"tok{fi}"
        scene = "scene-0001"
        cams = {}
        for ci, name in enumerate(cam_names):
            rel = f"imgs/{token}_{name}.jpg"
            img = rng.randint(0, 255, (h, w, 3), np.uint8)
            Image.fromarray(img).save(os.path.join(root, rel), quality=90)
            a = 2 * np.pi * ci / 6
            Rz = np.array([[np.cos(a), -np.sin(a), 0],
                           [np.sin(a), np.cos(a), 0], [0, 0, 1.0]])
            cams[name] = {
                "data_path": rel,
                "cam_intrinsic": np.array(
                    [[w / 2.0, 0, w / 2], [0, w / 2.0, h / 2], [0, 0, 1]]),
                "sensor2lidar_rotation": Rz @ base,
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
            "ego2global_rotation": [1.0, 0.0, 0.0, 0.0],
            "occ_path": occ_rel,
            "scene_token": scene,
            "timestamp": fi,
        })
    ann = os.path.join(root, "infos_val.pkl")
    with open(ann, "wb") as f:
        pickle.dump({"infos": infos, "metadata": {"version": "v1.0-mini"}},
                    f)
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
