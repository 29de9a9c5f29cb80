"""tools/soak_report.py: metrics.jsonl -> SOAK.json summary artifact."""

import importlib.util
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_soak_report(tmp_path, monkeypatch, capsys):
    work = tmp_path / "soak_x"
    work.mkdir()
    events = []
    for step in range(0, 120, 10):
        # warmup steps slow, steady state 0.30 with slight late drift
        sit = 5.0 if step < 30 else (0.30 if step < 90 else 0.33)
        events.append({"step": step, "tag": "train", "loss": 3.0 - step / 50,
                       "s_per_it": sit, "cert_overflow": 0})
    events.append({"step": 64, "tag": "eval", "RayIoU": 0.5, "mAVE": 0.1})
    events.append({"step": 120, "tag": "hbm",
                   "peak_bytes_in_use": 3 * 2 ** 30})
    with open(work / "metrics.jsonl", "w") as f:
        for e in events:
            f.write(json.dumps(e) + "\n")
    (work / "64").mkdir()   # orbax checkpoint dir
    (work / "128").mkdir()

    out = tmp_path / "SOAK.json"
    monkeypatch.setattr(sys, "argv",
                        ["soak_report.py", str(work), "--out", str(out)])
    spec = importlib.util.spec_from_file_location(
        "soak_report", os.path.join(REPO, "tools", "soak_report.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.main()

    rep = json.loads(out.read_text())
    assert rep["config"] == "soak_x"
    assert rep["steps_logged"] == 12
    assert rep["loss_last"] < rep["loss_first"]
    # warmup logs excluded: early mean is steady-state 0.30, late 0.33
    assert abs(rep["s_per_it_early"] - 0.30) < 1e-6
    assert rep["s_per_it_drift_pct"] == 10.0
    assert rep["cert_overflow_total"] == 0
    assert rep["checkpoints"] == [64, 128]
    assert rep["evals"] == [{"step": 64, "RayIoU": 0.5, "mAVE": 0.1}]
    assert rep["peak_hbm_gib"] == 3.0
