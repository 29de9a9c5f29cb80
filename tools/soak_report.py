#!/usr/bin/env python
"""Distill a training run's `metrics.jsonl` into a checked-in soak artifact.

The base-scale soak (VERDICT r3 #5) asks for evidence that a multi-hundred-
step TPU run holds up: step-time drift over the run, loss trajectory, the
eval hook firing mid-training, checkpoints landing, and peak HBM. This reads
`<work_dir>/metrics.jsonl` (utils/events.py stream) + the checkpoint dir and
emits one JSON summary (default `SOAK.json`).

Usage: python tools/soak_report.py work_dirs/soak_turbo [--out SOAK.json]
"""

import argparse
import json
import os
import sys


def main():
    p = argparse.ArgumentParser()
    p.add_argument("work_dir")
    p.add_argument("--out", default="SOAK.json")
    p.add_argument("--config", default=None,
                   help="config name to record (else read work_dir name)")
    args = p.parse_args()

    path = os.path.join(args.work_dir, "metrics.jsonl")
    with open(path) as f:
        events = [json.loads(ln) for ln in f if ln.strip()]

    train = [e for e in events if e.get("tag") == "train"]
    evals = [e for e in events if e.get("tag") == "eval"]
    hbm = [e for e in events if e.get("tag") == "hbm"]
    aborts = [e for e in events if e.get("tag") == "abort"]
    if not train:
        sys.exit(f"no train events in {path}")

    # s/it drift: mean of the first vs last quartile of logged steps,
    # excluding the first 3 logs (compile/warmup)
    sit = [e["s_per_it"] for e in train if "s_per_it" in e][3:]
    q = max(len(sit) // 4, 1)
    first, last = sit[:q], sit[-q:]
    mean = lambda xs: sum(xs) / len(xs)  # noqa: E731

    ckpt_dirs = [args.work_dir, os.path.join(args.work_dir, "ckpts")]
    ckpt_steps = sorted(
        int(d) for root in ckpt_dirs if os.path.isdir(root)
        for d in os.listdir(root) if d.isdigit())

    report = {
        "config": args.config or os.path.basename(
            os.path.normpath(args.work_dir)),
        "steps_logged": len(train),
        "first_step": train[0]["step"],
        "last_step": train[-1]["step"],
        "loss_first": train[0].get("loss"),
        "loss_last": train[-1].get("loss"),
        "s_per_it_early": round(mean(first), 4),
        "s_per_it_late": round(mean(last), 4),
        "s_per_it_drift_pct": round(
            100.0 * (mean(last) - mean(first)) / mean(first), 2),
        "cert_overflow_total": int(sum(
            e.get("cert_overflow", 0) for e in train)),
        "evals": [{"step": e["step"],
                   **{k: v for k, v in e.items()
                      if k not in ("step", "tag", "wall_time")}}
                  for e in evals],
        "checkpoints": ckpt_steps,
        "peak_hbm_gib": (round(hbm[-1]["peak_bytes_in_use"] / 2 ** 30, 2)
                         if hbm else None),
        "aborts": len(aborts),
    }
    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report, indent=1))
    print(f"written: {args.out}")


if __name__ == "__main__":
    main()
