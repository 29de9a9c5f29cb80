#!/usr/bin/env python
"""Turbo-vs-exact at equal wall-clock (VERDICT r4 #6): from SYNTH_BENCH.json
(eval milestones every N steps + measured s/it per arm), derive
(a) steps and minutes to reach a RayIoU threshold, and (b) the score each
arm holds at equal training minutes.  Prints a markdown table for
BASELINE.md."""

import argparse
import bisect
import json


def milestones(arm):
    """[(step, scores)] including the final eval, plus s_per_it."""
    evs = [(h["step"], h["eval"]) for h in arm["history"] if "eval" in h]
    final_step = arm["steps"]
    evs.append((final_step, arm["scores"]))
    evs.sort()
    return evs, arm["s_per_it"]


def score_at_minutes(evs, sit, minutes):
    """RayIoU of the latest milestone completed within `minutes`."""
    best = None
    for step, sc in evs:
        if step * sit / 60.0 <= minutes:
            best = (step, sc)
    return best


def steps_to(evs, thresh):
    for step, sc in evs:
        if sc["RayIoU"] >= thresh:
            return step
    return None


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--bench", default="SYNTH_BENCH.json")
    p.add_argument("--thresh", type=float, default=0.70)
    args = p.parse_args()
    with open(args.bench) as f:
        data = json.load(f)
    arms = {r["config"]: r for r in data["results"]}

    rows = []
    for name, arm in arms.items():
        evs, sit = milestones(arm)
        st = steps_to(evs, args.thresh)
        rows.append({
            "config": name, "s_per_it": sit,
            "steps_to_thresh": st,
            "min_to_thresh": None if st is None else st * sit / 60.0,
            "final": arm["scores"], "evs": evs,
        })

    total_min = min(r["evs"][-1][0] * r["s_per_it"] for r in rows) / 60.0
    print(f"| config | s/it | steps to RayIoU>={args.thresh} | minutes | "
          f"RayIoU @ {total_min:.0f} min | final RayIoU | final OccScore | "
          f"final mAVE |")
    print("|---|---|---|---|---|---|---|---|")
    for r in rows:
        at = score_at_minutes(r["evs"], r["s_per_it"], total_min)
        at_s = f"{at[1]['RayIoU']:.3f} (step {at[0]})" if at else "-"
        stt = r["steps_to_thresh"]
        mt = f"{r['min_to_thresh']:.1f}" if stt is not None else "-"
        f = r["final"]
        print(f"| {r['config']} | {r['s_per_it']:.3f} | "
              f"{stt if stt is not None else '-'} | {mt} | {at_s} | "
              f"{f['RayIoU']:.3f} | {f['OccScore']:.3f} | "
              f"{f['mAVE']:.3f} |")


if __name__ == "__main__":
    main()
