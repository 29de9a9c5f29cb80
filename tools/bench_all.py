#!/usr/bin/env python
"""The whole BASELINE.json benchmark matrix in one artifact.

Runs every configured model/mode through inference (and the train/temporal
steps) on the attached TPU chip and writes one JSON row per measurement to
stdout and to BENCH_ALL.json — no more "built but unmeasured" rows in
BASELINE.md.  Per-stage achieved TF/s (vs the measured ~20 TF/s narrow-dim
MXU ceiling of this chip, BASELINE.md) comes from XLA's compiled
cost-analysis FLOP counts over the measured wall-clock.

Usage:  python tools/bench_all.py [--only SUBSTR] [--skip SUBSTR] [--iters N]
"""

import argparse
import json
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

NARROW_DIM_TFS_CEILING = 20.0   # measured, BASELINE.md "conv/small-dot MXU"
# v5e bf16 MXU peak (~197 TF/s): `mfu_peak` is achieved/peak — the honest
# utilisation number.  `tfs_ceiling` is the measured ceiling for NARROW-DIM
# ops only (conv/small-dot); wide matmuls (e.g. the turbo lift) legitimately
# exceed it, so rows where achieved > ceiling are not anomalies.
PEAK_BF16_TFS = 197.0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--only", default=None,
                    help="run only cases whose name contains SUBSTR")
    ap.add_argument("--skip", default=None,
                    help="skip cases whose name contains SUBSTR")
    ap.add_argument("--out", default="BENCH_ALL.json")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from occnet_tpu.utils import enable_compilation_cache
    enable_compilation_cache()

    from occnet_tpu.config import get_config, apply_overrides
    from occnet_tpu.models.detector import OccNet
    from tools.train import make_synthetic_batch

    def sync(x):
        leaves = [l for l in jax.tree_util.tree_leaves(x)
                  if hasattr(l, "dtype")]
        return float(jnp.sum(leaves[0].astype(jnp.float32)))

    def timeit(fn, iters=args.iters):
        sync(fn())          # compile + settle
        t0 = time.perf_counter()
        out = None
        for _ in range(iters):
            out = fn()
        sync(out)
        return (time.perf_counter() - t0) / iters

    def flops_of(jfn, *a, **kw):
        try:
            an = jfn.lower(*a, **kw).compile().cost_analysis()
            if isinstance(an, list):
                an = an[0]
            return float(an.get("flops", 0.0))
        except Exception:   # noqa: BLE001 — cost analysis is best-effort
            return 0.0

    def build(config, **overrides):
        cfg = get_config(config)
        if overrides:
            cfg = apply_overrides(cfg, overrides)
        rng = np.random.RandomState(0)
        batch = make_synthetic_batch(cfg, 1, rng)
        model = OccNet(cfg.model)
        variables = jax.jit(model.init)({"params": jax.random.PRNGKey(0)},
                                        batch["img"], batch["ego2img"])
        return cfg, model, variables, batch

    def infer_case(config, batch_size=1, rig="ring", auto_topk=False,
                   certify=False, **overrides):
        def run():
            cfg = get_config(config)
            if overrides:
                cfg = apply_overrides(cfg, overrides)
            rng = np.random.RandomState(0)
            batch = make_synthetic_batch(cfg, batch_size, rng, rig=rig)
            extra = {}
            if auto_topk:
                # calibration-derived per-camera K_c, exactness-certified
                # below (tools/test.py does the same per dataset)
                from occnet_tpu.geometry import calibration_topk
                ks = calibration_topk(cfg.model, batch["ego2img"],
                                      per_camera=True)
                cfg = apply_overrides(
                    cfg, {"model.encoder.sca.per_cam_topk": ks})
                extra["per_cam_topk"] = list(ks)
            model = OccNet(cfg.model)
            variables = jax.jit(model.init)(
                {"params": jax.random.PRNGKey(0)},
                batch["img"], batch["ego2img"])
            jfn = jax.jit(lambda v, i, e: model.apply(v, i, e))
            if auto_topk or certify:
                # certify: the fast path (top-K compaction / window DCN)
                # dropped nothing for this rig + these weights
                _, aux = model.apply(variables, batch["img"],
                                     batch["ego2img"],
                                     mutable=["intermediates"])
                ov = sum(
                    int(np.asarray(x).sum())
                    for path, x in jax.tree_util.tree_leaves_with_path(
                        aux["intermediates"])
                    if any("_overflow" in str(getattr(k, "key", k))
                           for k in path))
                extra["cert_overflow"] = ov
            dt = timeit(lambda: jfn(variables, batch["img"],
                                    batch["ego2img"]))
            fl = flops_of(jfn, variables, batch["img"], batch["ego2img"])
            return {"value": round(batch_size / dt, 3), "unit": "frames/s",
                    "ms_per_frame": round(dt * 1e3 / batch_size, 2),
                    "achieved_tfs": round(fl / dt / 1e12, 2),
                    "mfu_peak": round(fl / dt / 1e12 / PEAK_BF16_TFS, 4),
                    "narrow_dim_tfs_ceiling": NARROW_DIM_TFS_CEILING,
                    **extra}
        return run

    def train_case(config, iters=None, **overrides):
        def run():
            from occnet_tpu.training import create_train_state, \
                make_train_step
            cfg = get_config(config)
            if overrides:
                cfg = apply_overrides(cfg, overrides)
            rng = np.random.RandomState(0)
            batch = make_synthetic_batch(cfg, 1, rng)
            model = OccNet(cfg.model)
            _, state = create_train_state(cfg, jax.random.PRNGKey(0), batch)
            step = jax.jit(make_train_step(cfg, model))
            key = jax.random.PRNGKey(0)
            holder = {"s": state}

            def one():
                s, m = step(holder["s"], batch, key)
                holder["s"] = s
                return m
            dt = timeit(one, iters=iters or args.iters)
            fl = flops_of(step, holder["s"], batch, key)
            return {"value": round(dt * 1e3, 1), "unit": "ms/step",
                    "iters": iters or args.iters,
                    "achieved_tfs": round(fl / dt / 1e12, 2),
                    "mfu_peak": round(fl / dt / 1e12 / PEAK_BF16_TFS, 4),
                    "narrow_dim_tfs_ceiling": NARROW_DIM_TFS_CEILING}
        return run

    def temporal_stream_case(config):
        def run():
            from occnet_tpu.training.temporal import StreamingInferenceState
            from tools.bench_temporal import _yaw_pose
            cfg, model, variables, batch = build(config)
            st = StreamingInferenceState(cfg, model, variables["params"],
                                         variables.get("batch_stats", {}))
            sync(st.step(batch["img"], batch["ego2img"], "s",
                         _yaw_pose(0, 0, 0))["occ"])
            sync(st.step(batch["img"], batch["ego2img"], "s",
                         _yaw_pose(0.5, 0, 1))["occ"])
            t0 = time.perf_counter()
            for i in range(args.iters):
                out = st.step(batch["img"], batch["ego2img"], "s",
                              _yaw_pose(0.5 * (i + 2), 0, i + 2.0))
            sync(out["occ"])
            dt = (time.perf_counter() - t0) / args.iters
            return {"value": round(1.0 / dt, 3), "unit": "frames/s",
                    "ms_per_frame": round(dt * 1e3, 2)}
        return run

    def temporal_train_case(config, queue=2):
        def run():
            import jax.numpy as jnp
            from occnet_tpu.training import create_train_state
            from occnet_tpu.training.train import make_optimizer
            from occnet_tpu.training.temporal import make_temporal_train_step
            cfg = get_config(config)
            rng = np.random.RandomState(0)
            b1 = make_synthetic_batch(cfg, 1, rng)
            model = OccNet(cfg.model)
            _, state = create_train_state(cfg, jax.random.PRNGKey(0), b1)
            batch = {
                "img": jnp.stack([b1["img"]] * queue, axis=1),
                "ego2img": jnp.stack([b1["ego2img"]] * queue, axis=1),
                "voxel_semantics": b1["voxel_semantics"],
                "voxel_flow": b1["voxel_flow"],
                "rot_deg": jnp.ones((1, queue), jnp.float32),
                "shifts": jnp.zeros((1, queue, 2), jnp.float32),
                "shift": jnp.zeros((1, 2), jnp.float32),
                "prev_exists": jnp.ones((1, queue), bool),
            }
            tx = make_optimizer(cfg, state.params)
            step = jax.jit(make_temporal_train_step(cfg, model, tx))
            key = jax.random.PRNGKey(0)
            holder = {"s": state}

            def one():
                s, m = step(holder["s"], batch, key)
                holder["s"] = s
                return m
            dt = timeit(one)
            return {"value": round(dt * 1e3, 1), "unit": "ms/step"}
        return run

    # --- the matrix -------------------------------------------------------
    pallas = {"model.encoder.sca.msda_impl": "pallas",
              "model.encoder.tsa.msda_impl": "pallas"}
    # Ordered new-rows-first: the artifact is written incrementally after
    # each case, so an interrupted run still lands the rows no prior round
    # measured before it re-refreshes the known ones.
    cases = [
        ("base_occ exact inference (per-cam topk, nuScenes rig)",
         infer_case("base_occ", rig="nuscenes", auto_topk=True, **pallas)),
        # R=2 = what tools/test.py's auto radius probe certifies on
        # near-init offsets (the certificate is re-checked here)
        ("turbo_r101_dcn_occ inference (R=2 certified)",
         infer_case("turbo_r101_dcn_occ", certify=True,
                    **{"model.backbone.dcn_window_radius": 2})),
        ("turbo_r101_dcn_occ train step",
         train_case("turbo_r101_dcn_occ", iters=3)),
        ("r101_dcn_occ train step", train_case("r101_dcn_occ", iters=3)),
        ("turbo_r101_dcn_occ temporal streaming",
         temporal_stream_case("turbo_r101_dcn_occ")),
        ("turbo_occ inference", infer_case("turbo_occ")),
        ("turbo_occ inference batch2", infer_case("turbo_occ",
                                                  batch_size=2)),
        ("turbo_occ train step", train_case("turbo_occ")),
        ("base_occ exact inference (pallas msda)",
         infer_case("base_occ", **pallas)),
        ("base_occ exact inference (xla msda)", infer_case("base_occ")),
        ("base_occ exact train step", train_case("base_occ", iters=3)),
        ("r101_dcn_occ inference", infer_case("r101_dcn_occ", **pallas)),
        ("turbo_r101_dcn_occ inference", infer_case("turbo_r101_dcn_occ")),
        ("tiny_occ train step", train_case("tiny_occ")),
        ("turbo_occ temporal streaming", temporal_stream_case("turbo_occ")),
        ("turbo_occ temporal train step (2-frame queue)",
         temporal_train_case("turbo_occ")),
    ]

    def write_out(rows):
        # Merge with existing artifact rows so (a) filtered runs refresh in
        # place and (b) an interrupted run still leaves the FULL matrix with
        # every completed row updated.  On a full (unfiltered) run, rows whose
        # names left the case matrix are dropped so renames can't leave stale
        # entries behind; each row records the --iters it was measured under.
        # Atomic replace: never a torn file.
        order = [n for n, _ in cases]
        merged = {}
        if os.path.exists(args.out):
            with open(args.out) as f:
                merged = {r["name"]: r for r in json.load(f).get("rows", [])}
            if not args.only and not args.skip:
                merged = {n: r for n, r in merged.items() if n in order}
        for r in rows:
            merged[r["name"]] = {**r, "iters": r.get("iters", args.iters)}
        out_rows = sorted(merged.values(),
                          key=lambda r: (order.index(r["name"])
                                         if r["name"] in order
                                         else len(order)))
        tmp = args.out + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"rows": out_rows}, f, indent=1)
        os.replace(tmp, args.out)
        return out_rows

    rows = []
    for name, fn in cases:
        if args.only and args.only not in name:
            continue
        if args.skip and args.skip in name:
            continue
        t0 = time.time()
        try:
            row = {"name": name, **fn()}
        except Exception as e:  # noqa: BLE001 — record, keep benching
            traceback.print_exc()
            row = {"name": name, "error": f"{type(e).__name__}: {e}"}
        row["bench_wall_s"] = round(time.time() - t0, 1)
        rows.append(row)
        print(json.dumps(row), flush=True)
        write_out(rows)   # incremental: each row lands as it completes

    out_rows = write_out(rows)
    print(f"wrote {args.out} ({len(out_rows)} rows)", flush=True)


if __name__ == "__main__":
    main()
