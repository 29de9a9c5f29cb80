#!/usr/bin/env python
"""Streaming temporal inference bench at full base scale on TPU: frames/sec
of `StreamingInferenceState.step` (history-BEV path engaged from frame 2)."""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _yaw_pose(x, y, yaw_deg):
    a = np.deg2rad(yaw_deg)
    m = np.eye(4)
    m[:2, :2] = [[np.cos(a), -np.sin(a)], [np.sin(a), np.cos(a)]]
    m[0, 3], m[1, 3] = x, y
    return m


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="turbo_occ")
    ap.add_argument("--frames", type=int, default=10)
    ap.add_argument("--breakdown", action="store_true",
                    help="also time the single-frame graph and a standalone "
                         "align/rotate jit to attribute the temporal "
                         "overhead (align vs 2-queue TSA vs dispatch)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from occnet_tpu.utils import enable_compilation_cache
    enable_compilation_cache()

    from occnet_tpu.config import get_config
    from occnet_tpu.models.detector import OccNet
    from occnet_tpu.training.temporal import StreamingInferenceState
    from tools.train import make_synthetic_batch

    cfg = get_config(args.config)
    rng = np.random.RandomState(0)
    batch = make_synthetic_batch(cfg, 1, rng)
    model = OccNet(cfg.model)
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           batch["img"], batch["ego2img"])

    state = StreamingInferenceState(cfg, model, variables["params"],
                                    variables.get("batch_stats", {}))

    def sync(x):
        return float(jnp.sum(x.astype(jnp.float32)))

    # warmup: compile both graphs (single + temporal)
    out = state.step(batch["img"], batch["ego2img"], "scene", _yaw_pose(0, 0, 0))
    out = state.step(batch["img"], batch["ego2img"], "scene",
                     _yaw_pose(0.5, 0.0, 1.0))
    sync(out["occ"])

    t0 = time.perf_counter()
    for i in range(args.frames):
        out = state.step(batch["img"], batch["ego2img"], "scene",
                         _yaw_pose(0.5 * (i + 2), 0.0, 1.0 * (i + 2)))
    sync(out["occ"])
    dt = (time.perf_counter() - t0) / args.frames
    print(f"temporal streaming: {dt*1e3:.2f} ms/frame = {1/dt:.2f} fps",
          flush=True)

    if args.breakdown:
        import jax
        from occnet_tpu.training.temporal import align_prev_bev

        def timeit(fn, n=args.frames):
            fn()  # warmup/compile
            t = time.perf_counter()
            for _ in range(n):
                r = fn()
            sync(r)
            return (time.perf_counter() - t) / n

        m = cfg.model
        single = timeit(lambda: state._infer_single(
            state.params, state.batch_stats, batch["img"],
            batch["ego2img"])["occ"])
        align = jax.jit(lambda b, a: align_prev_bev(
            b, a, (m.bev_h, m.bev_w)))
        prev = state.prev_bev
        align_t = timeit(lambda: align(prev, jnp.asarray([1.0])))
        print(f"breakdown: single-frame {single*1e3:.2f} ms; "
              f"align/rotate alone {align_t*1e3:.2f} ms "
              f"(incl ~30 ms dispatch); "
              f"temporal - single = {(dt - single)*1e3:.2f} ms "
              f"(2-queue TSA + fused align)", flush=True)


if __name__ == "__main__":
    main()
