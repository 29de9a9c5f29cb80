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


if __name__ == "__main__":
    main()
