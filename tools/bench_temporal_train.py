#!/usr/bin/env python
"""Temporal (video-runner) training-step bench at full base scale on TPU:
2-frame queue (1 grad-free history frame + supervised frame), the
reference's `EpochBasedRunner_video` training pattern."""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="turbo_occ")
    ap.add_argument("--frames", type=int, default=2,
                    help="queue length (history = frames-1)")
    ap.add_argument("--iters", type=int, default=5)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from occnet_tpu.utils import enable_compilation_cache
    enable_compilation_cache()

    from occnet_tpu.config import get_config
    from occnet_tpu.models.detector import OccNet
    from occnet_tpu.training import create_train_state
    from occnet_tpu.training.train import make_optimizer
    from occnet_tpu.training.temporal import make_temporal_train_step
    from tools.train import make_synthetic_batch

    cfg = get_config(args.config)
    rng = np.random.RandomState(0)
    base = make_synthetic_batch(cfg, 1, rng)
    T = args.frames
    batch = {
        "img": jnp.broadcast_to(base["img"][:, None],
                                (1, T) + base["img"].shape[1:]),
        "ego2img": jnp.broadcast_to(base["ego2img"][:, None],
                                    (1, T) + base["ego2img"].shape[1:]),
        "rot_deg": jnp.ones((1, T), jnp.float32),
        "shifts": jnp.zeros((1, T, 2), jnp.float32),
        "shift": jnp.zeros((1, 2), jnp.float32),
        "prev_exists": jnp.ones((1, T), bool),
        "voxel_semantics": base["voxel_semantics"],
        "voxel_flow": base["voxel_flow"],
    }

    model, state = create_train_state(cfg, jax.random.PRNGKey(0), base)
    tx = make_optimizer(cfg, state.params)
    step = jax.jit(make_temporal_train_step(cfg, model, tx))

    def sync(x):
        return float(jnp.sum(x.astype(jnp.float32)))

    state, metrics = step(state, batch, jax.random.PRNGKey(1))
    sync(metrics["loss"])
    t0 = time.perf_counter()
    for i in range(args.iters):
        state, metrics = step(state, batch, jax.random.PRNGKey(i))
    sync(metrics["loss"])
    dt = (time.perf_counter() - t0) / args.iters
    print(f"temporal train step (T={T}): {dt*1e3:.1f} ms "
          f"(loss {float(metrics['loss']):.4f})", flush=True)


if __name__ == "__main__":
    main()
