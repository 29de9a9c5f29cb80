#!/usr/bin/env python
"""Eval render benchmark: loop fan marcher vs the sort-based vectorised one
(pred+GT, 8 origins, full lidar fan) — per-sample render cost."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

def main():
    import jax, jax.numpy as jnp
    from occnet_tpu.utils import enable_compilation_cache
    enable_compilation_cache()
    from occnet_tpu.evaluation.ray_metrics import (
        generate_lidar_rays, render_pred_gt, render_sample_fast)

    rng = np.random.RandomState(0)
    sem = np.full((200, 200, 16), 16, np.int32)
    blob = rng.rand(200, 200, 16) < 0.01
    sem[blob] = rng.randint(0, 16, int(blob.sum()))
    flow = rng.randn(200, 200, 16, 2).astype(np.float32)
    rays = jnp.asarray(generate_lidar_rays())
    origins = jnp.asarray(rng.randn(8, 3).astype(np.float32) * 5)
    valid = jnp.asarray(np.ones(8, bool))
    sem_j, flow_j = jnp.asarray(sem), jnp.asarray(flow)

    def sync(t):
        return float(jnp.sum(t["dist"]))

    cases = {
        "vec pred+gt": lambda: render_pred_gt(
            sem_j, flow_j, sem_j, flow_j, rays, origins, valid)[0],
        "loop single": lambda: render_sample_fast(
            sem_j, flow_j, rays, origins, valid),
    }
    for name, f in cases.items():
        try:
            sync(f())
        except Exception as e:          # noqa: BLE001 — report and continue
            print(f"{name}: FAILED ({type(e).__name__})", flush=True)
            continue
        t0 = time.perf_counter(); n = 5
        for _ in range(n):
            o = f()
        sync(o)
        print(f"{name}: {(time.perf_counter()-t0)/n*1e3:8.2f} ms", flush=True)

if __name__ == "__main__":
    main()
