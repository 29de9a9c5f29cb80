#!/usr/bin/env python
"""Benchmark: 6-camera occupancy inference frames/sec/chip on the flagship
model (OccNet base, 200x200x16 grid), bf16.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

vs_baseline normalises against the BASELINE.json north star: >=2x an
A100-class PyTorch reference.  The reference repo publishes no wall-clock
numbers (docs/getting_started.md:50-52 is "TBD"), and no GPU exists in this
environment to measure one.  The A100 figure below is calibrated against the
published measurement closest to this exact workload: SparseOcc
(arXiv 2312.17118, "Fully Sparse 3D Occupancy Prediction", Tab. 3) benches
BEVFormer on the same nuScenes-occupancy task (6 cams, 900x1600) at
**3.0 FPS on an A100** — matching the BEVFormer-lineage folklore range of
2-3 fps.  vs_baseline = tpu_fps / (2 * A100_EST_FPS); 1.0 == the 2x target.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

A100_EST_FPS = 3.0          # documented estimate, see BASELINE.md
TARGET_MULT = 2.0


def main():
    import jax
    from occnet_tpu.utils import enable_compilation_cache
    from __graft_entry__ import entry

    enable_compilation_cache()
    fn, args = entry()
    jfn = jax.jit(fn)

    import jax.numpy as jnp

    def sync(x):
        # On the axon tunnel backend block_until_ready does not reliably
        # block; fetching a scalar that depends on the output does, and the
        # in-order device stream makes it a barrier for all queued work.
        return float(jnp.sum(x.astype(jnp.float32)))

    # warmup / compile
    out = jfn(*args)
    sync(out)

    iters = int(os.environ.get("BENCH_ITERS", "10"))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = jfn(*args)
    sync(out)
    dt = (time.perf_counter() - t0) / iters

    batch = args[2].shape[0]
    fps = batch / dt
    print(json.dumps({
        "metric": "6-cam occ inference frames/sec/chip (OccNet turbo, bf16)",
        "value": round(fps, 3),
        "unit": "frames/s",
        "vs_baseline": round(fps / (TARGET_MULT * A100_EST_FPS), 3),
    }))


if __name__ == "__main__":
    main()
