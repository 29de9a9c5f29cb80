#!/usr/bin/env python
"""Drill into the vmapped-lift batch corruption (tools/diag_b1.py finding:
batch element 1 of lift_and_average_pallas at B=2 is ~24% non-finite while
element 0 is exact).  Locates the NaNs per (level, z, bev-row), checks
determinism, and tests whether identical batch elements produce identical
outputs (they must — any divergence is an indexing bug, NaN or not)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from occnet_tpu.config import get_config
    from occnet_tpu.ops.lift_pallas import lift_and_average_pallas
    from occnet_tpu.data.synthetic import ring_camera_rig
    from occnet_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    cfg = get_config("synth_tiny_turbo_occ")
    m = cfg.model
    rig = ring_camera_rig(m.num_cams, (m.img_h, m.img_w))
    ego2img = jnp.asarray(np.stack([rig["ego2img"]] * 2))
    rng = np.random.RandomState(0)
    C = m.embed_dims
    lvl_hw = [(m.img_h // s, m.img_w // s) for s in (8, 16, 32, 64)]
    # IDENTICAL features for both batch elements: outputs must match exactly
    f1 = [rng.randn(1, m.num_cams, h, w, C) for (h, w) in lvl_hw]
    feats2 = [jnp.asarray(np.concatenate([f, f]), jnp.bfloat16) for f in f1]

    kw = dict(pc_range=m.pc_range, num_z=m.encoder.num_points_in_pillar,
              bev_hw=(m.bev_h, m.bev_w), img_hw=(m.img_h, m.img_w))
    lift_p = jax.jit(lambda fs, e: lift_and_average_pallas(fs, e, **kw))

    u2a, _ = lift_p(feats2, ego2img)
    u2b, _ = lift_p(feats2, ego2img)
    a = np.asarray(u2a, np.float32)
    b = np.asarray(u2b, np.float32)
    print(f"deterministic across calls: {np.array_equal(a, b, equal_nan=True)}",
          flush=True)
    Z = m.encoder.num_points_in_pillar
    for bi in range(2):
        for lvl in range(4):
            x = a[bi, lvl]                       # (Z, Q, C)
            bad = ~np.isfinite(x)
            if bad.any():
                zr = bad.any(-1).reshape(Z, m.bev_h, m.bev_w)
                rows = sorted({(z, r) for z, r, _ in zip(*np.where(zr))})
                print(f"b={bi} lvl={lvl}: nonfinite={int(bad.sum())} "
                      f"rows(z,bev_y)[:12]={rows[:12]} n_rows={len(rows)}",
                      flush=True)
            else:
                d = np.abs(x - a[0, lvl])
                print(f"b={bi} lvl={lvl}: finite, maxdiff vs b0="
                      f"{d.max():.5f}", flush=True)


if __name__ == "__main__":
    main()
