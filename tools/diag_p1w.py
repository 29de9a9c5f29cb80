#!/usr/bin/env python
"""Probe `ops/lift_pallas._pass1w` under vmap: run the level-0 order-B pass
on identical inputs, batched (B=2, explicit-loop batching path) vs unbatched,
and report where LIVE rows disagree / go non-finite."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from occnet_tpu.config import get_config
    from occnet_tpu.ops import lift_pallas as LP
    from occnet_tpu.ops.planar_lift import plane_homographies
    from occnet_tpu.data.synthetic import ring_camera_rig
    from occnet_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    cfg = get_config("synth_tiny_turbo_occ")
    m = cfg.model
    rig = ring_camera_rig(m.num_cams, (m.img_h, m.img_w))
    ego2img = jnp.asarray(rig["ego2img"][None])          # (1, A, 4, 4)
    A = m.num_cams
    h, w = m.img_h // 8, m.img_w // 8                    # level 0: (32, 56)
    C = m.embed_dims
    num_z = m.encoder.num_points_in_pillar
    bev_hw = (m.bev_h, m.bev_w)
    z_extent = m.pc_range[5] - m.pc_range[2]
    z_norm = jnp.linspace(0.5, z_extent - 0.5, num_z) / z_extent
    z_anchors = z_norm * z_extent + m.pc_range[2]
    H = plane_homographies(ego2img.astype(jnp.float32), m.pc_range,
                           z_anchors, bev_hw)
    S = jnp.asarray([[w / m.img_w, 0, -0.5], [0, h / m.img_h, -0.5],
                     [0, 0, 1.0]], jnp.float32)
    Ml = jnp.einsum("ij,bczjk->bczik", S, H)[0]          # (A, Z, 3, 3)
    pos = jax.vmap(lambda mm: LP._plane_positions(mm, bev_hw, h, w))(Ml)
    posB_c = pos[1]                                       # (A, h, ZR) order B
    ZR = num_z * m.bev_h
    ZRp = LP._round_up(ZR, LP._ZRB) if ZR > LP._ZRB else ZR
    h_pad = LP._round_up(h, LP._NB)
    p = LP._pad_axis(LP._pad_axis(posB_c, 1, h_pad, -2.0), 2, ZRp, -4.0)
    p = p[:, :, None, :]                                  # (A, h_pad, 1, ZRp)

    rng = np.random.RandomState(0)
    feat = jnp.asarray(rng.randn(A, h_pad, w, C), jnp.bfloat16)

    single = jax.jit(LP._pass1w)(p, feat)                 # (ZRp+zrb, A, h_pad, C)
    batched = jax.jit(jax.vmap(LP._pass1w))(
        jnp.stack([p, p]), jnp.stack([feat, feat]))
    s = np.asarray(single, np.float32)
    b = np.asarray(batched, np.float32)

    # live rows in COMPACT space, PER CAMERA (each camera has its own
    # live-first permutation): position > -2 for any image column
    live = np.asarray(p.max(axis=(1, 2)) > -2.0)          # (A, ZRp)
    print(f"ZR={ZR} ZRp={ZRp} zrb={min(LP._ZRB, ZRp)} "
          f"live/cam={live.sum(1)}", flush=True)
    for bi in range(2):
        x = b[bi]
        for a in range(A):
            xs = x[:ZRp, a][live[a, :ZRp]]
            ss = s[:ZRp, a][live[a, :ZRp]]
            if xs.size == 0:
                continue
            nan = int((~np.isfinite(xs)).sum())
            d = np.abs(np.where(np.isfinite(xs), xs, 0)
                       - np.where(np.isfinite(ss), ss, 0))
            snan = int((~np.isfinite(ss)).sum())
            if nan or snan or d.max() > 0:
                print(f"b={bi} cam={a} LIVE: nonfinite={nan} (single={snan}) "
                      f"maxdiff_vs_single={d.max():.4f}", flush=True)
        print(f"b={bi}: live-row check done", flush=True)


if __name__ == "__main__":
    main()
