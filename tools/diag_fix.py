#!/usr/bin/env python
"""Validate the two lift_pallas fixes on the TPU backend:
1. forward: vmapped B=2 lift is finite and bit-matches per-sample calls;
2. backward: vmapped B=2 lift gradient matches the sum/stack of per-sample
   gradients (the pl.program_id shift corrupted this before the scalar-
   prefetch fix)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from occnet_tpu.config import get_config
    from occnet_tpu.ops.lift_pallas import lift_and_average_pallas
    from occnet_tpu.ops.planar_lift import lift_and_average
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
    feats2 = [jnp.asarray(rng.randn(2, m.num_cams, h, w, C), jnp.bfloat16)
              for (h, w) in lvl_hw]

    kw = dict(pc_range=m.pc_range, num_z=m.encoder.num_points_in_pillar,
              bev_hw=(m.bev_h, m.bev_w), img_hw=(m.img_h, m.img_w))
    lift_p = jax.jit(lambda fs, e: lift_and_average_pallas(fs, e, **kw)[0])
    lift_e = jax.jit(lambda fs, e: lift_and_average(fs, e, **kw)[0])

    u2 = np.asarray(lift_p(feats2, ego2img), np.float32)
    nb = int((~np.isfinite(u2)).sum())
    print(f"fwd B=2 nonfinite={nb}", flush=True)
    for bi in range(2):
        u1 = np.asarray(lift_p([f[bi:bi + 1] for f in feats2],
                               ego2img[bi:bi + 1]), np.float32)
        d = np.abs(u2[bi:bi + 1] - u1).max()
        print(f"fwd b{bi} vs per-sample maxdiff={d:.6f}", flush=True)

    # gradient parity: d/dfeats of a fixed contraction of the lift output
    cot = jnp.asarray(rng.randn(2, 4, m.encoder.num_points_in_pillar,
                                m.bev_h * m.bev_w, C), jnp.float32)

    def loss2(fs):
        return jnp.sum(lift_p(fs, ego2img).astype(jnp.float32) * cot)

    g2 = jax.jit(jax.grad(loss2))(feats2)

    def loss1(fs, e2i, c):
        return jnp.sum(lift_p(fs, e2i).astype(jnp.float32) * c)

    grad1 = jax.jit(jax.grad(loss1))
    ok = True
    for bi in range(2):
        g1 = grad1([f[bi:bi + 1] for f in feats2], ego2img[bi:bi + 1],
                   cot[bi:bi + 1])
        for lvl in range(4):
            a = np.asarray(g2[lvl][bi], np.float32)
            b = np.asarray(g1[lvl][0], np.float32)
            nf = int((~np.isfinite(a)).sum())
            d = np.abs(a - b).max()
            rel = d / max(np.abs(b).max(), 1e-6)
            status = "OK" if (nf == 0 and rel < 1e-3) else "FAIL"
            if status == "FAIL":
                ok = False
            print(f"grad b{bi} lvl{lvl}: nonfinite={nf} maxdiff={d:.5f} "
                  f"rel={rel:.2e} {status}", flush=True)

    # einsum-oracle spot check at B=2 (fwd values)
    ue = np.asarray(lift_e(feats2, ego2img), np.float32)
    d = np.abs(u2 - ue).max()
    print(f"fwd B=2 vs einsum maxdiff={d:.4f}", flush=True)
    print("ALL OK" if ok and nb == 0 else "FAILURES PRESENT", flush=True)


if __name__ == "__main__":
    main()
