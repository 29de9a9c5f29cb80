#!/usr/bin/env python
"""Isolate the B=1 turbo eval NaN (tools/diag_turbo.py finding: the dense
forward emits all-NaN occ logits at batch 1 on the TPU backend while B=2 is
healthy).  Runs each TPU-only pallas op at B=1 and B=2 against its XLA/einsum
oracle, then (optionally) the full model forward with capture_intermediates
to find the first non-finite module output."""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def stats(name, x):
    import numpy as np
    x = np.asarray(x, np.float32)
    nan = int((~np.isfinite(x)).sum())
    print(f"  {name}: shape={x.shape} nonfinite={nan} "
          f"absmax={np.abs(x[np.isfinite(x)]).max() if nan < x.size else 'ALL'}",
          flush=True)
    return nan


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--full", action="store_true",
                   help="also run the full model forward with "
                        "capture_intermediates at B=1")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    from occnet_tpu.config import get_config
    from occnet_tpu.ops.lift_pallas import lift_and_average_pallas
    from occnet_tpu.ops.planar_lift import lift_and_average
    from occnet_tpu.ops.tsa_pallas import (tap_attention_pallas,
                                           tap_attention_xla, TSA_TAPS)
    from occnet_tpu.data.synthetic import ring_camera_rig
    from occnet_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    cfg = get_config("synth_tiny_turbo_occ")
    m = cfg.model
    rig = ring_camera_rig(m.num_cams, (m.img_h, m.img_w))
    ego2img = jnp.asarray(np.stack([rig["ego2img"]] * 2))     # (2, A, 4, 4)
    rng = np.random.RandomState(0)
    C = m.embed_dims
    lvl_hw = [(m.img_h // s, m.img_w // s) for s in (8, 16, 32, 64)]
    feats2 = [jnp.asarray(rng.randn(2, m.num_cams, h, w, C), jnp.bfloat16)
              for (h, w) in lvl_hw]
    feats1 = [f[:1] for f in feats2]

    kw = dict(pc_range=m.pc_range, num_z=m.encoder.num_points_in_pillar,
              bev_hw=(m.bev_h, m.bev_w), img_hw=(m.img_h, m.img_w))
    lift_p = jax.jit(lambda fs, e: lift_and_average_pallas(fs, e, **kw))
    lift_e = jax.jit(lambda fs, e: lift_and_average(fs, e, **kw))

    print("=== planar lift ===", flush=True)
    u2, c2 = lift_p(feats2, ego2img)
    u1, c1 = lift_p(feats1, ego2img[:1])
    ue, ce = lift_e(feats1, ego2img[:1])
    n2 = stats("pallas B=2", u2)
    n1 = stats("pallas B=1", u1)
    ne = stats("einsum B=1", ue)
    if not (n1 or ne):
        d = np.abs(np.asarray(u1, np.float32) - np.asarray(ue, np.float32))
        print(f"  pallas_b1 vs einsum_b1 maxdiff={d.max():.4f}", flush=True)
    d21 = np.abs(np.asarray(u2[:1], np.float32) - np.asarray(u1, np.float32))
    print(f"  pallas_b2[0] vs pallas_b1 maxdiff "
          f"(nan-skipped)={np.nanmax(np.where(np.isfinite(d21), d21, 0)):.4f}",
          flush=True)

    print("=== tsa tap attention ===", flush=True)
    H, W = m.bev_h, m.bev_w
    vgrid2 = jnp.asarray(rng.randn(2, 2, H, W, C), jnp.bfloat16)
    heads = m.encoder.tsa.num_heads
    attn2 = jax.nn.softmax(jnp.asarray(
        rng.randn(2, H, W, 2, len(TSA_TAPS), heads), jnp.float32), axis=4)
    tp = jax.jit(tap_attention_pallas)
    tx = jax.jit(tap_attention_xla)
    o2, o1 = tp(vgrid2, attn2), tp(vgrid2[:1], attn2[:1])
    ox = tx(vgrid2[:1], attn2[:1])
    stats("pallas B=2", o2)
    n1 = stats("pallas B=1", o1)
    nx = stats("xla B=1", ox)
    if not (n1 or nx):
        d = np.abs(np.asarray(o1, np.float32) - np.asarray(ox, np.float32))
        print(f"  pallas_b1 vs xla_b1 maxdiff={d.max():.4f}", flush=True)

    if args.full:
        print("=== full forward B=1 (capture_intermediates) ===", flush=True)
        from occnet_tpu.models.detector import OccNet
        model = OccNet(cfg.model)
        img = jnp.asarray(rng.randn(1, m.num_cams, m.img_h, m.img_w, 3),
                          jnp.float32)
        variables = jax.jit(model.init)({"params": jax.random.PRNGKey(0)},
                                        img, ego2img[:1])
        outs, inter = model.apply(variables, img, ego2img[:1],
                                  capture_intermediates=True,
                                  mutable=["intermediates"])
        bad = []
        for path, leaf in jax.tree_util.tree_leaves_with_path(inter):
            arr = np.asarray(leaf, np.float32)
            if (~np.isfinite(arr)).any():
                bad.append("/".join(str(getattr(q, "key", q)) for q in path))
        print("first nonfinite intermediates:", bad[:20], flush=True)
        stats("occ logits", outs["occ"])


if __name__ == "__main__":
    main()
