#!/usr/bin/env python
"""Component breakdown of the flagship (turbo_occ) forward on TPU:
backbone+neck / lift / encoder / voxel decode+heads, plus full forward and
train step."""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="turbo_occ")
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--train", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from occnet_tpu.utils import enable_compilation_cache
    enable_compilation_cache()

    from occnet_tpu.config import get_config
    from occnet_tpu.models.detector import OccNet
    from tools.train import make_synthetic_batch

    cfg = get_config(args.config)
    rng = np.random.RandomState(0)
    batch = make_synthetic_batch(cfg, 1, rng)
    model = OccNet(cfg.model)
    variables = jax.jit(model.init)({"params": jax.random.PRNGKey(0)},
                                    batch["img"], batch["ego2img"])
    img, ego2img = batch["img"], batch["ego2img"]
    c = cfg.model

    def sync(x):
        leaves = jax.tree_util.tree_leaves(x)
        return float(jnp.sum(leaves[0].astype(jnp.float32)))

    @jax.jit
    def feats_fn(v, img):
        return model.apply(v, img,
                           method=lambda m, im: m.extract_img_feat(im))

    mlvl = feats_fn(variables, img)

    @jax.jit
    def lift_fn(v, feats, e):
        def go(m, feats, e):
            t = m.head.transformer
            fs = [t.shared_value_proj(f) for f in t.flat_embed(feats)]
            from occnet_tpu.ops.lift_pallas import lift_and_average_pallas
            return lift_and_average_pallas(
                fs, e, c.pc_range, c.encoder.num_points_in_pillar,
                (c.bev_h, c.bev_w), (c.img_h, c.img_w),
                out_dtype=t.dtype)[0]
        return model.apply(v, feats, e, method=go)

    @jax.jit
    def full_fn(v, img, e):
        return model.apply(v, img, e)

    @jax.jit
    def bev_fn(v, feats, e):
        def go(m, feats, e):
            h = m.head
            bev_pos = h.positional_encoding(feats[0].shape[0])
            return h.transformer.get_bev_features(
                feats, h.bev_embedding, bev_pos, e)
        return model.apply(v, feats, e, method=go)

    bev = bev_fn(variables, mlvl, ego2img)

    @jax.jit
    def decode_fn(v, bev):
        def go(m, bev):
            t = m.head.transformer
            vox = t.decode_voxels(bev)
            return t.predicter(vox), t.flow_predicter(vox)
        return model.apply(v, bev, method=go)

    cases = [
        ("backbone+neck", lambda: feats_fn(variables, img)),
        ("lift         ", lambda: lift_fn(variables, mlvl, ego2img)),
        ("lift+encoder ", lambda: bev_fn(variables, mlvl, ego2img)),
        ("decode+heads ", lambda: decode_fn(variables, bev)),
        ("full forward ", lambda: full_fn(variables, img, ego2img)),
    ]
    if args.train:
        from occnet_tpu.training import create_train_state, make_train_step
        _, state = create_train_state(cfg, jax.random.PRNGKey(0), batch)
        step = jax.jit(make_train_step(cfg, model))
        key = jax.random.PRNGKey(0)
        holder = {"s": state}

        def train_case():
            s, m = step(holder["s"], batch, key)
            holder["s"] = s
            return m
        cases.append(("train step   ", train_case))

    flops = {
        "backbone+neck": lambda: feats_fn.lower(variables, img),
        "lift+encoder ": lambda: bev_fn.lower(variables, mlvl, ego2img),
        "decode+heads ": lambda: decode_fn.lower(variables, bev),
        "full forward ": lambda: full_fn.lower(variables, img, ego2img),
    }

    def stage_flops(name):
        try:
            an = flops[name]().compile().cost_analysis()
            if isinstance(an, list):
                an = an[0]
            return float(an.get("flops", 0.0))
        except Exception:  # noqa: BLE001 — cost analysis is best-effort
            return 0.0

    for name, f in cases:
        try:
            sync(f())
        except Exception as e:          # noqa: BLE001
            print(f"{name}: FAILED {type(e).__name__}: {e}", flush=True)
            continue
        t0 = time.perf_counter()
        for _ in range(args.iters):
            o = f()
        sync(o)
        dt = (time.perf_counter() - t0) / args.iters
        # achieved TF/s vs the ~20 TF/s narrow-dim MXU ceiling measured on
        # this chip (BASELINE.md) — the honest MFU denominator for <=256-wide
        # contractions, not the 8k-matmul peak
        fl = stage_flops(name) if name in flops else 0.0
        tfs = f"  ({fl / dt / 1e12:5.2f} TF/s vs ~20 ceiling)" if fl else ""
        print(f"{name}: {dt*1e3:8.2f} ms{tfs}", flush=True)


if __name__ == "__main__":
    main()
