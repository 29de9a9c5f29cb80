#!/usr/bin/env python
"""Backbone stage breakdown on TPU: where do the ~31 ms of R50+FPN go?

Times the stem (conv1+bn+relu+maxpool), each residual stage, and the FPN
separately, plus the whole backbone at batch 1 and 2."""

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
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import flax.linen as nn
    from occnet_tpu.utils import enable_compilation_cache
    enable_compilation_cache()

    from occnet_tpu.config import get_config
    from occnet_tpu.models.resnet import ResNet, FrozenBatchNorm
    from occnet_tpu.models.detector import OccNet
    from tools.train import make_synthetic_batch

    cfg = get_config(args.config)
    c = cfg.model
    rng = np.random.RandomState(0)
    batch = make_synthetic_batch(cfg, 1, rng)
    img = batch["img"]
    B, N = img.shape[:2]
    flat = img.reshape(B * N, c.img_h, c.img_w, 3)

    model = OccNet(c)
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           batch["img"], batch["ego2img"])

    def sync(x):
        leaves = jax.tree_util.tree_leaves(x)
        return float(jnp.sum(leaves[0].astype(jnp.float32)))

    dtype = jnp.bfloat16 if c.compute_dtype == "bfloat16" else jnp.float32
    bb = ResNet(depth=int(c.backbone.type.replace("resnet", "")),
                out_indices=c.backbone.out_indices,
                frozen_stages=c.backbone.frozen_stages,
                dcn_stages=c.backbone.dcn_stages, dtype=dtype)
    bb_vars = {"params": variables["params"]["backbone"],
               "batch_stats": variables.get("batch_stats", {}).get(
                   "backbone", {})}

    @jax.jit
    def full_backbone(v, x):
        return bb.apply(v, x)

    @jax.jit
    def full_feats(v, im):
        return model.apply(v, im,
                           method=lambda m, i: m.extract_img_feat(i))

    cases = [
        ("backbone b1 ", lambda: full_backbone(bb_vars, flat)),
        ("feats+fpn b1", lambda: full_feats(variables, img)),
    ]
    img2 = jnp.concatenate([img, img], axis=0)
    flat2 = jnp.concatenate([flat, flat], axis=0)
    cases += [
        ("backbone b2 ", lambda: full_backbone(bb_vars, flat2)),
        ("feats+fpn b2", lambda: full_feats(variables, img2)),
    ]

    for name, f in cases:
        sync(f())
        t0 = time.perf_counter()
        for _ in range(args.iters):
            o = f()
        sync(o)
        dt = (time.perf_counter() - t0) / args.iters
        print(f"{name}: {dt*1e3:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
