#!/usr/bin/env python
"""Micro-bench of the deformable-attention sampling core at exact-mode SCA
shapes (base scale: 6 cams x K queries x 8 heads x 4 levels x 8 points over
the 928x1600 stride-8/16/32/64 pyramid) — the hot op of gather-mode eval.

Compares the fused Pallas kernel (all-VMEM levels under bf16 residency vs
XLA fallback for level 0) against the XLA patch-table gather, per K.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ks", type=int, nargs="*", default=[16384, 12288])
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--dtype", default="bfloat16",
                    choices=("bfloat16", "float32"))
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from occnet_tpu.utils import enable_compilation_cache
    enable_compilation_cache()

    from occnet_tpu.ops.msda import multi_scale_deformable_attention
    from occnet_tpu.ops.msda_pallas import (
        multi_scale_deformable_attention_pallas)

    shapes = ((116, 200), (58, 100), (29, 50), (15, 25))
    V = sum(h * w for h, w in shapes)
    B, H, D, L, P = 6, 8, 32, 4, 8
    dt = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32

    rng = np.random.RandomState(0)
    value = jnp.asarray(rng.randn(B, V, H, D), dt)

    def sync(x):
        return float(jnp.sum(x.astype(jnp.float32)))

    impls = {
        "xla": jax.jit(lambda v, l, a: multi_scale_deformable_attention(
            v, shapes, l, a)),
        "pallas": jax.jit(lambda v, l, a:
                          multi_scale_deformable_attention_pallas(
                              v, shapes, l, a)),
    }

    for K in args.ks:
        loc = jnp.asarray(rng.rand(B, K, H, L, P, 2), jnp.float32)
        attn = jnp.asarray(rng.rand(B, K, H, L, P), jnp.float32)
        attn = attn / attn.sum(axis=(-2, -1), keepdims=True)
        outs = {}
        for name, fn in impls.items():
            out = fn(value, loc, attn)
            sync(out)  # compile + settle
            t0 = time.perf_counter()
            for _ in range(args.iters):
                out = fn(value, loc, attn)
            sync(out)
            ms = (time.perf_counter() - t0) / args.iters * 1e3
            outs[name] = np.asarray(out, np.float32)
            print(f"K={K:6d} {name:7s} {ms:8.2f} ms "
                  f"({B * K * H * L * P / ms * 1e3 / 1e6:.1f} Msamples/s)",
                  flush=True)
        err = np.abs(outs["pallas"] - outs["xla"]).max()
        print(f"K={K:6d} max |pallas - xla| = {err:.3e}", flush=True)


if __name__ == "__main__":
    main()
