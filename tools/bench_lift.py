#!/usr/bin/env python
"""Microbenchmark: planar lift at base scale (6 cams, 928x1600 imgs, 4 FPN
levels, 200x200 BEV, 8 z-anchors, C=256) — einsum vs Pallas implementations,
forward and forward+backward."""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--impl", default="pallas,einsum")
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--grad", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from occnet_tpu.utils import enable_compilation_cache
    enable_compilation_cache()

    from occnet_tpu.ops.planar_lift import lift_and_average
    from occnet_tpu.ops.lift_pallas import lift_and_average_pallas

    PC = (-40.0, -40.0, -1.0, 40.0, 40.0, 5.4)
    IMG_HW = (928, 1600)
    A, C, num_z, bev = 6, 256, 8, (200, 200)

    rng = np.random.RandomState(0)
    feats = []
    for s in (8, 16, 32, 64):
        h, w = IMG_HW[0] // s, IMG_HW[1] // s
        feats.append(jnp.asarray(
            rng.randn(1, A, h, w, C).astype(np.float32), jnp.bfloat16))
    ego2img = np.zeros((1, A, 4, 4), np.float32)
    K = np.array([[800.0, 0, 800], [0, 800, 464], [0, 0, 1]])
    base = np.array([[0.0, -1.0, 0.0], [0.0, 0.0, -1.0], [1.0, 0.0, 0.0]])
    for ci in range(A):
        a = 2 * np.pi * ci / A
        Rz = np.array([[np.cos(a), -np.sin(a), 0],
                       [np.sin(a), np.cos(a), 0], [0, 0, 1.0]])
        m = np.eye(4, dtype=np.float32)
        m[:3, :3] = K @ (Rz @ base).T
        ego2img[0, ci] = m
    ego2img = jnp.asarray(ego2img)

    def sync(x):
        return float(jnp.sum(x.astype(jnp.float32)))

    impls = {"einsum": lift_and_average, "pallas": lift_and_average_pallas}
    for name in args.impl.split(","):
        fn = impls[name]

        @jax.jit
        def fwd(fs):
            u, c = fn(fs, ego2img, PC, num_z, bev, IMG_HW)
            return u

        @jax.jit
        def fwdbwd(fs):
            def loss(fs):
                u, _ = fn(fs, ego2img, PC, num_z, bev, IMG_HW)
                return jnp.sum(u.astype(jnp.float32))
            l, g = jax.value_and_grad(loss)(fs)
            return l + sum(jnp.sum(x.astype(jnp.float32)) for x in g)

        for label, f, out_sync in (
                ("fwd", fwd, lambda o: sync(o)),
                ("fwd+bwd", fwdbwd, lambda o: float(o)),) :
            if label == "fwd+bwd" and not args.grad:
                continue
            t0 = time.perf_counter()
            out = f(feats)
            out_sync(out)
            compile_s = time.perf_counter() - t0
            t0 = time.perf_counter()
            for _ in range(args.iters):
                out = f(feats)
            out_sync(out)
            dt = (time.perf_counter() - t0) / args.iters
            print(f"{name:8s} {label:8s}: {dt*1e3:8.2f} ms "
                  f"(compile {compile_s:.1f}s)", flush=True)


if __name__ == "__main__":
    main()
