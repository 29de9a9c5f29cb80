#!/usr/bin/env python
"""Micro-bench of the DCNv2 offset-window sampling at R101-DCN trunk shapes
(base scale: 6 cams, stage 3 58x100x256 / stage 4 29x50x512, 9 taps) — the
hot op of the r101_dcn configs (23 + 3 deformable 3x3 convs per frame).

Compares the packed corner-table gather (1 row/sample) against the 4-gather
form, plus the full modulated_deform_conv layer, per stage.
"""

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--dtype", default="bfloat16",
                    choices=("bfloat16", "float32"))
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from occnet_tpu.utils import enable_compilation_cache
    enable_compilation_cache()

    from occnet_tpu.ops.dcn_window import modulated_deform_conv_window
    from occnet_tpu.ops.deform_conv import modulated_deform_conv
    from occnet_tpu.ops.msda import bilinear_sample, bilinear_sample_packed

    dt = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    rng = np.random.RandomState(0)

    def sync(x):
        if isinstance(x, tuple):
            x = x[0]
        return float(jnp.sum(x.astype(jnp.float32)))

    def bench(fn, *xs):
        out = fn(*xs)
        sync(out)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = fn(*xs)
        sync(out)
        return (time.perf_counter() - t0) / args.iters * 1e3

    # (name, h, w, C, layers-per-frame)
    stages = [("stage3", 58, 100, 256, 23), ("stage4", 29, 50, 512, 3)]
    B, K = 6, 9
    total = {"packed": 0.0, "gather4": 0.0, "layer": 0.0}
    for name, h, w, C, n_layers in stages:
        x = jnp.asarray(rng.randn(B, h, w, C), dt)
        off = jnp.asarray(rng.randn(B, h, w, 2 * K) * 2.0, jnp.float32)
        mask = jnp.asarray(rng.rand(B, h, w, K), jnp.float32)
        weight = jnp.asarray(rng.randn(3, 3, C, C) * 0.02, dt)

        value = x.reshape(B, 1, h * w, C)
        loc = jnp.asarray(rng.rand(B, 1, h * w * K, 2), jnp.float32)

        t_pack = bench(jax.jit(
            lambda v, l: bilinear_sample_packed(v, h, w, l)), value, loc)
        t_g4 = bench(jax.jit(
            lambda v, l: bilinear_sample(v, h, w, l)), value, loc)
        t_layer = bench(jax.jit(
            lambda a, o, m, wt: modulated_deform_conv(a, o, m, wt)),
            x, off, mask, weight)
        rows = B * h * w * K
        print(f"{name} ({h}x{w}x{C}, {n_layers} layers/frame):", flush=True)
        print(f"  sample packed  {t_pack:7.2f} ms "
              f"({rows / t_pack * 1e3 / 1e6:6.1f} Mrows/s)")
        print(f"  sample gather4 {t_g4:7.2f} ms "
              f"({rows / t_g4 * 1e3 / 1e6:6.1f} Mrows/s)")
        print(f"  full DCN layer {t_layer:7.2f} ms "
              f"-> {t_layer * n_layers:7.1f} ms/frame", flush=True)
        for radius in (2, 3, 4):
            t_win = bench(jax.jit(functools.partial(
                modulated_deform_conv_window, radius=radius)),
                x, off, mask, weight)
            print(f"  window R={radius}     {t_win:7.2f} ms "
                  f"-> {t_win * n_layers:7.1f} ms/frame", flush=True)
        total["packed"] += t_pack * n_layers
        total["gather4"] += t_g4 * n_layers
        total["layer"] += t_layer * n_layers

    print(f"per frame: sampling packed {total['packed']:.1f} ms "
          f"(gather4 {total['gather4']:.1f} ms), "
          f"full DCN layers {total['layer']:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
