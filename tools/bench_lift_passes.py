#!/usr/bin/env python
"""Per-pass microbenchmark of the Pallas lift at level-0 base scale
(padded v3 layouts: tmp (ZR_pad, A, N_pad, C))."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from occnet_tpu.utils import enable_compilation_cache
    enable_compilation_cache()

    from occnet_tpu.ops import lift_pallas as LP

    A, h, w, C = 6, 116, 200, 256
    Z, bev_h, bev_w = 8, 200, 200
    ZR, M = Z * bev_h, bev_w
    ZRp = LP._round_up(ZR, LP._ZRB)
    w_pad = LP._round_up(w, LP._NB)
    h_pad = LP._round_up(h, LP._NB)
    rng = np.random.RandomState(0)

    featT = jnp.asarray(rng.randn(A, w_pad, h, C), jnp.bfloat16)
    featB = jnp.asarray(rng.randn(A, h_pad, w, C), jnp.bfloat16)
    posA = jnp.asarray(rng.rand(A, w_pad, 1, ZRp) * h, jnp.float32)
    posB = jnp.asarray(rng.rand(A, h_pad, 1, ZRp) * w, jnp.float32)
    pos2A = jnp.asarray(rng.rand(ZRp, A, M) * w, jnp.float32)
    pos2B = jnp.asarray(np.full((ZRp, A, M), -2.0), jnp.float32)
    inv = jnp.ones((bev_h, 1, M), jnp.float32)
    tmpA = jnp.asarray(rng.randn(ZRp, A, w_pad, C), jnp.bfloat16)
    tmpB = jnp.asarray(rng.randn(ZRp, A, h_pad, C), jnp.bfloat16)
    g = jnp.asarray(rng.randn(ZRp, M, C), jnp.bfloat16)

    def sync(x):
        if isinstance(x, (tuple, list)):
            x = x[0]
        return float(jnp.sum(x.astype(jnp.float32)))

    p1a = jax.jit(lambda p, f: LP._pass1(p, f))
    p2 = jax.jit(lambda a, b, i, ta, tb: LP._pass2(
        a, b, i, ta, tb, ZR, bev_h, jnp.bfloat16))
    p2b = jax.jit(lambda a, b, i, gg: LP._pass2_bwd(
        a, b, i, gg, w_pad, h_pad, bev_h))
    p1ab = jax.jit(lambda p, gg: LP._pass1_bwd(p, gg, h))

    cases = [
        ("pass1A ", lambda: p1a(posA, featT)),
        ("pass1B ", lambda: p1a(posB, featB)),
        ("pass2  ", lambda: p2(pos2A, pos2B, inv, tmpA, tmpB)),
        ("pass2b ", lambda: p2b(pos2A, pos2B, inv, g)),
        ("pass1Ab", lambda: p1ab(posA, tmpA)),
    ]
    for name, f in cases:
        sync(f())
        t0 = time.perf_counter()
        n = 10
        for _ in range(n):
            o = f()
        sync(o)
        print(f"{name}: {(time.perf_counter()-t0)/n*1e3:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
