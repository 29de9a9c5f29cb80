#!/usr/bin/env python
"""Per-submodule timing of one dense encoder layer at full base scale:
TSA / SCA / FFN / LayerNorm, to locate the encoder's time sinks
(bench_model.py shows the 4-layer encoder at ~30 ms)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    import flax.linen as nn
    from occnet_tpu.utils import enable_compilation_cache
    enable_compilation_cache()

    from occnet_tpu.config import get_config
    from occnet_tpu.models.dense_attention import (
        DenseSpatialCrossAttention, DenseTemporalSelfAttention)
    from occnet_tpu.models.encoder import FFN
    from occnet_tpu.models.norm import LayerNorm32

    cfg = get_config("turbo_occ").model
    B, Q, C = 1, cfg.bev_h * cfg.bev_w, cfg.embed_dims
    L, Z = cfg.num_feature_levels, cfg.encoder.num_points_in_pillar
    dt = jnp.bfloat16
    rng = np.random.RandomState(0)
    query = jnp.asarray(rng.randn(B, Q, C), dt)
    lifted = jnp.asarray(rng.randn(B, L, Z, Q, C), dt)
    qpos = jnp.asarray(rng.randn(B, Q, C), dt)

    tsa = DenseTemporalSelfAttention(cfg.encoder.tsa, embed_dims=C,
                                     bev_hw=(cfg.bev_h, cfg.bev_w), dtype=dt)
    sca = DenseSpatialCrossAttention(cfg.encoder.sca, embed_dims=C,
                                     num_levels=L, num_z=Z, dtype=dt)
    ffn = FFN(C, cfg.encoder.ffn_dim, 0.1, dtype=dt)
    ln = LayerNorm32(out_dtype=dt)

    key = jax.random.PRNGKey(0)
    v_tsa = tsa.init(key, query, None, qpos)
    v_sca = sca.init(key, query, lifted, None)
    v_ffn = ffn.init(key, query)
    v_ln = ln.init(key, query)

    cases = [
        ("tsa ", jax.jit(lambda q: tsa.apply(v_tsa, q, None, qpos)),
         (query,)),
        ("sca ", jax.jit(lambda q, lv: sca.apply(v_sca, q, lv, None)),
         (query, lifted)),
        ("ffn ", jax.jit(lambda q: ffn.apply(v_ffn, q)), (query,)),
        ("ln  ", jax.jit(lambda q: ln.apply(v_ln, q)), (query,)),
    ]

    def sync(x):
        return float(jnp.sum(x.astype(jnp.float32)))

    iters = int(os.environ.get("BENCH_ITERS", "20"))
    for name, f, a in cases:
        sync(f(*a))
        t0 = time.perf_counter()
        for _ in range(iters):
            o = f(*a)
        sync(o)
        print(f"{name}: {(time.perf_counter() - t0) / iters * 1e3:7.2f} ms",
              flush=True)


if __name__ == "__main__":
    main()
