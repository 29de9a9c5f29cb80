#!/usr/bin/env python
"""In-context encoder cost attribution: time the real lift+encoder graph with
each submodule class (TSA / SCA / FFN / LayerNorm) monkeypatched to an
identity, at full base scale.  The delta vs the unablated graph is that
module's cost *inside* the fused XLA program (standalone micro-benches
overstate: they pay layout transposes the fused graph doesn't)."""

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

    from occnet_tpu.config import get_config
    from occnet_tpu.models.detector import OccNet
    import occnet_tpu.models.dense_attention as da
    import occnet_tpu.models.encoder as enc
    import occnet_tpu.models.norm as norm_mod
    from tools.train import make_synthetic_batch

    cfg = get_config("turbo_occ")
    rng = np.random.RandomState(0)
    batch = make_synthetic_batch(cfg, 1, rng)
    img = jnp.asarray(batch["img"])
    ego2img = jnp.asarray(batch["ego2img"])

    def identity_call(self, query, *a, **k):
        return query

    patches = {
        "full  ": [],
        "no_tsa": [(da.DenseTemporalSelfAttention, "__call__")],
        "no_sca": [(da.DenseSpatialCrossAttention, "__call__")],
        "no_ffn": [(enc.FFN, "__call__")],
        "no_ln ": [(norm_mod.LayerNorm32, "__call__")],
    }

    def sync(x):
        return float(jnp.sum(x.astype(jnp.float32)))

    iters = int(os.environ.get("BENCH_ITERS", "20"))
    base = None
    for name, plist in patches.items():
        saved = [(c, getattr(c, m)) for c, m in plist]
        for c, m in plist:
            setattr(c, m, identity_call)
        try:
            model = OccNet(cfg.model)
            variables = jax.jit(model.init)(
                {"params": jax.random.PRNGKey(0)}, img, ego2img)

            @jax.jit
            def bev_fn(v, feats_img, e):
                def go(m, feats_img, e):
                    h = m.head
                    feats = m.extract_img_feat(feats_img)
                    bev_pos = h.positional_encoding(feats_img.shape[0])
                    return h.transformer.get_bev_features(
                        feats, h.bev_embedding, bev_pos, e)
                return model.apply(v, feats_img, e, method=go)

            sync(bev_fn(variables, img, ego2img))
            t0 = time.perf_counter()
            for _ in range(iters):
                o = bev_fn(variables, img, ego2img)
            sync(o)
            dt = (time.perf_counter() - t0) / iters * 1e3
            extra = ""
            if name == "full  ":
                base = dt
            elif base is not None:
                extra = f"   (module cost {base - dt:+7.2f} ms over 4 layers)"
            print(f"{name}: {dt:8.2f} ms{extra}", flush=True)
        finally:
            for (c, m), (_, orig) in zip(plist, saved):
                setattr(c, m, orig)


if __name__ == "__main__":
    main()
