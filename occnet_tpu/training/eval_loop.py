"""In-training / standalone evaluation loop.

Equivalent of the reference's `CustomDistEvalHook` + `custom_multi_gpu_test`
(`core/evaluation/eval_hooks.py:29-92`, `bevformer/apis/test.py:45-87`):
every `interval` epochs run inference over the val split and compute the
ray-based RayIoU/mAVE/OccScore — here as a plain function the train CLI calls
between epochs (no hook registry), with the renders streaming through the
metric accumulator instead of staging all results in RAM.
"""

from __future__ import annotations

import time
from typing import Dict, Optional

import numpy as np

# One jitted inference fn per model instance: a fresh `jax.jit(lambda ...)`
# per run_evaluation call would retrace and recompile on every eval epoch
# (minutes through the remote compile helper); keyed by id with the model
# kept alive alongside so ids cannot be recycled.
_INFER_CACHE: Dict[int, tuple] = {}


def _cached_infer(model, data_cfg):
    import jax
    from occnet_tpu.data.pipeline import make_device_normalizer

    entry = _INFER_CACHE.get(id(model))
    if entry is None or entry[0] is not model:
        norm = make_device_normalizer(data_cfg)
        fn = jax.jit(lambda p, bs, i, e: model.apply(
            {"params": p, "batch_stats": bs}, norm(i), e))
        _INFER_CACHE[id(model)] = (model, fn)
        return fn
    return entry[1]


def run_evaluation(
    cfg,
    model,
    params,
    batch_stats,
    dataset,
    max_samples: Optional[int] = None,
    log=print,
) -> Dict[str, float]:
    import jax
    import jax.numpy as jnp
    from occnet_tpu.evaluation import (
        RayMetricAccumulator, generate_lidar_rays, occ_score_from_metrics)
    from occnet_tpu.evaluation.ray_metrics import render_pred_gt
    from occnet_tpu.evaluation.ego_pose import (extract_ego_origins,
                                                pad_origins)
    from occnet_tpu.models.head import get_occ

    from concurrent.futures import ThreadPoolExecutor

    n = len(dataset) if max_samples is None else min(len(dataset),
                                                     max_samples)
    infer = _cached_infer(model, cfg.data)
    origins_by_token = dict(extract_ego_origins(dataset.infos[:n]))
    rays = jnp.asarray(generate_lidar_rays())
    acc = RayMetricAccumulator()
    t0 = time.time()
    # Pipelined loop: sample loading runs on a prefetch thread, and the
    # per-sample metric counters stay on device (fetched in bulk every
    # `flush` samples) — the reference's per-sample python loop
    # (`apis/test.py:74-77` + `ray_metrics.py:89-143`) serialises H2D,
    # kernel, and D2H per frame; here they overlap.
    flush = 32
    pending = []

    def flush_pending():
        for c in jax.device_get(pending):
            acc.update_counts(c)
        pending.clear()

    with ThreadPoolExecutor(max_workers=2) as pool:
        depth = min(4, n)
        futures = [pool.submit(dataset.get_sample, i) for i in range(depth)]
        for i in range(n):
            s = futures.pop(0).result()
            if i + depth < n:
                futures.append(pool.submit(dataset.get_sample, i + depth))
            outs = infer(params, batch_stats, jnp.asarray(s["img"][None]),
                         jnp.asarray(s["ego2img"][None]))
            occ_cls, flow = get_occ(outs)
            padded, valid = pad_origins(origins_by_token[s["token"]],
                                        cfg.eval.max_origins)
            pred, gt = render_pred_gt(
                occ_cls[0].astype(jnp.int32), flow[0].astype(jnp.float32),
                jnp.asarray(s["voxel_semantics"]),
                jnp.asarray(s["voxel_flow"]),
                rays, jnp.asarray(padded), jnp.asarray(valid),
                voxel_size=cfg.eval.voxel_size,
                pc_range=tuple(cfg.eval.pc_range))
            pending.append(acc.count_async(pred, gt))
            if len(pending) >= flush:
                flush_pending()
                log(f"eval {i + 1}/{n}  "
                    f"{(time.time() - t0) / (i + 1):.2f}s/frame")
        flush_pending()
    scores = occ_score_from_metrics(acc.finalize())
    log(f"eval done ({n} frames): {scores}")
    return scores
