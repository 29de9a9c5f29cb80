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

    n = len(dataset) if max_samples is None else min(len(dataset),
                                                     max_samples)
    infer = jax.jit(lambda p, bs, i, e: model.apply(
        {"params": p, "batch_stats": bs}, i, e))
    origins_by_token = dict(extract_ego_origins(dataset.infos[:n]))
    rays = jnp.asarray(generate_lidar_rays())
    acc = RayMetricAccumulator()
    t0 = time.time()
    for i in range(n):
        s = dataset.get_sample(i)
        outs = infer(params, batch_stats, jnp.asarray(s["img"][None]),
                     jnp.asarray(s["ego2img"][None]))
        occ_cls, flow = get_occ(outs)
        padded, valid = pad_origins(origins_by_token[s["token"]],
                                    cfg.eval.max_origins)
        pred, gt = render_pred_gt(
            occ_cls[0].astype(jnp.int32), flow[0].astype(jnp.float32),
            jnp.asarray(s["voxel_semantics"]), jnp.asarray(s["voxel_flow"]),
            rays, jnp.asarray(padded), jnp.asarray(valid))
        acc.update(pred, gt)
        if (i + 1) % 100 == 0:
            log(f"eval {i + 1}/{n}  {(time.time() - t0) / (i + 1):.2f}s/frame")
    scores = occ_score_from_metrics(acc.finalize())
    log(f"eval done ({n} frames): {scores}")
    return scores
