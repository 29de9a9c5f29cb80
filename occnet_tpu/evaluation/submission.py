"""Challenge submission writer + offline scorer.

Equivalents of the reference's `format_results` (`datasets/nuscenes_occ.py:
189-257`) and the offline `tools/ray_iou/metric.py` CLI: renders predicted
grids to ray point clouds and packs {token: {pcd_cls u8, pcd_dist f16,
pcd_flow f16[N,2]}} plus metadata into a gzip pickle; `score_submissions`
compares two such files into RayIoU@{1,2,4} / mAVE / OccScore.
"""

from __future__ import annotations

import gzip
import pickle
from typing import Dict, Iterable, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from occnet_tpu.evaluation.ray_metrics import (
    FREE_ID,
    RayMetricAccumulator,
    THRESHOLDS,
    generate_lidar_rays,
    occ_score_from_metrics,
    render_sample_vec,
)
from occnet_tpu.evaluation.ego_pose import pad_origins


def render_to_pcd(sem: np.ndarray, flow: np.ndarray, rays: np.ndarray,
                  origins: np.ndarray, max_origins: int = 8):
    """Render one sample -> flat (label, dist, flow) arrays over T*R rays."""
    padded, valid = pad_origins(origins, max_origins)
    out = render_sample_vec(jnp.asarray(sem.astype(np.int32)),
                             jnp.asarray(flow), jnp.asarray(rays),
                             jnp.asarray(padded), jnp.asarray(valid))
    keep = np.asarray(out["valid"]).reshape(-1)
    label = np.asarray(out["label"]).reshape(-1)[keep]
    dist = np.asarray(out["dist"]).reshape(-1)[keep]
    fl = np.asarray(out["flow"]).reshape(-1, 2)[keep]
    return label, dist, fl


def write_submission(
    path: str,
    samples: Iterable[Tuple[str, np.ndarray, np.ndarray, np.ndarray]],
    meta: Optional[dict] = None,
):
    """samples: iterable of (token, sem [200,200,16], flow [...,2],
    origins (T,3))."""
    rays = generate_lidar_rays()
    results: Dict[str, dict] = {}
    for token, sem, flow, origins in samples:
        label, dist, fl = render_to_pcd(sem, flow, rays, origins)
        results[token] = {
            "pcd_cls": label.astype(np.uint8),
            "pcd_dist": dist.astype(np.float16),
            "pcd_flow": fl.astype(np.float16),
        }
    payload = {"method": "occnet_tpu", "team": "", "authors": [],
               "e-mail": "", "institution / company": "", "country / region": "",
               "results": results}
    payload.update(meta or {})
    with gzip.open(path, "wb", compresslevel=9) as f:
        pickle.dump(payload, f, protocol=pickle.HIGHEST_PROTOCOL)


def load_submission(path: str) -> dict:
    with gzip.open(path, "rb") as f:
        return pickle.load(f)


def merge_submissions(part_paths: Iterable[str], out_path: str) -> int:
    """Merge per-process partial submissions (multi-host `--format-only`,
    the analogue of the reference's 8-GPU submission generation + rank-0
    collection, `apis/test.py:89-133`) into one file.  Later parts win on
    duplicate tokens (shard padding repeats boundary samples).  Returns the
    merged sample count."""
    merged: Dict[str, dict] = {}
    meta = None
    for p in part_paths:
        payload = load_submission(p)
        if meta is None:
            meta = {k: v for k, v in payload.items() if k != "results"}
        merged.update(payload["results"])
    payload = dict(meta or {})
    payload["results"] = merged
    with gzip.open(out_path, "wb", compresslevel=9) as f:
        pickle.dump(payload, f, protocol=pickle.HIGHEST_PROTOCOL)
    return len(merged)


def score_submissions(pred_path: str, gt_path: str) -> dict:
    """Offline scorer (`tools/ray_iou/metric.py:83-142`): pred vs GT
    submission gz files -> metric dict."""
    pred = load_submission(pred_path)["results"]
    gt = load_submission(gt_path)["results"]
    acc = RayMetricAccumulator()
    for token, g in gt.items():
        p = pred[token]
        g_cls = g["pcd_cls"].astype(np.int32)
        valid = g_cls != FREE_ID
        sample_p = {
            "label": jnp.asarray(p["pcd_cls"].astype(np.int32))[None],
            "dist": jnp.asarray(p["pcd_dist"].astype(np.float32))[None],
            "flow": jnp.asarray(p["pcd_flow"].astype(np.float32))[None],
            "valid": jnp.asarray(np.ones_like(valid))[None],
        }
        sample_g = {
            "label": jnp.asarray(g_cls)[None],
            "dist": jnp.asarray(g["pcd_dist"].astype(np.float32))[None],
            "flow": jnp.asarray(g["pcd_flow"].astype(np.float32))[None],
            "valid": jnp.asarray(np.ones_like(valid))[None],
        }
        acc.update(sample_p, sample_g)
    return occ_score_from_metrics(acc.finalize())
