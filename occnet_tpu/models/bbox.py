"""Detection bbox stack: box codec, match costs, Hungarian assignment and the
NMS-free decoder — pure JAX/numpy equivalents of the reference's
`core/bbox/` package:

- `normalize_bbox`/`denormalize_bbox` (`core/bbox/util.py:4-52`): 9-DoF
  (cx, cy, cz, w, l, h, rot, vx, vy) boxes <-> the 10-code network
  parameterisation (cx, cy, log w, log l, cz, log h, sin rot, cos rot,
  vx, vy).
- `bbox3d_l1_cost` (`core/bbox/match_costs/match_cost.py:6-26`): pairwise L1
  cost between predicted and (normalised) GT codes.
- `focal_loss_cost` / `classification_cost`: the mmdet `FocalLossCost`
  (used by the occ configs, `bevformer_base_occ.py:144`) and
  `ClassificationCost` match costs the assigner consumes.
- `hungarian_assign_3d` (`core/bbox/assigners/hungarian_assigner_3d.py:
  17-135`): one-to-one matching; cost terms on device, the Hungarian solve
  on host via scipy (the reference also solves on CPU, :121-126).
- `nms_free_decode` (`core/bbox/coders/nms_free_coder.py:10-122`): top-k
  score decode with center-range masking — static-shape (max_num boxes +
  validity mask) so it jits; the reference's dynamic boolean filter becomes
  a mask, which callers apply on host.

The iou_cost of the reference config is weight-0 ("Fake cost", config
`bevformer_base_occ.py:146`) and is intentionally not implemented.
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def normalize_bbox(bboxes: jax.Array) -> jax.Array:
    """(..., 7 or 9) gravity-center boxes -> (..., 8 or 10) network codes
    (`core/bbox/util.py:4-24`).  pc_range is unused (matching the
    reference, which takes but ignores it)."""
    cx, cy, cz = bboxes[..., 0:1], bboxes[..., 1:2], bboxes[..., 2:3]
    w = jnp.log(bboxes[..., 3:4])
    l = jnp.log(bboxes[..., 4:5])
    h = jnp.log(bboxes[..., 5:6])
    rot = bboxes[..., 6:7]
    parts = [cx, cy, w, l, cz, h, jnp.sin(rot), jnp.cos(rot)]
    if bboxes.shape[-1] > 7:
        parts += [bboxes[..., 7:8], bboxes[..., 8:9]]
    return jnp.concatenate(parts, axis=-1)


def denormalize_bbox(codes: jax.Array) -> jax.Array:
    """(..., 8 or 10) network codes -> (..., 7 or 9) boxes
    (`core/bbox/util.py:26-52`)."""
    rot = jnp.arctan2(codes[..., 6:7], codes[..., 7:8])
    cx, cy, cz = codes[..., 0:1], codes[..., 1:2], codes[..., 4:5]
    w = jnp.exp(codes[..., 2:3])
    l = jnp.exp(codes[..., 3:4])
    h = jnp.exp(codes[..., 5:6])
    parts = [cx, cy, cz, w, l, h, rot]
    if codes.shape[-1] > 8:
        parts += [codes[..., 8:9], codes[..., 9:10]]
    return jnp.concatenate(parts, axis=-1)


def bbox3d_l1_cost(bbox_pred: jax.Array, gt_codes: jax.Array,
                   weight: float = 1.0) -> jax.Array:
    """(Q, C) x (G, C) -> (Q, G) pairwise L1 (`match_cost.py:16-26`)."""
    d = jnp.abs(bbox_pred[:, None, :] - gt_codes[None, :, :]).sum(-1)
    return d * weight


def focal_loss_cost(cls_pred: jax.Array, gt_labels: jax.Array,
                    weight: float = 2.0, alpha: float = 0.25,
                    gamma: float = 2.0, eps: float = 1e-12) -> jax.Array:
    """mmdet `FocalLossCost` (the occ configs' cls_cost,
    `bevformer_base_occ.py:144`): (Q, num_cls) logits x (G,) labels ->
    (Q, G)."""
    p = jax.nn.sigmoid(cls_pred)
    neg = -jnp.log(1 - p + eps) * (1 - alpha) * jnp.power(p, gamma)
    pos = -jnp.log(p + eps) * alpha * jnp.power(1 - p, gamma)
    return (pos - neg)[:, gt_labels] * weight


def classification_cost(cls_pred: jax.Array, gt_labels: jax.Array,
                        weight: float = 1.0) -> jax.Array:
    """mmdet `ClassificationCost`: -softmax score of the GT class."""
    score = jax.nn.softmax(cls_pred, axis=-1)
    return -score[:, gt_labels] * weight


def hungarian_assign_3d(
    bbox_pred: np.ndarray,       # (Q, C>=8) predicted codes
    cls_pred: np.ndarray,        # (Q, num_cls) logits
    gt_bboxes: np.ndarray,       # (G, 7 or 9) boxes
    gt_labels: np.ndarray,       # (G,)
    cls_weight: float = 2.0,
    reg_weight: float = 0.25,
) -> Tuple[np.ndarray, np.ndarray]:
    """One-to-one matching (`hungarian_assigner_3d.py:53-135`).

    Returns (assigned_gt_inds (Q,), assigned_labels (Q,)):
    0 = background, g+1 = matched to GT g; labels -1 where unmatched —
    the reference's AssignResult convention."""
    from scipy.optimize import linear_sum_assignment

    Q = bbox_pred.shape[0]
    G = gt_bboxes.shape[0]
    assigned = np.zeros((Q,), np.int64)
    labels = np.full((Q,), -1, np.int64)
    if G == 0 or Q == 0:
        return assigned, labels
    gt_codes = np.asarray(normalize_bbox(jnp.asarray(gt_bboxes)))
    cost = (np.asarray(focal_loss_cost(jnp.asarray(cls_pred),
                                       jnp.asarray(gt_labels),
                                       weight=cls_weight))
            + np.asarray(bbox3d_l1_cost(jnp.asarray(bbox_pred[:, :8]),
                                        jnp.asarray(gt_codes[:, :8]),
                                        weight=reg_weight)))
    rows, cols = linear_sum_assignment(cost)
    assigned[rows] = cols + 1
    labels[rows] = np.asarray(gt_labels)[cols]
    return assigned, labels


def decode_layer_boxes(
    codes: jax.Array,            # (..., Q, code_size>=8) reg-branch output
    lvl: int,
    init_reference: jax.Array,   # (..., Q, 3) sigmoid-space
    inter_references: jax.Array,  # (L, ..., Q, 3) POST-refinement per layer
    pc_range: Sequence[float],
) -> jax.Array:
    """Decode decoder-layer `lvl`'s box code against the reference that layer
    SAW — the upstream BEVFormer detection-head convention for consuming the
    `(inter_states, init_reference, inter_references)` tuple that
    `PerceptionTransformer` returns (`modules/transformer.py:289`).

    `DetectionTransformerDecoder.inter_references[lvl]` holds the
    POST-refinement reference of layer `lvl` (matching the reference
    decoder), so the correct pairing is `init_reference` for lvl 0 and
    `inter_references[lvl - 1]` otherwise; pairing with
    `inter_references[lvl]` double-refines the centres
    (regression-tested in `tests/test_decoder.py`).

    Returns codes with (cx, cy, cz) replaced by sigmoid-refined centres in
    metres over `pc_range` — the layout `denormalize_bbox` /
    `nms_free_decode` consume.
    """
    from occnet_tpu.models.decoder import inverse_sigmoid

    ref = init_reference if lvl == 0 else inter_references[lvl - 1]
    ref = inverse_sigmoid(ref.astype(jnp.float32))
    codes = codes.astype(jnp.float32)
    xy = jax.nn.sigmoid(codes[..., 0:2] + ref[..., 0:2])
    z = jax.nn.sigmoid(codes[..., 4:5] + ref[..., 2:3])
    pc = np.asarray(pc_range, np.float32)
    cx = xy[..., 0:1] * (pc[3] - pc[0]) + pc[0]
    cy = xy[..., 1:2] * (pc[4] - pc[1]) + pc[1]
    cz = z * (pc[5] - pc[2]) + pc[2]
    return jnp.concatenate([cx, cy, codes[..., 2:4], cz, codes[..., 5:]],
                           axis=-1)


@functools.partial(jax.jit, static_argnames=("max_num", "num_classes"))
def _decode_topk(cls_scores, bbox_preds, max_num: int, num_classes: int):
    scores = jax.nn.sigmoid(cls_scores).reshape(-1)
    top_scores, idx = jax.lax.top_k(scores, max_num)
    labels = idx % num_classes
    box_idx = idx // num_classes
    boxes = denormalize_bbox(bbox_preds[box_idx])
    return boxes, top_scores, labels


def nms_free_decode(
    cls_scores: jax.Array,       # (Q, num_cls) logits
    bbox_preds: jax.Array,       # (Q, 10) codes
    post_center_range: Sequence[float],   # (6,) xyz min/max
    max_num: int = 100,
    score_threshold: Optional[float] = None,
    num_classes: Optional[int] = None,
):
    """`NMSFreeCoder.decode_single` (`nms_free_coder.py:41-103`) with static
    shapes: returns dict of (max_num, 9) boxes, (max_num,) scores/labels and
    a boolean `valid` mask (the reference filters dynamically; apply the
    mask on host for the same result)."""
    num_classes = num_classes or cls_scores.shape[-1]
    boxes, scores, labels = _decode_topk(cls_scores, bbox_preds,
                                         max_num, num_classes)
    pcr = np.asarray(post_center_range, np.float32)
    mask = (jnp.all(boxes[:, :3] >= pcr[:3], axis=1)
            & jnp.all(boxes[:, :3] <= pcr[3:], axis=1))
    if score_threshold is not None:
        # the reference decays the threshold x0.9 until something survives
        # (`nms_free_coder.py:69-77`); replicate with a host loop over the
        # fetched scores since it's a tiny (max_num,) vector
        s = np.asarray(scores)
        thresh = float(score_threshold)
        keep = s > thresh
        while not keep.any():
            thresh *= 0.9
            if thresh < 0.01:
                keep = s > -1.0
                break
            keep = s >= thresh
        mask = mask & jnp.asarray(keep)
    return {"bboxes": boxes, "scores": scores, "labels": labels,
            "valid": mask}
