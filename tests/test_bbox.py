"""Detection bbox stack vs torch/numpy oracles (reference `core/bbox/`)."""

import numpy as np
import jax.numpy as jnp

from occnet_tpu.models.bbox import (
    bbox3d_l1_cost,
    classification_cost,
    denormalize_bbox,
    focal_loss_cost,
    hungarian_assign_3d,
    nms_free_decode,
    normalize_bbox,
)


def _torch_normalize(bboxes):
    """Oracle port of `core/bbox/util.py:4-24`."""
    import torch
    b = torch.as_tensor(bboxes)
    out = [b[..., 0:1], b[..., 1:2], b[..., 3:4].log(), b[..., 4:5].log(),
           b[..., 2:3], b[..., 5:6].log(), b[..., 6:7].sin(),
           b[..., 6:7].cos()]
    if b.shape[-1] > 7:
        out += [b[..., 7:8], b[..., 8:9]]
    return torch.cat(out, dim=-1).numpy()


def test_bbox_codec_roundtrip_and_oracle():
    rng = np.random.RandomState(0)
    boxes = np.concatenate([
        rng.randn(50, 3) * 20,                     # centers
        np.abs(rng.randn(50, 3)) + 0.5,            # sizes
        rng.uniform(-np.pi, np.pi, (50, 1)),       # yaw
        rng.randn(50, 2),                          # velocity
    ], axis=1).astype(np.float32)
    codes = np.asarray(normalize_bbox(jnp.asarray(boxes)))
    np.testing.assert_allclose(codes, _torch_normalize(boxes), atol=1e-5)
    back = np.asarray(denormalize_bbox(jnp.asarray(codes)))
    np.testing.assert_allclose(back, boxes, rtol=1e-4, atol=1e-4)
    # 7-DoF variant round-trips too
    codes7 = np.asarray(normalize_bbox(jnp.asarray(boxes[:, :7])))
    assert codes7.shape == (50, 8)
    np.testing.assert_allclose(codes7, _torch_normalize(boxes[:, :7]),
                               atol=1e-5)


def test_l1_cost_matches_torch_cdist():
    import torch
    rng = np.random.RandomState(1)
    a = rng.randn(30, 8).astype(np.float32)
    b = rng.randn(7, 8).astype(np.float32)
    ours = np.asarray(bbox3d_l1_cost(jnp.asarray(a), jnp.asarray(b),
                                     weight=0.25))
    ref = (torch.cdist(torch.as_tensor(a), torch.as_tensor(b), p=1)
           * 0.25).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


def test_focal_cost_matches_mmdet_formula():
    import torch
    rng = np.random.RandomState(2)
    logits = rng.randn(40, 10).astype(np.float32)
    labels = rng.randint(0, 10, (6,))
    ours = np.asarray(focal_loss_cost(jnp.asarray(logits),
                                      jnp.asarray(labels), weight=2.0))
    p = torch.as_tensor(logits).sigmoid()
    eps, alpha, gamma = 1e-12, 0.25, 2.0
    neg = -(1 - p + eps).log() * (1 - alpha) * p.pow(gamma)
    pos = -(p + eps).log() * alpha * (1 - p).pow(gamma)
    ref = ((pos - neg)[:, labels] * 2.0).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-6)
    # softmax classification cost sanity: picking the GT class column
    c = np.asarray(classification_cost(jnp.asarray(logits),
                                       jnp.asarray(labels)))
    sm = torch.as_tensor(logits).softmax(-1).numpy()
    np.testing.assert_allclose(c, -sm[:, labels], rtol=1e-5, atol=1e-6)


def test_hungarian_assignment_matches_scipy_and_conventions():
    from scipy.optimize import linear_sum_assignment
    rng = np.random.RandomState(3)
    Q, G = 25, 5
    bbox_pred = rng.randn(Q, 10).astype(np.float32)
    cls_pred = rng.randn(Q, 10).astype(np.float32)
    gt = np.concatenate([rng.randn(G, 3) * 10, np.abs(rng.randn(G, 3)) + 0.5,
                         rng.uniform(-3, 3, (G, 1)), rng.randn(G, 2)],
                        axis=1).astype(np.float32)
    gt_labels = rng.randint(0, 10, (G,))
    assigned, labels = hungarian_assign_3d(bbox_pred, cls_pred, gt, gt_labels)
    # matched rows reproduce scipy's optimum on the same cost matrix
    gt_codes = np.asarray(normalize_bbox(jnp.asarray(gt)))
    cost = (np.asarray(focal_loss_cost(jnp.asarray(cls_pred),
                                       jnp.asarray(gt_labels), weight=2.0))
            + np.asarray(bbox3d_l1_cost(jnp.asarray(bbox_pred[:, :8]),
                                        jnp.asarray(gt_codes[:, :8]),
                                        weight=0.25)))
    rows, cols = linear_sum_assignment(cost)
    assert (assigned > 0).sum() == G
    for r, c in zip(rows, cols):
        assert assigned[r] == c + 1
        assert labels[r] == gt_labels[c]
    assert (labels[assigned == 0] == -1).all()
    # degenerate: no GT -> all background
    a0, l0 = hungarian_assign_3d(bbox_pred, cls_pred,
                                 np.zeros((0, 9), np.float32),
                                 np.zeros((0,), np.int64))
    assert (a0 == 0).all() and (l0 == -1).all()


def test_nms_free_decode():
    rng = np.random.RandomState(4)
    Q, C = 200, 10
    logits = rng.randn(Q, C).astype(np.float32) * 2
    codes = rng.randn(Q, 10).astype(np.float32)
    out = nms_free_decode(jnp.asarray(logits), jnp.asarray(codes),
                          post_center_range=[-61.2, -61.2, -10,
                                             61.2, 61.2, 10],
                          max_num=50, score_threshold=None)
    boxes = np.asarray(out["bboxes"])
    scores = np.asarray(out["scores"])
    labels = np.asarray(out["labels"])
    assert boxes.shape == (50, 9) and scores.shape == (50,)
    # oracle: numpy top-k over flattened sigmoid scores
    flat = 1 / (1 + np.exp(-logits)).reshape(-1)
    order = np.argsort(-flat)[:50]
    np.testing.assert_allclose(scores, flat[order], rtol=1e-5)
    np.testing.assert_array_equal(labels, order % C)
    np.testing.assert_allclose(
        boxes, np.asarray(denormalize_bbox(jnp.asarray(codes[order // C]))),
        rtol=1e-5, atol=1e-5)
    # center-range mask + threshold decay both keep at least one box
    out2 = nms_free_decode(jnp.asarray(logits), jnp.asarray(codes),
                           post_center_range=[-100, -100, -100,
                                              100, 100, 100],
                           max_num=50, score_threshold=0.99999)
    assert np.asarray(out2["valid"]).any()
