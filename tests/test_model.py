"""End-to-end smoke tests of the tiny model: init, forward shapes, loss
finiteness, temporal (prev_bev) path, only_bev path."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from occnet_tpu.config import tiny_occ
from occnet_tpu.models.detector import OccNet
from occnet_tpu.models.head import get_occ, occ_flow_loss


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_occ()
    # shrink further for CPU test speed
    import dataclasses
    model_cfg = dataclasses.replace(
        cfg.model, img_h=64, img_w=96, bev_h=10, bev_w=10, pillar_h=4,
        embed_dims=32, out_dim=8, compute_dtype="float32",
        encoder=dataclasses.replace(
            cfg.model.encoder, num_layers=1, ffn_dim=64,
            num_points_in_pillar=4),
    )
    model = OccNet(model_cfg)
    b, cams = 1, 6
    rng = np.random.RandomState(0)
    img = rng.randn(b, cams, 64, 96, 3).astype(np.float32)
    # cameras looking outward with simple intrinsics
    ego2img = np.zeros((b, cams, 4, 4), np.float32)
    for ci in range(cams):
        a = 2 * np.pi * ci / cams
        R = np.array([[np.cos(a), -np.sin(a), 0],
                      [0, 0, -1],
                      [np.sin(a), np.cos(a), 0.0]])
        K = np.array([[60.0, 0, 48], [0, 60, 32], [0, 0, 1]])
        m = np.eye(4, dtype=np.float32)
        m[:3, :3] = K @ R
        ego2img[0, ci] = m
    params = model.init(
        {"params": jax.random.PRNGKey(0)},
        jnp.asarray(img), jnp.asarray(ego2img))
    return model_cfg, model, params, jnp.asarray(img), jnp.asarray(ego2img)


def test_forward_shapes(setup):
    cfg, model, params, img, ego2img = setup
    outs = model.apply(params, img, ego2img)
    assert outs["occ"].shape == (1, cfg.bev_w, cfg.bev_h, cfg.pillar_h, 17)
    assert outs["flow"].shape == (1, cfg.bev_w, cfg.bev_h, cfg.pillar_h, 2)
    assert outs["bev_embed"].shape == (1, cfg.bev_h * cfg.bev_w,
                                       cfg.embed_dims)
    assert np.isfinite(np.asarray(outs["occ"])).all()

    occ_cls, flow = get_occ(outs)
    assert occ_cls.shape == (1, cfg.bev_w, cfg.bev_h, cfg.pillar_h)
    assert int(occ_cls.max()) <= 16


def test_loss_finite(setup):
    cfg, model, params, img, ego2img = setup
    from occnet_tpu.config import LossConfig
    outs = model.apply(params, img, ego2img)
    sem = jnp.zeros((1, cfg.bev_w, cfg.bev_h, cfg.pillar_h), jnp.int32) + 16
    flow = jnp.zeros((1, cfg.bev_w, cfg.bev_h, cfg.pillar_h, 2))
    l_occ, l_flow = occ_flow_loss(outs["occ"], outs["flow"], sem, flow,
                                  LossConfig())
    assert np.isfinite(float(l_occ)) and np.isfinite(float(l_flow))
    # fresh-init CE should be near log(17)
    assert abs(float(l_occ) - np.log(17)) < 1.0


def test_class_weighted_ce():
    """`LossConfig.class_weights` matches torch F.cross_entropy(weight=...)
    semantics: sum(w[y]*ce) / sum(w[y]); () stays the plain mean."""
    import torch
    import torch.nn.functional as F
    from occnet_tpu.config import LossConfig
    rng = np.random.RandomState(0)
    n_cls, n = 5, 64
    logits = rng.randn(1, 4, 4, 4, n_cls).astype(np.float32)
    labels = rng.randint(0, n_cls, (1, 4, 4, 4)).astype(np.int32)
    flow = np.zeros((1, 4, 4, 4, 2), np.float32)
    w = (0.1, 1.0, 5.0, 2.0, 0.5)
    got, _ = occ_flow_loss(jnp.asarray(logits), jnp.asarray(flow),
                           jnp.asarray(labels), jnp.asarray(flow),
                           LossConfig(class_weights=w))
    want = F.cross_entropy(torch.from_numpy(logits.reshape(n, n_cls)),
                           torch.from_numpy(labels.reshape(n)).long(),
                           weight=torch.tensor(w))
    np.testing.assert_allclose(float(got), float(want), rtol=1e-5)
    plain, _ = occ_flow_loss(jnp.asarray(logits), jnp.asarray(flow),
                             jnp.asarray(labels), jnp.asarray(flow),
                             LossConfig())
    want_plain = F.cross_entropy(
        torch.from_numpy(logits.reshape(n, n_cls)),
        torch.from_numpy(labels.reshape(n)).long())
    np.testing.assert_allclose(float(plain), float(want_plain), rtol=1e-5)


def test_only_bev_and_temporal(setup):
    cfg, model, params, img, ego2img = setup
    prev = model.apply(params, img, ego2img, only_bev=True)
    assert prev.shape == (1, cfg.bev_h * cfg.bev_w, cfg.embed_dims)
    outs = model.apply(params, img, ego2img, prev_bev=prev)
    assert np.isfinite(np.asarray(outs["occ"])).all()
    # temporal path must differ from the single-frame path
    outs_single = model.apply(params, img, ego2img)
    assert not np.allclose(np.asarray(outs["occ"]),
                           np.asarray(outs_single["occ"]))


def test_train_mode_runs(setup):
    cfg, model, params, img, ego2img = setup
    outs, mutated = model.apply(
        params, img, ego2img, train=True,
        rngs={"grid_mask": jax.random.PRNGKey(1),
              "dropout": jax.random.PRNGKey(2)},
        mutable=["batch_stats"])
    assert np.isfinite(np.asarray(outs["occ"])).all()
    assert "batch_stats" in mutated


def test_flow_fg_weight_semantics():
    """`LossConfig.flow_fg_weight`: weighted-mean flow L1 with weight w on
    voxels whose GT label is a flow class (< 8); 1.0 = plain element mean
    (the reference's `bevformer_occ_head.py:193` semantics)."""
    import dataclasses
    from occnet_tpu.config import LossConfig
    rng = np.random.RandomState(1)
    logits = jnp.asarray(rng.randn(1, 4, 4, 2, 17).astype(np.float32))
    labels = jnp.asarray(rng.randint(0, 17, (1, 4, 4, 2)).astype(np.int32))
    pred = jnp.asarray(rng.randn(1, 4, 4, 2, 2).astype(np.float32))
    gt = jnp.asarray(rng.randn(1, 4, 4, 2, 2).astype(np.float32))
    base = LossConfig()
    _, lf1 = occ_flow_loss(logits, pred, labels, gt, base)
    np.testing.assert_allclose(
        float(lf1), 0.25 * float(jnp.abs(pred - gt).mean()), rtol=1e-6)
    _, lf2 = occ_flow_loss(logits, pred, labels, gt,
                           dataclasses.replace(base, flow_fg_weight=50.0))
    lab = np.asarray(labels).reshape(-1)
    l1 = np.abs(np.asarray(pred - gt)).reshape(-1, 2)
    fw = np.where(lab < 8, 50.0, 1.0)
    want = 0.25 * (l1 * fw[:, None]).sum() / (fw.sum() * 2)
    np.testing.assert_allclose(float(lf2), want, rtol=1e-5)
