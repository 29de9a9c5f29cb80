"""PerceptionTransformer (detection object-query path) capability tests —
the TPU equivalent of the reference `modules/transformer.py:26-289`."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from occnet_tpu.config import tiny_occ
from occnet_tpu.models.perception import PerceptionTransformer


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_occ()
    model_cfg = dataclasses.replace(
        cfg.model, img_h=32, img_w=48, bev_h=8, bev_w=8, pillar_h=2,
        embed_dims=32, num_cams=2, num_feature_levels=2,
        compute_dtype="float32",
        encoder=dataclasses.replace(
            cfg.model.encoder, mode="gather", num_layers=1, ffn_dim=64,
            num_points_in_pillar=2,
            sca=dataclasses.replace(cfg.model.encoder.sca, num_levels=2)))
    model = PerceptionTransformer(model_cfg, num_query=12, decoder_layers=2)
    rng = np.random.RandomState(0)
    b = 1
    mlvl_feats = [
        jnp.asarray(rng.randn(b, 2, 8, 12, 32), jnp.float32),
        jnp.asarray(rng.randn(b, 2, 4, 6, 32), jnp.float32),
    ]
    ego2img = np.tile(np.eye(4, dtype=np.float32), (b, 2, 1, 1))
    for ci in range(2):
        a = np.pi * ci
        R = np.array([[np.cos(a), -np.sin(a), 0], [0, 0, -1],
                      [np.sin(a), np.cos(a), 0.0]])
        K = np.array([[30.0, 0, 24], [0, 30, 16], [0, 0, 1]])
        ego2img[0, ci, :3, :3] = K @ R
    ego2img = jnp.asarray(ego2img)
    # init with the full temporal argument set so the can-bus MLP params
    # exist for both call shapes (flax creates params lazily on first use)
    variables = model.init(
        {"params": jax.random.PRNGKey(0)}, mlvl_feats, ego2img,
        can_bus=jnp.zeros((b, 18), jnp.float32),
        prev_bev=jnp.zeros((b, 64, 32), jnp.float32))
    return model_cfg, model, variables, mlvl_feats, ego2img


def test_forward_shapes_and_ranges(setup):
    cfg, model, variables, mlvl_feats, ego2img = setup
    bev, states, init_ref, refs = model.apply(variables, mlvl_feats, ego2img)
    Q = cfg.bev_h * cfg.bev_w
    assert bev.shape == (1, Q, cfg.embed_dims)
    assert states.shape == (2, 1, 12, cfg.embed_dims)
    assert init_ref.shape == (1, 12, 3)
    assert refs.shape == (2, 1, 12, 3)
    for x in (bev, states, init_ref, refs):
        assert np.isfinite(np.asarray(x)).all()
    r = np.asarray(refs)
    assert (r >= 0).all() and (r <= 1).all()
    # reg-branch refinement actually moves the reference points
    assert not np.allclose(np.asarray(refs[0]), np.asarray(refs[1]))


def test_can_bus_and_prev_bev_path(setup):
    cfg, model, variables, mlvl_feats, ego2img = setup
    Q = cfg.bev_h * cfg.bev_w
    rng = np.random.RandomState(1)
    prev_bev = jnp.asarray(rng.randn(1, Q, cfg.embed_dims), jnp.float32)
    can_bus = np.zeros((1, 18), np.float32)
    can_bus[0, 0], can_bus[0, 1] = 1.5, -0.5      # ego translation (m)
    can_bus[0, -2] = 0.3                           # ego yaw (rad)
    can_bus[0, -1] = 10.0                          # patch rotation (deg)
    bev, states, init_ref, refs = model.apply(
        variables, mlvl_feats, ego2img, can_bus=jnp.asarray(can_bus),
        prev_bev=prev_bev)
    assert np.isfinite(np.asarray(bev)).all()
    assert np.isfinite(np.asarray(states)).all()
    # can-bus embedding + shift changes the BEV features vs the plain path
    bev0, *_ = model.apply(variables, mlvl_feats, ego2img)
    assert not np.allclose(np.asarray(bev), np.asarray(bev0), atol=1e-5)


def test_detection_pipeline_decode(setup):
    """inter_states -> (cls, reg) -> NMS-free decode: the full detection
    path end to end (perception transformer + bbox stack)."""
    from occnet_tpu.models.bbox import nms_free_decode

    cfg, model, variables, mlvl_feats, ego2img = setup
    _, states, init_ref, refs = model.apply(variables, mlvl_feats, ego2img)
    rng = np.random.RandomState(2)
    # stand-in cls/reg head outputs on the final decoder state
    cls = jnp.asarray(rng.randn(12, 10), jnp.float32)
    codes = jnp.asarray(rng.randn(12, 10), jnp.float32)
    out = nms_free_decode(cls, codes, post_center_range=list(cfg.pc_range),
                          max_num=5, num_classes=10)
    assert out["bboxes"].shape[0] == 5
    assert np.isfinite(np.asarray(out["bboxes"])).all()
