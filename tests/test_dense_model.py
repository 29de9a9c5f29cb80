"""Dense (turbo) path tests: shift taps, dense attention shapes, end-to-end
tiny turbo model forward/backward."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from occnet_tpu.config import tiny_turbo_occ
from occnet_tpu.models.dense_attention import _shift2d
from occnet_tpu.models.detector import OccNet


def test_shift2d_semantics():
    x = jnp.arange(12, dtype=jnp.float32).reshape(1, 3, 4, 1)
    # dy=1: out[y] = in[y-1]; row 0 becomes zero
    out = np.asarray(_shift2d(x, 1, 0))[0, :, :, 0]
    np.testing.assert_array_equal(out[0], 0.0)
    np.testing.assert_array_equal(out[1:], np.asarray(x)[0, :2, :, 0])
    # dx=-1: out[x] = in[x+1]; last col zero
    out = np.asarray(_shift2d(x, 0, -1))[0, :, :, 0]
    np.testing.assert_array_equal(out[:, -1], 0.0)
    np.testing.assert_array_equal(out[:, :-1], np.asarray(x)[0, :, 1:, 0])


@pytest.fixture(scope="module")
def turbo_setup():
    cfg = tiny_turbo_occ()
    model_cfg = dataclasses.replace(
        cfg.model, img_h=64, img_w=96, bev_h=10, bev_w=10, pillar_h=4,
        embed_dims=32, out_dim=8, compute_dtype="float32",
        encoder=dataclasses.replace(
            cfg.model.encoder, num_layers=1, ffn_dim=64,
            num_points_in_pillar=4),
    )
    model = OccNet(model_cfg)
    rng = np.random.RandomState(0)
    img = rng.randn(1, 6, 64, 96, 3).astype(np.float32)
    ego2img = np.zeros((1, 6, 4, 4), np.float32)
    base = np.array([[0.0, 0.0, 1.0], [-1.0, 0.0, 0.0], [0.0, -1.0, 0.0]])
    for ci in range(6):
        a = 2 * np.pi * ci / 6
        Rz = np.array([[np.cos(a), -np.sin(a), 0],
                       [np.sin(a), np.cos(a), 0], [0, 0, 1.0]])
        K = np.array([[60.0, 0, 48], [0, 60, 32], [0, 0, 1]])
        m = np.eye(4, dtype=np.float32)
        m[:3, :3] = K @ np.linalg.inv(Rz @ base)
        ego2img[0, ci] = m
    params = model.init({"params": jax.random.PRNGKey(0)},
                        jnp.asarray(img), jnp.asarray(ego2img))
    return model_cfg, model, params, jnp.asarray(img), jnp.asarray(ego2img)


def test_turbo_forward(turbo_setup):
    cfg, model, params, img, ego2img = turbo_setup
    outs = model.apply(params, img, ego2img)
    assert outs["occ"].shape == (1, cfg.bev_w, cfg.bev_h, cfg.pillar_h, 17)
    assert np.isfinite(np.asarray(outs["occ"])).all()
    # the dense mode must have created the shared value projection and no
    # per-layer deformable samplers
    t = params["params"]["head"]["transformer"]
    assert "shared_value_proj" in t
    layer = t["encoder"]["layer0"]
    assert "deformable_attention" not in layer["cross_attn"]


@pytest.mark.slow
def test_turbo_eval_impl_parity_b1_b2(turbo_setup):
    """Eval-mode turbo forward must be identical (to accumulation tolerance)
    across lift/tap kernel implementations AND batch sizes: the r4 synthetic
    A/B trained at B=2 (pallas on TPU) but evaluated at B=1, and the op-level
    parity tests alone never covered the full-model integration.  Each B=2
    row 0 must also match the corresponding B=1 forward (no batch mixing)."""
    cfg, model, params, img, ego2img = turbo_setup
    img2 = jnp.concatenate([img, img * 0.5 + 0.1], axis=0)
    e2i2 = jnp.concatenate([ego2img, ego2img], axis=0)

    outs = {}
    for lift in ("einsum", "pallas"):
        for tap in ("xla", "pallas"):
            c = dataclasses.replace(
                cfg, encoder=dataclasses.replace(
                    cfg.encoder, lift_impl=lift,
                    tsa=dataclasses.replace(cfg.encoder.tsa, tap_impl=tap)))
            m = OccNet(c)
            o1 = np.asarray(m.apply(params, img, ego2img)["occ"], np.float32)
            o2 = np.asarray(m.apply(params, img2, e2i2)["occ"], np.float32)
            outs[(lift, tap)] = (o1, o2)
            # batch consistency within one impl
            np.testing.assert_allclose(o2[:1], o1, rtol=0, atol=5e-2)
    ref1, ref2 = outs[("einsum", "xla")]
    for k, (o1, o2) in outs.items():
        np.testing.assert_allclose(o1, ref1, rtol=0, atol=5e-2, err_msg=str(k))
        np.testing.assert_allclose(o2, ref2, rtol=0, atol=5e-2, err_msg=str(k))


@pytest.mark.slow
def test_turbo_backward_and_temporal(turbo_setup):
    cfg, model, params, img, ego2img = turbo_setup

    def loss(p):
        outs = model.apply(p, img, ego2img)
        return jnp.sum(outs["occ"].astype(jnp.float32) ** 2)

    g = jax.grad(lambda p: loss(p))(params)
    gnorm = jax.tree_util.tree_reduce(
        lambda a, x: a + float(jnp.sum(jnp.abs(x))), g["params"], 0.0)
    assert np.isfinite(gnorm) and gnorm > 0

    prev = model.apply(params, img, ego2img, only_bev=True)
    outs_t = model.apply(params, img, ego2img, prev_bev=prev)
    outs_s = model.apply(params, img, ego2img)
    assert not np.allclose(np.asarray(outs_t["occ"]),
                           np.asarray(outs_s["occ"]))
