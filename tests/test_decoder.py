"""Detection-decoder capability tests + new-utility tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from occnet_tpu.models.decoder import (
    CustomMSDeformableAttention,
    DetectionTransformerDecoder,
    inverse_sigmoid,
)


def test_inverse_sigmoid_roundtrip():
    x = jnp.asarray([0.1, 0.5, 0.9])
    np.testing.assert_allclose(
        np.asarray(jax.nn.sigmoid(inverse_sigmoid(x))), np.asarray(x),
        atol=1e-5)


def test_detection_decoder_shapes_and_refinement():
    rng = np.random.RandomState(0)
    B, Nq, C = 1, 20, 64
    bev_h, bev_w = 10, 10
    query = jnp.asarray(rng.randn(B, Nq, C), jnp.float32)
    qpos = jnp.asarray(rng.randn(B, Nq, C), jnp.float32)
    bev = jnp.asarray(rng.randn(B, bev_h * bev_w, C), jnp.float32)
    ref = jnp.asarray(rng.uniform(0.2, 0.8, (B, Nq, 2)), jnp.float32)

    dec = DetectionTransformerDecoder(num_layers=2, embed_dims=C,
                                      num_heads=4, ffn_dim=128)
    params = dec.init(jax.random.PRNGKey(0), query, bev, qpos, ref,
                      [(bev_h, bev_w)])
    states, refs = dec.apply(params, query, bev, qpos, ref,
                             [(bev_h, bev_w)])
    assert states.shape == (2, B, Nq, C)
    assert refs.shape == (2, B, Nq, 2)
    assert np.isfinite(np.asarray(states)).all()
    assert (np.asarray(refs) >= 0).all() and (np.asarray(refs) <= 1).all()


def test_custom_msda_box_reference():
    rng = np.random.RandomState(0)
    B, Nq, C = 1, 8, 32
    m = CustomMSDeformableAttention(embed_dims=C, num_heads=4)
    q = jnp.asarray(rng.randn(B, Nq, C), jnp.float32)
    v = jnp.asarray(rng.randn(B, 36, C), jnp.float32)
    ref4 = jnp.asarray(rng.uniform(0.3, 0.7, (B, Nq, 4)), jnp.float32)
    params = m.init(jax.random.PRNGKey(0), q, v, None, ref4, [(6, 6)])
    out = m.apply(params, q, v, None, ref4, [(6, 6)])
    assert out.shape == (B, Nq, C)
    assert np.isfinite(np.asarray(out)).all()


def test_grad_checker_finds_dead_params():
    from occnet_tpu.training.train import grad_checker
    grads = {"a": {"w": jnp.zeros((3, 3))}, "b": {"w": jnp.ones((2,))}}
    dead = grad_checker(grads)
    assert dead == ["a/w"]


def test_random_scale_image():
    from occnet_tpu.data.pipeline import random_scale_image
    rng = np.random.RandomState(0)
    imgs = rng.rand(2, 20, 30, 3).astype(np.float32)
    l2i = np.tile(np.eye(4, dtype=np.float32), (2, 1, 1))
    out, new_l2i = random_scale_image(imgs, l2i, np.random.RandomState(3),
                                      scales=(1.1,))
    assert out.shape == (2, 22, 33, 3)
    np.testing.assert_allclose(new_l2i[0, 0, 0], 1.1, atol=1e-6)
    np.testing.assert_allclose(new_l2i[0, 2, 2], 1.0, atol=1e-6)
    # identity scale returns inputs unchanged
    out1, l2i1 = random_scale_image(imgs, l2i, np.random.RandomState(0),
                                    scales=(1.0,))
    np.testing.assert_array_equal(out1, imgs)


def test_rel_position_embedding():
    from occnet_tpu.models.positional import RelPositionEmbedding
    m = RelPositionEmbedding(num_pos_feats=16, out_dim=32)
    params = m.init(jax.random.PRNGKey(0), 5, 7)
    out = m.apply(params, 5, 7)
    assert out.shape == (35, 32)
    assert np.isfinite(np.asarray(out)).all()
