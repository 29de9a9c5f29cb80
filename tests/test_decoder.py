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


def test_decode_layer_boxes_pairing_convention():
    """inter_references[lvl] is the POST-refinement reference of layer lvl,
    so decode_layer_boxes must pair layer lvl's code with init_reference /
    inter_references[lvl-1]; the decoded sigmoid-space centre then equals
    inter_references[lvl] exactly, while the (wrong) same-index pairing
    double-refines (ADVICE r2)."""
    from occnet_tpu.models.bbox import decode_layer_boxes
    from occnet_tpu.models.perception import RegBranch

    rng = np.random.RandomState(1)
    B, Nq, C, L = 1, 12, 64, 3
    pc_range = (-40.0, -40.0, -1.0, 40.0, 40.0, 5.4)
    query = jnp.asarray(rng.randn(B, Nq, C), jnp.float32)
    qpos = jnp.asarray(rng.randn(B, Nq, C), jnp.float32)
    bev = jnp.asarray(rng.randn(B, 100, C), jnp.float32)
    ref3 = jnp.asarray(rng.uniform(0.2, 0.8, (B, Nq, 3)), jnp.float32)

    dec = DetectionTransformerDecoder(num_layers=L, embed_dims=C,
                                      num_heads=4, ffn_dim=128)
    branches = [RegBranch(C, 10, name=f"rb{i}") for i in range(L)]
    # bind the branches standalone so the test can re-apply them per layer
    bparams = [b.init(jax.random.PRNGKey(10 + i), query)
               for i, b in enumerate(branches)]
    bound = [lambda x, b=b, p=p: b.apply(p, x)
             for b, p in zip(branches, bparams)]
    params = dec.init(jax.random.PRNGKey(0), query, bev, qpos, ref3,
                      [(10, 10)], reg_branches=bound)
    states, refs = dec.apply(params, query, bev, qpos, ref3, [(10, 10)],
                             reg_branches=bound)
    assert refs.shape == (L, B, Nq, 3)

    pc = np.asarray(pc_range, np.float32)
    for lvl in range(L):
        codes = bound[lvl](states[lvl])
        decoded = np.asarray(decode_layer_boxes(
            codes, lvl, ref3, refs, pc_range))
        # decoded centre in sigmoid space == the decoder's post-refinement ref
        want = np.asarray(refs[lvl])
        got_xy = (decoded[..., 0:2] - pc[0:2]) / (pc[3:5] - pc[0:2])
        got_z = (decoded[..., 4:5] - pc[2]) / (pc[5] - pc[2])
        np.testing.assert_allclose(got_xy, want[..., 0:2], atol=1e-5)
        np.testing.assert_allclose(got_z[..., 0], want[..., 2], atol=1e-5)
    # the wrong pairing (same-index post-refinement ref) double-refines
    codes0 = bound[0](states[0])
    wrong = np.asarray(decode_layer_boxes(codes0, 1, ref3,
                                          jnp.stack([refs[0]] * L), pc_range))
    right = np.asarray(decode_layer_boxes(codes0, 0, ref3, refs, pc_range))
    assert np.abs(wrong[..., :2] - right[..., :2]).max() > 1e-3


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
