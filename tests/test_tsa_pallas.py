"""Oracle tests for the fused TSA tap-attention kernel (ops/tsa_pallas.py):
the Pallas forward (interpret mode off-TPU) and its custom VJP must match the
XLA shift-loop formulation and its jax.grad exactly (same math, fp32 accum).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from occnet_tpu.ops.tsa_pallas import (
    TSA_TAPS,
    tap_attention_pallas,
    tap_attention_xla,
)


def _case(B=1, nq=2, H=16, W=16, heads=4, D=8, seed=0, dtype=jnp.float32):
    rng = np.random.RandomState(seed)
    C = heads * D
    vgrid = jnp.asarray(rng.randn(B, nq, H, W, C), dtype)
    logits = rng.randn(B, H, W, nq, len(TSA_TAPS), heads)
    attn = jax.nn.softmax(jnp.asarray(logits, jnp.float32), axis=4)
    return vgrid, attn.astype(dtype)


def test_forward_matches_xla():
    vgrid, attn = _case()
    ref = tap_attention_xla(vgrid, attn)
    got = tap_attention_pallas(vgrid, attn)
    assert got.shape == ref.shape == vgrid.shape[:1] + vgrid.shape[2:]
    # kernel casts v/attn to bf16 like the module's compute dtype
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-2, atol=2e-2)


def test_forward_bf16_inputs_exact():
    vgrid, attn = _case(dtype=jnp.bfloat16)
    ref = tap_attention_xla(vgrid, attn)
    got = tap_attention_pallas(vgrid, attn)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_forward_nonsquare_and_rb_edge():
    # H=6 exercises the RB == H (single row-block) path; W != H the packing
    vgrid, attn = _case(H=6, W=10, heads=2, D=4)
    ref = tap_attention_xla(vgrid, attn)
    got = tap_attention_pallas(vgrid, attn)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-2, atol=2e-2)


def test_batch2():
    vgrid, attn = _case(B=2, H=8, W=8)
    ref = tap_attention_xla(vgrid, attn)
    got = tap_attention_pallas(vgrid, attn)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-2, atol=2e-2)


def test_custom_vjp_matches_xla_grad():
    vgrid, attn = _case(H=8, W=8, heads=2, D=4, dtype=jnp.float32)

    def loss_ref(v, a):
        out = tap_attention_xla(v, a)
        return jnp.sum(out * jnp.cos(jnp.arange(out.size).reshape(out.shape)))

    def loss_pl(v, a):
        out = tap_attention_pallas(v, a)
        return jnp.sum(out * jnp.cos(jnp.arange(out.size).reshape(out.shape)))

    gv_ref, ga_ref = jax.grad(loss_ref, argnums=(0, 1))(vgrid, attn)
    gv_pl, ga_pl = jax.grad(loss_pl, argnums=(0, 1))(vgrid, attn)
    np.testing.assert_allclose(np.asarray(gv_pl), np.asarray(gv_ref),
                               rtol=2e-2, atol=2e-2)
    np.testing.assert_allclose(np.asarray(ga_pl), np.asarray(ga_ref),
                               rtol=2e-2, atol=2e-2)


def test_module_unchanged_by_refactor():
    """DenseTemporalSelfAttention (now routed through tap_attention) must
    reproduce the original 9-iteration shift/einsum loop bit-for-bit in
    float32 on CPU (both paths resolve to the XLA formulation there)."""
    from occnet_tpu.config import TSAConfig
    from occnet_tpu.models.dense_attention import DenseTemporalSelfAttention

    cfg = TSAConfig(num_heads=4)
    bh = bw = 10
    B, C = 1, 32
    Q = bh * bw
    rng = np.random.RandomState(1)
    query = jnp.asarray(rng.randn(B, Q, C), jnp.float32)
    prev = jnp.asarray(rng.randn(B, 2, Q, C), jnp.float32)
    qpos = jnp.asarray(rng.randn(B, Q, C), jnp.float32)
    mod = DenseTemporalSelfAttention(cfg, embed_dims=C, bev_hw=(bh, bw),
                                     dtype=jnp.float32)
    v = mod.init(jax.random.PRNGKey(0), query, prev, qpos)
    out = mod.apply(v, query, prev, qpos)
    assert out.shape == (B, Q, C)
    assert np.isfinite(np.asarray(out)).all()

    # hand-rolled original loop with the same params
    from occnet_tpu.ops.tsa_pallas import _shift2d
    params = v["params"]
    x = query + qpos
    value = prev
    query_aug = jnp.concatenate([value[:, 0], x], axis=-1)
    vproj = value @ params["value_proj"]["kernel"] + \
        params["value_proj"]["bias"]
    attn = query_aug @ params["attention_weights"]["kernel"] + \
        params["attention_weights"]["bias"]
    T = len(TSA_TAPS)
    attn = attn.reshape(B, Q, 4, 2, T)
    attn = jax.nn.softmax(attn, axis=-1)
    vgrid = vproj.reshape(B, 2, bh, bw, C)
    acc = jnp.zeros((B, Q, 4, C // 4), jnp.float32)
    for t, (dy, dx) in enumerate(TSA_TAPS):
        shifted = _shift2d(vgrid, dy, dx).reshape(B, 2, Q, 4, C // 4)
        acc = acc + jnp.einsum("bnqhd,bqhn->bqhd", shifted,
                               attn[:, :, :, :, t],
                               preferred_element_type=jnp.float32)
    expected = (acc / 2).reshape(B, Q, C)
    expected = expected @ params["output_proj"]["kernel"] + \
        params["output_proj"]["bias"] + query
    np.testing.assert_allclose(np.asarray(out), np.asarray(expected),
                               rtol=1e-5, atol=1e-5)


if __name__ == "__main__":
    pytest.main([__file__, "-v"])
