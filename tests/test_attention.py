"""SCA top-K compaction equivalence: with K >= max visible count the compact
path must match the dense path exactly."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from occnet_tpu.config import SCAConfig
from occnet_tpu.models.attention import SpatialCrossAttention


def _setup(K):
    cfg = SCAConfig(num_levels=2, num_points=8, max_queries_per_cam=K)
    return SpatialCrossAttention(cfg, embed_dims=64, num_cams=3,
                                 dtype=jnp.float32)


def test_topk_matches_dense():
    rng = np.random.RandomState(0)
    B, Q, C, n_cam, Z = 2, 40, 64, 3, 8
    shapes = [(6, 8), (3, 4)]
    V = sum(h * w for h, w in shapes)
    query = rng.randn(B, Q, C).astype(np.float32)
    value = rng.randn(B, n_cam, V, C).astype(np.float32)
    ref = rng.uniform(0, 1, (n_cam, B, Q, Z, 2)).astype(np.float32)
    # ~1/3 of queries visible per camera
    mask = rng.rand(n_cam, B, Q, Z) < 0.2
    max_visible = int((mask.any(-1)).sum(-1).max())

    dense = _setup(0)
    params = dense.init({"params": jax.random.PRNGKey(0)},
                        jnp.asarray(query), jnp.asarray(value), None,
                        jnp.asarray(ref), jnp.asarray(mask), shapes)
    # give the projections non-trivial weights
    params = jax.tree_util.tree_map(
        lambda x: x + 0.01 * np.random.RandomState(1).randn(*x.shape).astype(
            x.dtype) if x.ndim >= 1 else x, params)

    out_dense = dense.apply(params, jnp.asarray(query), jnp.asarray(value),
                            None, jnp.asarray(ref), jnp.asarray(mask), shapes)

    compact = _setup(max(max_visible, 1))
    out_topk = compact.apply(params, jnp.asarray(query), jnp.asarray(value),
                             None, jnp.asarray(ref), jnp.asarray(mask),
                             shapes)
    np.testing.assert_allclose(np.asarray(out_dense), np.asarray(out_topk),
                               atol=2e-5, rtol=1e-5)


def test_per_camera_topk_matches_dense():
    """Ragged per-camera K_c (distinct Ks -> grouped MSDA calls) must match
    the dense path exactly when each K_c covers its camera's visible set,
    and must certify (overflow == 0)."""
    rng = np.random.RandomState(2)
    B, Q, C, n_cam, Z = 2, 48, 64, 3, 8
    shapes = [(6, 8), (3, 4)]
    V = sum(h * w for h, w in shapes)
    query = rng.randn(B, Q, C).astype(np.float32)
    value = rng.randn(B, n_cam, V, C).astype(np.float32)
    ref = rng.uniform(0, 1, (n_cam, B, Q, Z, 2)).astype(np.float32)
    # asymmetric visibility: camera 0 sees much less than cameras 1-2
    mask = rng.rand(n_cam, B, Q, Z) < np.array([0.05, 0.2, 0.3])[:, None,
                                                                 None, None]
    per_cam_vis = (mask.any(-1)).sum(-1).max(-1)       # (n_cam,)

    dense = _setup(0)
    params = dense.init({"params": jax.random.PRNGKey(0)},
                        jnp.asarray(query), jnp.asarray(value), None,
                        jnp.asarray(ref), jnp.asarray(mask), shapes)
    params = jax.tree_util.tree_map(
        lambda x: x + 0.01 * np.random.RandomState(1).randn(*x.shape).astype(
            x.dtype) if x.ndim >= 1 else x, params)
    out_dense = dense.apply(params, jnp.asarray(query), jnp.asarray(value),
                            None, jnp.asarray(ref), jnp.asarray(mask),
                            shapes)

    ks = tuple(int(v) + 2 for v in per_cam_vis)        # ragged, adequate
    assert len(set(ks)) > 1                            # really exercises groups
    cfg = SCAConfig(num_levels=2, num_points=8, per_cam_topk=ks)
    ragged = SpatialCrossAttention(cfg, embed_dims=64, num_cams=3,
                                   dtype=jnp.float32)
    out_ragged, aux = ragged.apply(
        params, jnp.asarray(query), jnp.asarray(value), None,
        jnp.asarray(ref), jnp.asarray(mask), shapes,
        mutable=["intermediates"])
    np.testing.assert_allclose(np.asarray(out_dense), np.asarray(out_ragged),
                               atol=2e-5, rtol=1e-5)
    ov = jax.tree_util.tree_leaves(aux["intermediates"])
    assert sum(int(np.asarray(x).sum()) for x in ov) == 0

    # inadequate K on ONE camera must report a nonzero overflow certificate
    ks_bad = (1,) + ks[1:]
    cfg_bad = SCAConfig(num_levels=2, num_points=8, per_cam_topk=ks_bad)
    bad = SpatialCrossAttention(cfg_bad, embed_dims=64, num_cams=3,
                                dtype=jnp.float32)
    _, aux = bad.apply(params, jnp.asarray(query), jnp.asarray(value), None,
                       jnp.asarray(ref), jnp.asarray(mask), shapes,
                       mutable=["intermediates"])
    ov = jax.tree_util.tree_leaves(aux["intermediates"])
    assert sum(int(np.asarray(x).sum()) for x in ov) > 0


def test_topk_smaller_k_still_finite():
    rng = np.random.RandomState(0)
    B, Q, C, n_cam, Z = 1, 40, 64, 3, 8
    shapes = [(6, 8), (3, 4)]
    V = sum(h * w for h, w in shapes)
    query = rng.randn(B, Q, C).astype(np.float32)
    value = rng.randn(B, n_cam, V, C).astype(np.float32)
    ref = rng.uniform(0, 1, (n_cam, B, Q, Z, 2)).astype(np.float32)
    mask = rng.rand(n_cam, B, Q, Z) < 0.3
    m = _setup(5)   # deliberately too small -> approximation, but finite
    params = m.init({"params": jax.random.PRNGKey(0)}, jnp.asarray(query),
                    jnp.asarray(value), None, jnp.asarray(ref),
                    jnp.asarray(mask), shapes)
    out = m.apply(params, jnp.asarray(query), jnp.asarray(value), None,
                  jnp.asarray(ref), jnp.asarray(mask), shapes)
    assert np.isfinite(np.asarray(out)).all()
