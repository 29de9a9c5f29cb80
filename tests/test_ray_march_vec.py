"""Vectorised (sort-based, loop-free) fan DDA vs the fori_loop fan marcher:
identical hits/coords/distances over batched grids and origins."""

import numpy as np
import jax.numpy as jnp

from occnet_tpu.evaluation.ray_metrics import (
    fan_parameters,
    generate_lidar_rays,
)
from occnet_tpu.ops.ray_march_fast import dda_raymarch_fan
from occnet_tpu.ops.ray_march_vec import dda_raymarch_fan_vec


def _sub_fan(step=15):
    rays = generate_lidar_rays()
    K = rays.shape[0] // 360
    fan = rays.reshape(K, 360, 3)[:, ::step]
    return fan.reshape(-1, 3), fan.shape[1]


def test_vec_matches_fan_loop():
    rng = np.random.RandomState(0)
    X, Y, Z = 40, 40, 16
    G, T = 2, 3
    occs = (rng.rand(G, X, Y, Z) < 0.03).astype(np.float32)
    origins = np.array([[20.3, 19.7, 8.2],
                        [5.0, 35.0, 4.1],
                        [-3.0, 20.0, 7.7]], np.float32)
    rays, num_az = _sub_fan()
    az, dz, scale = fan_parameters(jnp.asarray(rays), num_az)

    dist_v, coord_v, hit_v = dda_raymarch_fan_vec(
        jnp.asarray(occs), jnp.asarray(origins), az, dz, scale,
        max_xy_steps=100)

    for g in range(G):
        for t in range(T):
            dist_f, coord_f, hit_f = dda_raymarch_fan(
                jnp.asarray(occs[g]), jnp.asarray(origins[t]), az, dz, scale,
                max_xy_steps=100)
            np.testing.assert_array_equal(np.asarray(hit_v[g, t]),
                                          np.asarray(hit_f),
                                          err_msg=f"g={g} t={t}")
            np.testing.assert_array_equal(np.asarray(coord_v[g, t]),
                                          np.asarray(coord_f),
                                          err_msg=f"g={g} t={t}")
            np.testing.assert_allclose(np.asarray(dist_v[g, t]),
                                       np.asarray(dist_f), atol=2e-3,
                                       err_msg=f"g={g} t={t}")


def test_vec_empty_grid_no_hits():
    occs = np.zeros((1, 20, 20, 8), np.float32)
    origins = np.array([[10.0, 10.0, 4.0]], np.float32)
    rays, num_az = _sub_fan(step=60)
    az, dz, scale = fan_parameters(jnp.asarray(rays), num_az)
    dist, coord, hit = dda_raymarch_fan_vec(
        jnp.asarray(occs), jnp.asarray(origins), az, dz, scale,
        max_xy_steps=60)
    assert not np.asarray(hit).any()
    assert np.isfinite(np.asarray(dist)).all()
    assert (np.asarray(dist) >= 0).all()


def test_render_pred_gt_matches_render_sample_fast():
    import jax
    from occnet_tpu.evaluation.ray_metrics import (
        RayMetricAccumulator, occ_score_from_metrics, render_pred_gt,
        render_sample_fast)
    rng = np.random.RandomState(1)
    sem_gt = np.full((200, 200, 16), 16, np.int32)
    blob = rng.rand(200, 200, 16) < 0.01
    sem_gt[blob] = rng.randint(0, 16, int(blob.sum()))
    sem_pred = sem_gt.copy()
    flip = rng.rand(200, 200, 16) < 0.002
    sem_pred[flip] = rng.randint(0, 17, int(flip.sum()))
    flow = rng.randn(200, 200, 16, 2).astype(np.float32)
    rays = jnp.asarray(generate_lidar_rays())
    origins = jnp.asarray(np.array([[0.5, 0.3, 1.8], [5.0, -3.0, 1.9]],
                                   np.float32))
    valid = jnp.asarray(np.array([True, True]))

    pred, gt = render_pred_gt(jnp.asarray(sem_pred), jnp.asarray(flow),
                              jnp.asarray(sem_gt), jnp.asarray(flow),
                              rays, origins, valid)
    want_p = render_sample_fast(jnp.asarray(sem_pred), jnp.asarray(flow),
                                rays, origins, valid)
    want_g = render_sample_fast(jnp.asarray(sem_gt), jnp.asarray(flow),
                                rays, origins, valid)
    for got, want in ((pred, want_p), (gt, want_g)):
        np.testing.assert_array_equal(np.asarray(got["label"]),
                                      np.asarray(want["label"]))
        np.testing.assert_allclose(np.asarray(got["dist"]),
                                   np.asarray(want["dist"]), atol=2e-3)
        np.testing.assert_array_equal(np.asarray(got["valid"]),
                                      np.asarray(want["valid"]))
    # GT against itself still scores a perfect OccScore through this path
    acc = RayMetricAccumulator()
    acc.update(gt, gt)
    assert occ_score_from_metrics(acc.finalize())["OccScore"] == 1.0
