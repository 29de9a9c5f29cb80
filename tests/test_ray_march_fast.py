"""Column-factored fan marcher vs the direct 3D DDA: identical hits/coords/
distances on random grids (up to rare boundary-tie disagreements)."""

import numpy as np
import jax.numpy as jnp

from occnet_tpu.evaluation.ray_metrics import (
    RayMetricAccumulator,
    fan_parameters,
    generate_lidar_rays,
    occ_score_from_metrics,
    render_sample,
    render_sample_fast,
)
from occnet_tpu.ops.ray_march import dda_raymarch
from occnet_tpu.ops.ray_march_fast import dda_raymarch_fan, pack_columns


def test_pack_columns():
    occ = np.zeros((3, 4, 5), np.float32)
    occ[1, 2, 0] = 1
    occ[1, 2, 4] = 1
    bits = np.asarray(pack_columns(jnp.asarray(occ)))
    assert bits[1, 2] == (1 << 0) + (1 << 4)
    assert bits[0, 0] == 0


def _sub_fan(step=15):
    rays = generate_lidar_rays()
    K = rays.shape[0] // 360
    fan = rays.reshape(K, 360, 3)[:, ::step]
    return fan.reshape(-1, 3), fan.shape[1]


def test_fan_matches_direct_dda():
    rng = np.random.RandomState(0)
    X, Y, Z = 40, 40, 16
    occ = (rng.rand(X, Y, Z) < 0.03).astype(np.float32)
    rays, num_az = _sub_fan()
    K = rays.shape[0] // num_az
    origin = np.array([20.3, 19.7, 8.2], np.float32)

    az, dz, scale = fan_parameters(jnp.asarray(rays), num_az)
    dist_f, coord_f, hit_f = dda_raymarch_fan(
        jnp.asarray(occ), jnp.asarray(origin), az, dz, scale,
        max_xy_steps=100)
    # fan output (A, K) -> pitch-major flat
    dist_f = np.asarray(dist_f).T.reshape(-1)
    coord_f = np.asarray(coord_f).swapaxes(0, 1).reshape(-1, 3)
    hit_f = np.asarray(hit_f).T.reshape(-1)

    origins = np.broadcast_to(origin, (rays.shape[0], 3))
    dist_d, coord_d, hit_d = dda_raymarch(
        jnp.asarray(occ), jnp.asarray(origins), jnp.asarray(rays),
        max_steps=120)
    dist_d, coord_d, hit_d = map(np.asarray, (dist_d, coord_d, hit_d))

    mismatch = (hit_f != hit_d)
    mismatch |= hit_d & np.any(coord_f != coord_d, axis=-1)
    frac = mismatch.mean()
    assert frac < 0.01, f"{mismatch.sum()}/{len(hit_d)} rays disagree"
    ok = ~mismatch
    np.testing.assert_allclose(dist_f[ok], dist_d[ok], atol=2e-3)


def test_render_sample_fast_matches_slow():
    rng = np.random.RandomState(1)
    sem = np.full((200, 200, 16), 16, np.int32)
    blob = rng.rand(200, 200, 16) < 0.01
    sem[blob] = rng.randint(0, 16, int(blob.sum()))
    flow = rng.randn(200, 200, 16, 2).astype(np.float32)
    rays = generate_lidar_rays()
    origins = np.array([[0.5, 0.3, 1.8], [5.0, -3.0, 1.9]], np.float32)
    valid = np.array([True, True])

    slow = render_sample(jnp.asarray(sem), jnp.asarray(flow),
                         jnp.asarray(rays), jnp.asarray(origins),
                         jnp.asarray(valid))
    fast = render_sample_fast(jnp.asarray(sem), jnp.asarray(flow),
                              jnp.asarray(rays), jnp.asarray(origins),
                              jnp.asarray(valid))
    lab_s = np.asarray(slow["label"])
    lab_f = np.asarray(fast["label"])
    agree = (lab_s == lab_f).mean()
    assert agree > 0.995, agree
    same = lab_s == lab_f
    d_s = np.asarray(slow["dist"])[same]
    d_f = np.asarray(fast["dist"])[same]
    np.testing.assert_allclose(d_f, d_s, atol=2e-3)

    # and the metric pipeline built on the fast renderer self-checks
    acc = RayMetricAccumulator()
    acc.update(fast, fast)
    scores = occ_score_from_metrics(acc.finalize())
    assert scores["OccScore"] == 1.0
