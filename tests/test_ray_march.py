"""DDA ray-marcher tests: analytic cases + numpy voxel-walk oracle + the
GT-vs-GT metric self-check (the reference's implicit correctness oracle,
README workflow: render ground truth through the same pipeline and expect
IoU = 1 / AVE = 0 / OccScore = 1)."""

import numpy as np
import jax.numpy as jnp

from occnet_tpu.evaluation.ray_metrics import (
    RayMetricAccumulator,
    generate_lidar_rays,
    occ_score_from_metrics,
    render_sample,
)
from occnet_tpu.ops.ray_march import dda_raymarch


def numpy_dda_oracle(occ, origin, direction, max_steps=448):
    """Independent scalar voxel walk (float64)."""
    X, Y, Z = occ.shape
    d = np.asarray(direction, np.float64)
    d = d / np.linalg.norm(d)
    o = np.asarray(origin, np.float64)
    v = np.floor(o).astype(int)
    step = np.where(d >= 0, 1, -1).astype(int)
    nb = v + (step > 0)
    tmax = np.where(d != 0, (nb - o) / np.where(d == 0, 1, d), 1e30)
    tdelta = np.where(d != 0, step / np.where(d == 0, 1, d), 1e30)
    was_inside = False
    last = (0.0, (0, 0, 0))
    for _ in range(max_steps):
        inside = np.all((v >= 0) & (v < [X, Y, Z]))
        if was_inside and not inside:
            break
        was_inside = was_inside or inside
        if tmax[0] < tmax[1]:
            axis = 0 if tmax[0] < tmax[2] else 2
        else:
            axis = 1 if tmax[1] < tmax[2] else 2
        exit_d = tmax[axis]
        if inside:
            if occ[tuple(v)] > 0.5:
                return exit_d, tuple(v), True
            last = (exit_d, tuple(v))
        v = v.copy()
        v[axis] += step[axis]
        tmax = tmax.copy()
        tmax[axis] += tdelta[axis]
    return last[0], last[1], False


def test_axis_aligned_hit():
    occ = np.zeros((10, 10, 10), np.float32)
    occ[7, 5, 5] = 1.0
    origins = np.array([[2.5, 5.5, 5.5]], np.float32)
    dirs = np.array([[1.0, 0.0, 0.0]], np.float32)
    dist, coord, hit = dda_raymarch(jnp.asarray(occ), jnp.asarray(origins),
                                    jnp.asarray(dirs))
    assert bool(hit[0])
    assert tuple(np.asarray(coord[0])) == (7, 5, 5)
    # hit distance = exit of voxel x=7 -> boundary at x=8: 8 - 2.5 = 5.5
    np.testing.assert_allclose(float(dist[0]), 5.5, atol=1e-5)


def test_miss_exits_grid():
    occ = np.zeros((8, 8, 8), np.float32)
    origins = np.array([[4.5, 4.5, 4.5]], np.float32)
    dirs = np.array([[0.0, -1.0, 0.0]], np.float32)
    dist, coord, hit = dda_raymarch(jnp.asarray(occ), jnp.asarray(origins),
                                    jnp.asarray(dirs))
    assert not bool(hit[0])
    # exits through y=0 after travelling 4.5; last voxel y==0
    np.testing.assert_allclose(float(dist[0]), 4.5, atol=1e-5)
    assert int(coord[0, 1]) == 0


def test_matches_numpy_oracle_random():
    rng = np.random.RandomState(0)
    occ = (rng.rand(12, 14, 9) < 0.08).astype(np.float32)
    n = 64
    origins = rng.uniform(1.0, 8.0, size=(n, 3)).astype(np.float32)
    dirs = rng.randn(n, 3).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    dist, coord, hit = dda_raymarch(jnp.asarray(occ), jnp.asarray(origins),
                                    jnp.asarray(dirs), max_steps=64)
    mismatches = 0
    for i in range(n):
        d_ref, c_ref, h_ref = numpy_dda_oracle(occ, origins[i], dirs[i],
                                               max_steps=64)
        if bool(hit[i]) != h_ref or (
                h_ref and tuple(np.asarray(coord[i])) != c_ref):
            mismatches += 1   # float32-vs-float64 boundary ties
        elif h_ref:
            np.testing.assert_allclose(float(dist[i]), d_ref, atol=1e-3)
    assert mismatches <= 1, f"{mismatches} rays disagree with the oracle"


def test_ray_fan_geometry():
    rays = generate_lidar_rays()
    # 39 pitch rings x 360 azimuths.  (The reference's comments say 15840
    # rays, but executing its generate_lidar_rays (ray_metrics.py:63-86)
    # yields 39 rings = 14040 — we match the code, not the comment.)
    assert rays.shape[1] == 3
    assert rays.shape[0] % 360 == 0
    np.testing.assert_allclose(np.linalg.norm(rays, axis=-1), 1.0, atol=1e-5)
    assert rays.shape[0] == 14040


def test_gt_vs_gt_selfcheck():
    """Rendering a grid against itself must give OccScore == 1.0."""
    rng = np.random.RandomState(1)
    sem = np.full((40, 40, 8), 16, np.int32)      # free
    blob = rng.rand(40, 40, 8) < 0.05
    sem[blob] = rng.randint(0, 16, size=int(blob.sum()))
    flow = rng.randn(40, 40, 8, 2).astype(np.float32)

    rays = generate_lidar_rays()[::37]            # subsample for speed
    origins = np.zeros((2, 3), np.float32)
    origins[0] = [0.5, 0.5, 2.0]
    origins[1] = [-2.0, 1.0, 2.5]
    valid = np.array([True, True])

    # shrink pc_range grid: use the module's constants by scaling origins to
    # sit inside the 40x40x8-voxel grid at 0.4m -> adjust via direct voxel
    # placement: use render_sample with the real constants requires a
    # 200x200x16 grid; embed the small grid in a full-size one.
    full_sem = np.full((200, 200, 16), 16, np.int32)
    full_flow = np.zeros((200, 200, 16, 2), np.float32)
    full_sem[80:120, 80:120, 4:12] = sem
    full_flow[80:120, 80:120, 4:12] = flow

    out = render_sample(jnp.asarray(full_sem), jnp.asarray(full_flow),
                        jnp.asarray(rays), jnp.asarray(origins),
                        jnp.asarray(valid))
    acc = RayMetricAccumulator()
    acc.update(out, out)
    scores = occ_score_from_metrics(acc.finalize())
    assert scores["RayIoU"] == 1.0
    assert scores["mAVE"] == 0.0
    assert abs(scores["OccScore"] - 1.0) < 1e-9


def test_native_cpu_renderer_matches_jax_dda():
    """The C++ DDA extension must agree with the JAX marcher."""
    from occnet_tpu.native import dvr_render_forward_cpu
    rng = np.random.RandomState(2)
    occ = (rng.rand(24, 20, 12) < 0.05).astype(np.float32)
    n = 512
    origins = rng.uniform(2.0, 10.0, size=(n, 3)).astype(np.float32)
    dirs = rng.randn(n, 3).astype(np.float32)
    dist_c, coord_c, hit_c = dvr_render_forward_cpu(occ, origins, dirs,
                                                    max_steps=80)
    dist_j, coord_j, hit_j = dda_raymarch(
        jnp.asarray(occ), jnp.asarray(origins), jnp.asarray(dirs),
        max_steps=80)
    dist_j, coord_j, hit_j = map(np.asarray, (dist_j, coord_j, hit_j))
    mismatch = (hit_c != hit_j) | (hit_j & np.any(coord_c != coord_j, -1))
    assert mismatch.mean() < 0.01, mismatch.sum()
    ok = ~mismatch
    np.testing.assert_allclose(dist_c[ok], dist_j[ok], atol=2e-3)
