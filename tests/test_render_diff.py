"""Differentiable expected-depth renderer vs a direct numpy port of the CUDA
`render` loop (dvr.cu:390-636), plus finite-difference gradient checks and
the point-splat grid init."""

import numpy as np

import jax
import jax.numpy as jnp

from occnet_tpu.ops.render_diff import (
    render_depth_loss,
    render_expected_depth,
    splat_points,
)

GRID = (12, 10, 6)


def _numpy_render(sigma, origin, point, max_step=1000):
    """Single-ray port of the CUDA expected-depth march (X, Y, Z layout)."""
    X, Y, Z = sigma.shape
    o = np.asarray(origin, np.float64)
    e = np.asarray(point, np.float64)
    r = e - o
    gt_d = float(np.linalg.norm(r))
    d = r / gt_d
    v = np.floor(o).astype(int)
    step = np.where(d >= 0, 1, -1).astype(int)
    nb = v + (step > 0)
    tmax = np.where(d != 0, (nb - o) / np.where(d == 0, 1, d), 1e30)
    tdelta = np.where(d != 0, step / np.where(d == 0, 1, d), 1e30)

    path, ds, dts = [], [], []
    last_d = 0.0
    was_inside = False
    for _ in range(max_step):
        inside = np.all((v >= 0) & (v < np.array([X, Y, Z])))
        if inside:
            was_inside = True
            cur = tuple(v)
        elif was_inside:
            break
        elif last_d > gt_d:
            break
        if tmax[0] < tmax[1]:
            axis = 0 if tmax[0] < tmax[2] else 2
        else:
            axis = 1 if tmax[1] < tmax[2] else 2
        _d = tmax[axis]
        v[axis] += step[axis]
        tmax[axis] += tdelta[axis]
        if inside:
            path.append(cur)
            ds.append(_d)
            dts.append(max(0.0, _d - last_d))
        last_d = _d
    if not path:
        return -1.0, -1.0
    sd = np.array([sigma[p] for p in path]) * np.array(dts)
    csd = np.cumsum(sd)
    p = np.exp(-np.concatenate([[0.0], csd[:-1]])) - np.exp(-csd)
    exp_d = float(np.sum(p * np.array(ds)))
    p_out = np.exp(-csd[-1])
    max_d = ds[-1]
    exp_d += p_out * max_d
    return exp_d, min(gt_d, max_d)


def _rays(rng, n=40):
    X, Y, Z = GRID
    origin = np.array([X / 2 + 0.3, Y / 2 - 0.2, Z / 2 + 0.1])
    pts = origin[None] + rng.randn(n, 3) * np.array([8.0, 8.0, 4.0])
    return origin, pts


def test_expected_depth_matches_numpy_oracle():
    rng = np.random.RandomState(0)
    sigma = np.abs(rng.randn(*GRID)).astype(np.float32) * 0.8
    origin, pts = _rays(rng)
    pred, gt = render_expected_depth(
        jnp.asarray(sigma)[None], jnp.asarray(origin)[None],
        jnp.asarray(pts, jnp.float32))
    pred, gt = np.asarray(pred), np.asarray(gt)
    for i in range(pts.shape[0]):
        ref_p, ref_g = _numpy_render(sigma, origin, pts[i])
        np.testing.assert_allclose(pred[i], ref_p, rtol=2e-4, atol=2e-4)
        np.testing.assert_allclose(gt[i], ref_g, rtol=2e-4, atol=2e-4)


def test_padded_and_missing_rays():
    rng = np.random.RandomState(1)
    sigma = np.abs(rng.randn(*GRID)).astype(np.float32)
    origin, pts = _rays(rng, n=4)
    # ray 0 padded (tindex -1); ray 1 shot from far outside, away from grid
    far = np.array([[1000.0, 1000.0, 1000.0]])
    pts = np.concatenate([pts[:1], pts[1:2] + 0, pts[2:]], axis=0)
    origins2 = np.stack([origin, far[0]])
    tindex = np.array([-1, 0, 0, 1], np.int32)
    pred, gt = render_expected_depth(
        jnp.asarray(np.stack([sigma, sigma])), jnp.asarray(origins2),
        jnp.asarray(pts, jnp.float32), jnp.asarray(tindex))
    assert pred[0] == -1.0 and gt[0] == -1.0          # padded
    assert pred[3] == -1.0 and gt[3] == -1.0          # never enters the grid


def test_outside_origin_entering_matches_numpy_oracle():
    """Origin outside the grid whose rays enter it: pre-entry march steps
    occupy scan slots but are invalid, so the last-valid-step index must not
    be computed as count-1 (ADVICE r1, render_diff.py:172)."""
    rng = np.random.RandomState(7)
    sigma = np.abs(rng.randn(*GRID)).astype(np.float32) * 0.8
    X, Y, Z = GRID
    origin = np.array([-4.3, -2.6, -1.7])           # outside, below the grid
    targets = (np.array([[X / 2, Y / 2, Z / 2]])
               + rng.randn(24, 3) * np.array([4.0, 4.0, 2.0]))
    pred, gt = render_expected_depth(
        jnp.asarray(sigma)[None], jnp.asarray(origin, jnp.float32)[None],
        jnp.asarray(targets, jnp.float32))
    pred, gt = np.asarray(pred), np.asarray(gt)
    hit = 0
    for i in range(targets.shape[0]):
        ref_p, ref_g = _numpy_render(sigma, origin, targets[i])
        np.testing.assert_allclose(pred[i], ref_p, rtol=3e-4, atol=3e-4)
        np.testing.assert_allclose(gt[i], ref_g, rtol=3e-4, atol=3e-4)
        hit += ref_p >= 0
    assert hit >= 10                                # most rays do enter


def test_gradient_matches_finite_differences():
    rng = np.random.RandomState(2)
    sigma = np.abs(rng.randn(*GRID)).astype(np.float64) * 0.5
    origin, pts = _rays(rng, n=12)

    def loss(s):
        return render_depth_loss(s[None], jnp.asarray(origin)[None],
                                 jnp.asarray(pts, jnp.float32), loss="l2")

    g = np.asarray(jax.grad(lambda s: loss(s))(jnp.asarray(sigma,
                                                           jnp.float32)))
    eps = 1e-3
    checked = 0
    for idx in zip(*np.nonzero(np.abs(g) > 1e-4)):
        if checked >= 6:
            break
        sp, sm = sigma.copy(), sigma.copy()
        sp[idx] += eps
        sm[idx] -= eps
        fd = (float(loss(jnp.asarray(sp, jnp.float32)))
              - float(loss(jnp.asarray(sm, jnp.float32)))) / (2 * eps)
        np.testing.assert_allclose(g[idx], fd, rtol=2e-2, atol=1e-4)
        checked += 1
    assert checked >= 3


def test_splat_points():
    pts = np.array([[1.2, 2.7, 3.1], [5.0, 0.0, 0.9],
                    [-1.0, 2.0, 2.0], [11.9, 9.9, 5.9], [40.0, 0.0, 0.0]])
    tindex = np.array([0, 1, 0, 1, 0], np.int32)
    occ = np.asarray(splat_points(jnp.asarray(pts, jnp.float32),
                                  jnp.asarray(tindex), GRID, num_t=2))
    assert occ.shape == (2, *GRID)
    assert occ[0, 1, 2, 3] == 1 and occ[1, 5, 0, 0] == 1
    assert occ[1, 11, 9, 5] == 1
    assert occ.sum() == 3                 # OOB + in-bounds-count check
