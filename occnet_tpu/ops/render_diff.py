"""Differentiable expected-depth volume renderer + point-splat grid init.

TPU-native equivalents of the two remaining dvr CUDA entry points
(`tools/ray_iou/lib/dvr/dvr.cpp:68-72`):

- `render` (`dvr.cu:390-636`): per-ray Amanatides-Woo traversal of a sigma
  grid computing the *expected* ray distance under the NeRF-style
  transmittance model — per visited voxel i with density ``sigma_i`` and
  in-voxel path length ``delta_i``::

      csd_i = cumsum(sigma_i * delta_i)
      p_i   = exp(-csd_{i-1}) - exp(-csd_i)          # absorption in voxel i
      exp_d = sum_i p_i * d_i + exp(-csd_last) * max_d

  where ``d_i`` is the exit distance of voxel i and ``max_d`` the exit
  distance of the last voxel inside the grid (`dvr.cu:556-598`).  The CUDA
  kernel hand-writes the backward ``dd/dsigma`` chain and scatter-adds it
  with acknowledged race conditions (`dvr.cu:602-633` "NOTE: potential race
  conditions when writing gradients").  Here the forward is a pure JAX
  function of ``sigma`` — a fixed-length geometric march (independent of
  sigma) records the visited-voxel path, then a differentiable
  gather + cumsum computes ``exp_d`` — so ``jax.grad`` yields the exact
  gradient through a deterministic scatter-adjoint; no race, no custom VJP.

- `init` (`dvr.cu:18-67`): point-cloud -> occupancy splat; each in-bounds
  end point sets its voxel to 1 (per time slot via ``tindex``).

Layout: the framework's grid convention (X, Y, Z) (CUDA uses [T, Z, Y, X];
see `ops/ray_march.py`).  Coordinates are in voxel units.  Rays whose
``tindex`` is negative (padding) or that never intersect the grid return
-1 for both distances, matching the kernel's -1 initialisation
(`dvr.cu:355-356`).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

# python float, NOT a jnp array: module-level jax arrays become
# hoisted const-inputs of compiled programs on jax 0.9, which this
# toolchain's dispatch can drop (input-count mismatch at call time)
_BIG = 1e30


def splat_points(points: jax.Array, tindex: Optional[jax.Array],
                 grid_shape: Tuple[int, int, int],
                 num_t: int = 1) -> jax.Array:
    """`dvr.init` equivalent: (M, 3) voxel-unit end points -> (T, X, Y, Z)
    f32 occupancy with a 1 splatted at each in-bounds point (`dvr.cu:55-66`).
    Out-of-bounds and ``tindex < 0`` points are dropped."""
    X, Y, Z = grid_shape
    v = jnp.floor(points.astype(jnp.float32)).astype(jnp.int32)
    t = (jnp.zeros(points.shape[:-1], jnp.int32) if tindex is None
         else tindex.astype(jnp.int32))
    ts = jnp.where(num_t == 1, 0, t)
    ok = ((t >= 0)
          & (v[..., 0] >= 0) & (v[..., 0] < X)
          & (v[..., 1] >= 0) & (v[..., 1] < Y)
          & (v[..., 2] >= 0) & (v[..., 2] < Z))
    flat = (ts * X + jnp.clip(v[..., 0], 0, X - 1)) * (Y * Z) \
        + jnp.clip(v[..., 1], 0, Y - 1) * Z + jnp.clip(v[..., 2], 0, Z - 1)
    occ = jnp.zeros((num_t * X * Y * Z,), jnp.float32)
    occ = occ.at[flat.reshape(-1)].max(ok.reshape(-1).astype(jnp.float32))
    return occ.reshape(num_t, X, Y, Z)


@functools.partial(jax.jit, static_argnames=("max_steps",))
def _march_path(grid_shape, origins, points, max_steps: int):
    """Geometric voxel walk (no sigma dependence): per ray, the ordered list
    of voxels visited inside the grid.

    origins/points (R, 3) voxel units.  Returns per-step (S = max_steps)
    arrays: flat voxel index (R, S) int32, exit distance d (R, S), in-voxel
    length delta (R, S), valid mask (R, S) bool; plus gt_d (R,) the
    origin->endpoint distance.  Mirrors the traversal loop `dvr.cu:506-586`
    (march until leaving the grid, or until ``last_d > gt_d`` while never
    having entered)."""
    X, Y, Z = grid_shape
    sizes = jnp.asarray([X, Y, Z], jnp.int32)
    o = origins.astype(jnp.float32)
    e = points.astype(jnp.float32)
    r = e - o
    gt_d = jnp.linalg.norm(r, axis=-1)
    d = r / jnp.maximum(gt_d, 1e-12)[:, None]

    v0 = jnp.floor(o).astype(jnp.int32)
    step = jnp.where(d >= 0, 1, -1).astype(jnp.int32)
    next_boundary = v0.astype(jnp.float32) + (step > 0).astype(jnp.float32)
    tmax0 = jnp.where(d != 0, (next_boundary - o) / d, _BIG)
    tdelta = jnp.where(d != 0, step.astype(jnp.float32) / d, _BIG)

    R = o.shape[0]
    carry = dict(
        v=v0, tmax=tmax0,
        last_d=jnp.zeros((R,), jnp.float32),
        was_inside=jnp.zeros((R,), bool),
        done=jnp.zeros((R,), bool),
    )

    def body(s, _):
        v, tmax = s["v"], s["tmax"]
        inside = jnp.all((v >= 0) & (v < sizes[None, :]), axis=-1)
        done = s["done"] | (s["was_inside"] & ~inside) \
            | (~s["was_inside"] & ~inside & (s["last_d"] > gt_d))
        active = ~done

        tx, ty, tz = tmax[:, 0], tmax[:, 1], tmax[:, 2]
        axis = jnp.where(tx < ty,
                         jnp.where(tx < tz, 0, 2),
                         jnp.where(ty < tz, 1, 2))
        exit_d = jnp.min(tmax, axis=-1)

        vc = jnp.clip(v, 0, sizes[None, :] - 1)
        flat = vc[:, 0] * (Y * Z) + vc[:, 1] * Z + vc[:, 2]
        valid = active & inside
        delta = jnp.maximum(0.0, exit_d - s["last_d"])

        onehot = jax.nn.one_hot(axis, 3, dtype=jnp.int32)
        adv = active[:, None] & (onehot > 0)
        s_new = dict(
            v=jnp.where(adv, v + step, v),
            tmax=jnp.where(adv, tmax + tdelta, tmax),
            last_d=jnp.where(active, exit_d, s["last_d"]),
            was_inside=s["was_inside"] | inside,
            done=done,
        )
        return s_new, (flat, exit_d, delta, valid)

    _, (flat, exit_d, delta, valid) = jax.lax.scan(
        body, carry, None, length=max_steps)
    # scan stacks along axis 0 -> (S, R); step axis last for the cumsums
    return (jnp.swapaxes(flat, 0, 1), jnp.swapaxes(exit_d, 0, 1),
            jnp.swapaxes(delta, 0, 1), jnp.swapaxes(valid, 0, 1), gt_d)


def render_expected_depth(
    sigma: jax.Array,                  # (T, X, Y, Z) non-negative densities
    origins: jax.Array,                # (T, 3) voxel units
    points: jax.Array,                 # (M, 3) ray end points, voxel units
    tindex: Optional[jax.Array] = None,   # (M,) int32, <0 = padded ray
    max_steps: Optional[int] = None,
):
    """`dvr.render` equivalent: (pred_dist (M,), gt_dist (M,)), both -1 where
    the ray is padded or never intersects the grid.  ``pred_dist`` is
    differentiable w.r.t. ``sigma``; ``gt_dist = min(|end-origin|, max_d)``
    (`dvr.cu:595-598`)."""
    T, X, Y, Z = sigma.shape
    if max_steps is None:
        max_steps = X + Y + Z + 3
    t = (jnp.zeros(points.shape[:-1], jnp.int32) if tindex is None
         else tindex.astype(jnp.int32))
    ts = jnp.zeros_like(t) if T == 1 else jnp.maximum(t, 0)
    o = origins[ts]

    flat, exit_d, delta, valid, gt_d = _march_path(
        (X, Y, Z), o, points, max_steps)

    vf = valid.astype(jnp.float32)
    sig = sigma.reshape(-1)[ts[:, None] * (X * Y * Z) + flat] * vf  # (M, S)
    sd = sig * delta
    csd = jnp.cumsum(sd, axis=1)
    trans = jnp.exp(-csd)                           # T_i after voxel i
    p = jnp.exp(-(csd - sd)) - trans                # absorbed in voxel i

    count = valid.sum(axis=1)
    entered = count > 0
    # exit distance / transmittance of the LAST valid voxel per ray.  Valid
    # steps are NOT a prefix of the scan when the origin lies outside the
    # grid (pre-entry steps occupy slots but are invalid), so index the last
    # set bit rather than count-1 (same trick as ops/ray_march_vec.py).
    S = valid.shape[1]
    last_idx = jnp.where(
        entered,
        (S - 1) - jnp.argmax(valid[:, ::-1].astype(jnp.int32), axis=1),
        0)
    max_d = jnp.take_along_axis(exit_d, last_idx[:, None], axis=1)[:, 0]
    p_out = jnp.take_along_axis(trans, last_idx[:, None], axis=1)[:, 0]

    exp_d = jnp.sum(p * exit_d * vf, axis=1) + p_out * max_d
    ok = entered & (t >= 0)
    pred = jnp.where(ok, exp_d, -1.0)
    gt = jnp.where(ok, jnp.minimum(gt_d, max_d), -1.0)
    return pred, gt


def render_depth_loss(
    sigma: jax.Array, origins: jax.Array, points: jax.Array,
    tindex: Optional[jax.Array] = None, loss: str = "l1",
    max_steps: Optional[int] = None,
):
    """Scalar depth-supervision loss over valid rays (the training use the
    CUDA kernel serves in 4d-occ forecasting): 'l1' |pred-gt|, 'l2'
    0.5 (pred-gt)^2, 'absrel' |pred-gt|/gt — gradient types matching
    `dvr.cu:617-624`.  ``jax.grad`` w.r.t. ``sigma`` replaces the kernel's
    in-place ``grad_sigma`` output."""
    pred, gt = render_expected_depth(sigma, origins, points, tindex,
                                     max_steps)
    ok = (gt >= 0).astype(jnp.float32)
    err = pred - gt
    if loss == "l1":
        per = jnp.abs(err)
    elif loss == "l2":
        per = 0.5 * err * err
    elif loss == "absrel":
        per = jnp.abs(err) / jnp.maximum(gt, 1e-6)
    else:
        raise ValueError(f"unknown loss {loss!r}")
    return jnp.sum(per * ok) / jnp.maximum(jnp.sum(ok), 1.0)
