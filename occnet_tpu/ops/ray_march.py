"""Vectorised Amanatides–Woo voxel-traversal ray marcher.

TPU-native replacement for the reference's `dvr.render_forward` CUDA kernel
(`tools/ray_iou/lib/dvr/dvr.cu:69-319`): for each ray, march voxel-by-voxel
through an occupancy grid; the first voxel with occ > 0.5 yields the hit —
recorded as that voxel's *exit* distance (the kernel's `d[i]`, :270-285) and
its (x, y, z) index.  Rays that traverse the grid without a hit return the
exit distance and index of the last voxel visited; rays that never enter the
grid return zeros (the kernel leaves its zero-initialised outputs untouched).

The data-dependent while-loop of the CUDA kernel becomes a fixed-length
`lax.fori_loop` with masked state updates: for origins inside the 200x200x16
grid the traversal crosses at most X+Y+Z+3 voxel boundaries, so `max_steps`
~448 covers every ray and XLA compiles one static loop.  Tie-breaking between
axes follows the kernel's nested comparisons exactly.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

# python float, NOT a jnp array: module-level jax arrays become
# hoisted const-inputs of compiled programs on jax 0.9, which this
# toolchain's dispatch can drop (input-count mismatch at call time)
_BIG = 1e30


@functools.partial(jax.jit, static_argnames=("max_steps",))
def dda_raymarch(
    occ: jax.Array,         # (X, Y, Z) occupancy, >0.5 = occupied
    origins: jax.Array,     # (R, 3) in voxel units (x, y, z)
    dirs: jax.Array,        # (R, 3) ray directions (need not be unit)
    max_steps: int = 448,
):
    """Returns (dist (R,), coord (R, 3) int32, hit (R,) bool).

    `dist` is in voxel units along the *normalised* direction, matching the
    kernel (it normalises by the origin->endpoint distance, dvr.cu:137-146).
    """
    X, Y, Z = occ.shape
    sizes = jnp.asarray([X, Y, Z], jnp.int32)
    occ_flat = (occ.reshape(-1) > 0.5)

    o = origins.astype(jnp.float32)
    norm = jnp.linalg.norm(dirs.astype(jnp.float32), axis=-1, keepdims=True)
    d = dirs.astype(jnp.float32) / jnp.maximum(norm, 1e-12)

    R = o.shape[0]
    v0 = jnp.floor(o).astype(jnp.int32)                      # (R, 3)
    step = jnp.where(d >= 0, 1, -1).astype(jnp.int32)
    next_boundary = v0.astype(jnp.float32) + (step > 0).astype(jnp.float32)
    tmax0 = jnp.where(d != 0, (next_boundary - o) / d, _BIG)
    tdelta = jnp.where(d != 0, step.astype(jnp.float32) / d, _BIG)

    init = dict(
        v=v0,
        tmax=tmax0,
        hit=jnp.zeros((R,), bool),
        hit_d=jnp.zeros((R,), jnp.float32),
        hit_v=jnp.zeros((R, 3), jnp.int32),
        last_d=jnp.zeros((R,), jnp.float32),
        last_v=jnp.zeros((R, 3), jnp.int32),
        was_inside=jnp.zeros((R,), bool),
        done=jnp.zeros((R,), bool),
    )

    def body(_, s):
        v, tmax = s["v"], s["tmax"]
        inside = jnp.all((v >= 0) & (v < sizes[None, :]), axis=-1)
        done = s["done"] | (s["was_inside"] & ~inside)
        active = ~done

        # exit distance of the current voxel + advancing axis, with the
        # kernel's tie-breaking (dvr.cu:210-231).
        tx, ty, tz = tmax[:, 0], tmax[:, 1], tmax[:, 2]
        axis = jnp.where(tx < ty,
                         jnp.where(tx < tz, 0, 2),
                         jnp.where(ty < tz, 1, 2))
        exit_d = jnp.min(tmax, axis=-1)

        vc = jnp.clip(v, 0, sizes[None, :] - 1)
        flat = (vc[:, 0] * (Y * Z) + vc[:, 1] * Z + vc[:, 2])
        occ_here = occ_flat[flat] & inside

        newly_hit = active & inside & occ_here & ~s["hit"]
        upd_last = active & inside
        hit = s["hit"] | newly_hit
        hit_d = jnp.where(newly_hit, exit_d, s["hit_d"])
        hit_v = jnp.where(newly_hit[:, None], v, s["hit_v"])
        last_d = jnp.where(upd_last, exit_d, s["last_d"])
        last_v = jnp.where(upd_last[:, None], v, s["last_v"])

        onehot = jax.nn.one_hot(axis, 3, dtype=jnp.int32)
        adv = active[:, None] & (onehot > 0)
        v_new = jnp.where(adv, v + step, v)
        tmax_new = jnp.where(adv, tmax + tdelta, tmax)

        return dict(v=v_new, tmax=tmax_new, hit=hit, hit_d=hit_d,
                    hit_v=hit_v, last_d=last_d, last_v=last_v,
                    was_inside=s["was_inside"] | inside, done=done)

    s = jax.lax.fori_loop(0, max_steps, body, init)
    dist = jnp.where(s["hit"], s["hit_d"], s["last_d"])
    coord = jnp.where(s["hit"][:, None], s["hit_v"], s["last_v"])
    # never-entered rays -> zeros (kernel leaves outputs zero-initialised)
    entered = s["was_inside"]
    dist = jnp.where(entered, dist, 0.0)
    coord = jnp.where(entered[:, None], coord, 0)
    return dist, coord, s["hit"]
