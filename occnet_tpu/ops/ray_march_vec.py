"""Fully-vectorised fan DDA — no sequential march loop at all.

The column-factored marcher (`ops/ray_march_fast.py`) is iteration-bound:
~420 sequential `fori_loop` steps of tiny per-step work (~164 ms/render at
base scale).  Key observation: the Amanatides-Woo xy-walk is data-INDEPENDENT
— the crossing times of an axis form an arithmetic progression
(t = tmax0 + i * tdelta), so the entire visited-column sequence is the merged
sort of two arithmetic progressions and can be computed in closed form:

  1. sort the 2N candidate crossing times once (`jax.lax.sort`, vectorised
     over azimuths x origins) -> per-step exit time + which-axis flag;
  2. exclusive cumsum of the axis flags -> every visited column index;
  3. ONE bulk gather of the z-packed column bitmasks for all
     (grid, origin, azimuth, step) at once — the TPU gather's per-row cost is
     amortised into a single large dispatch instead of 420 dependent ones;
  4. per (step, pitch-ring): the z-interval crossed inside the column is a
     contiguous bit range — a bitmask AND tells which crossing first hits an
     occupied voxel (`argmax` over steps), and the original per-crossing
     z-sub-walk (<= max_z_sub voxels, `ray_march_fast.py` body) is then
     replayed only at the hit/last crossings to recover exact semantics
     (first-occupied-voxel EXIT distance; miss -> last visited voxel).

Semantics match `dda_raymarch_fan` (and therefore dvr.render_forward's
first-hit convention, `dvr.cu:270-307`) including the max_z_sub=4 cap.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from occnet_tpu.ops.ray_march_fast import pack_columns

# python float, NOT a jnp array: module-level jax arrays become
# hoisted const-inputs of compiled programs on jax 0.9, which this
# toolchain's dispatch can drop (input-count mismatch at call time)
_BIG = 1e30


def _column_walk(origin, az_dirs, X, Y, N):
    """Closed-form xy-walk for one origin.

    Returns per (azimuth, step): vx, vy (int32 column), t_in, t_exit (f32),
    inside (bool)."""
    f32 = jnp.float32
    o = origin.astype(f32)
    d = az_dirs.astype(f32)                         # (A, 2)
    A = d.shape[0]
    step = jnp.where(d >= 0, 1, -1).astype(jnp.int32)
    v0 = jnp.floor(o[:2]).astype(jnp.int32)         # (2,)
    nb = v0.astype(f32) + (step > 0).astype(f32)
    tmax0 = jnp.where(d != 0, (nb - o[:2]) / d, _BIG)       # (A, 2)
    tdelta = jnp.where(d != 0, step.astype(f32) / d, _BIG)

    i = jnp.arange(N, dtype=f32)
    tX = tmax0[:, 0:1] + i[None, :] * tdelta[:, 0:1]        # (A, N)
    tY = tmax0[:, 1:2] + i[None, :] * tdelta[:, 1:2]
    # y first: the loop marcher's `use_x = tmax_x < tmax_y` crosses y on
    # exact ties (45-degree azimuths), and lax.sort is stable
    keys = jnp.concatenate([tY, tX], axis=1)                # (A, 2N)
    flags = jnp.concatenate(
        [jnp.zeros((A, N), jnp.int32), jnp.ones((A, N), jnp.int32)], axis=1)
    t_sorted, flag_sorted = jax.lax.sort((keys, flags), dimension=1,
                                         num_keys=1)
    t_exit = t_sorted[:, :N]                                # (A, N)
    fx = flag_sorted[:, :N]                                 # 1 = x-crossing
    # column BEFORE crossing n: exclusive cumsum of crossings so far
    cx = jnp.cumsum(fx, axis=1) - fx                        # (A, N)
    cy = jnp.cumsum(1 - fx, axis=1) - (1 - fx)
    vx = v0[0] + step[:, 0:1] * cx
    vy = v0[1] + step[:, 1:2] * cy
    t_in = jnp.concatenate(
        [jnp.zeros((A, 1), f32), t_exit[:, :-1]], axis=1)
    inside = (vx >= 0) & (vx < X) & (vy >= 0) & (vy < Y)
    return vx, vy, t_in, t_exit, inside


def _z_subwalk(colbits, vx, vy, t_in, t_exit, z0, dz, zstep, Z, max_z_sub):
    """Replay the per-crossing z-sub-walk (`ray_march_fast.py:115-148`) at ONE
    crossing per ray.  All args (...,) broadcastable; returns first-occupied
    (hit) and last-visited voxel info within the crossing."""
    f32 = jnp.float32
    zi = jnp.floor(z0 + t_in * dz).astype(jnp.int32)
    hit = jnp.zeros_like(t_in, bool)
    hit_s = jnp.zeros_like(t_in)
    hit_z = jnp.zeros_like(zi)
    last_ok = jnp.zeros_like(hit)
    last_s = jnp.zeros_like(t_in)
    last_z = jnp.zeros_like(zi)
    for j in range(max_z_sub):
        zj = zi + j * zstep
        z_ok = (zj >= 0) & (zj < Z)
        zb = zj + (zstep > 0).astype(jnp.int32)
        s_zb = jnp.where(dz != 0, (zb.astype(f32) - z0) /
                         jnp.where(dz == 0, 1.0, dz), _BIG)
        if j == 0:
            enters = jnp.ones_like(hit)
        else:
            s_enter = jnp.where(
                dz != 0,
                ((zj + (zstep < 0).astype(jnp.int32)).astype(f32) - z0)
                / jnp.where(dz == 0, 1.0, dz), _BIG)
            enters = (s_enter < t_exit) & (dz != 0)
        visit = z_ok & enters
        occ_bit = ((colbits >> jnp.clip(zj, 0, Z - 1)) & 1) > 0
        s_exit_vox = jnp.minimum(s_zb, t_exit)
        newly = visit & occ_bit & ~hit
        hit_s = jnp.where(newly, s_exit_vox, hit_s)
        hit_z = jnp.where(newly, zj, hit_z)
        hit = hit | newly
        last_s = jnp.where(visit, s_exit_vox, last_s)
        last_z = jnp.where(visit, zj, last_z)
        last_ok = last_ok | visit
    coord_hit = jnp.stack([vx, vy, hit_z], axis=-1)
    coord_last = jnp.stack([vx, vy, last_z], axis=-1)
    return hit, hit_s, coord_hit, last_ok, last_s, coord_last


@functools.partial(jax.jit, static_argnames=("max_xy_steps", "max_z_sub"))
def dda_raymarch_fan_vec(
    occs: jax.Array,         # (G, X, Y, Z) occupancy grids (>0.5 occupied)
    origins: jax.Array,      # (T, 3) voxel units
    az_dirs: jax.Array,      # (A, 2)
    pitch_dz: jax.Array,     # (K,)
    pitch_scale: jax.Array,  # (K,)
    max_xy_steps: int = 420,
    max_z_sub: int = 4,
):
    """March G grids x T origins x A azimuths x K pitch rings at once.

    Returns dist (G, T, A, K) f32 [3D distance, voxel units], coord
    (G, T, A, K, 3) int32, hit (G, T, A, K) bool — the batched equivalent of
    `dda_raymarch_fan` outputs."""
    G, X, Y, Z = occs.shape
    N = max_xy_steps
    f32 = jnp.float32
    cols = jax.vmap(pack_columns)(
        occs.astype(jnp.float32))                   # (G, X, Y)
    cols_flat = cols.reshape(G, X * Y)

    vx, vy, t_in, t_exit, inside = jax.vmap(
        lambda o: _column_walk(o, az_dirs, X, Y, N))(origins)
    # (T, A, N) each
    idx = (jnp.clip(vx, 0, X - 1) * Y +
           jnp.clip(vy, 0, Y - 1)).reshape(-1)      # (T*A*N,)
    colbits = jnp.take(cols_flat, idx, axis=1).reshape(
        (G,) + vx.shape)                            # (G, T, A, N)
    colbits = jnp.where(inside[None], colbits, 0)

    dz = pitch_dz.astype(f32)                       # (K,)
    zstep = jnp.where(dz >= 0, 1, -1).astype(jnp.int32)
    z0 = origins[:, 2].astype(f32)                  # (T,)

    # --- per (T, A, N, K): contiguous z-bit range crossed in this column ---
    z0_b = z0[:, None, None, None]
    dz_b = dz[None, None, None, :]
    zstep_b = zstep[None, None, None, :]
    t_in_b = t_in[..., None]                        # (T, A, N, 1)
    t_exit_b = t_exit[..., None]
    zi = jnp.floor(z0_b + t_in_b * dz_b).astype(jnp.int32)  # (T, A, N, K)
    # m - 1 = number of later z-voxels entered before the column exit
    extra = jnp.zeros(zi.shape, jnp.int32)
    for j in range(1, max_z_sub):
        s_enter = jnp.where(
            dz_b != 0,
            ((zi + j * zstep_b + (zstep_b < 0)).astype(f32) - z0_b)
            / jnp.where(dz_b == 0, 1.0, dz_b), _BIG)
        extra = extra + ((s_enter < t_exit_b) & (dz_b != 0)).astype(jnp.int32)
    z_far = zi + extra * zstep_b
    lo = jnp.clip(jnp.minimum(zi, z_far), 0, Z - 1)
    hi = jnp.clip(jnp.maximum(zi, z_far), 0, Z - 1)
    nonempty = (jnp.maximum(jnp.minimum(zi, z_far), 0)
                <= jnp.minimum(jnp.maximum(zi, z_far), Z - 1))
    span = hi - lo + 1
    range_mask = jnp.where(nonempty,
                           ((1 << span) - 1) << lo, 0)      # (T, A, N, K)

    visited = inside[..., None] & nonempty                  # (T, A, N, K)
    anyhit = visited & ((colbits[..., None] & range_mask[None]) != 0)
    # (G, T, A, N, K)

    # first hit crossing / last visited crossing indices along N
    n_hit = jnp.argmax(anyhit, axis=3)                      # (G, T, A, K)
    has_hit = jnp.any(anyhit, axis=3)
    nvis = jnp.argmax(jnp.flip(visited, axis=2), axis=2)
    n_last = (N - 1) - nvis                                 # (T, A, K)
    has_vis = jnp.any(visited, axis=2)

    # gather per-ray crossing data and replay the exact z-sub-walk there
    def at_n(arr_tan, n_tak):
        # arr (T, A, N) at n (T, A, K) -> (T, A, K)
        return jnp.take_along_axis(arr_tan, n_tak, axis=2)

    def resolve(n_sel, colbits_sel):
        # n_sel, colbits_sel: (G, T, A, K)
        t_in_s = jax.vmap(lambda n: at_n(t_in, n))(n_sel)
        t_exit_s = jax.vmap(lambda n: at_n(t_exit, n))(n_sel)
        vx_s = jax.vmap(lambda n: at_n(vx, n))(n_sel)
        vy_s = jax.vmap(lambda n: at_n(vy, n))(n_sel)
        return _z_subwalk(
            colbits_sel, vx_s, vy_s, t_in_s, t_exit_s,
            z0[None, :, None, None], dz[None, None, None, :],
            zstep[None, None, None, :], Z, max_z_sub)

    # hit path (per grid)
    cb_hit = jax.vmap(lambda cb, n: jnp.take_along_axis(cb, n, axis=2))(
        colbits, n_hit)                                     # (G, T, A, K)
    hit_j, hit_s, coord_hit, _, _, _ = resolve(n_hit, cb_hit)
    hit = has_hit & hit_j

    # miss path: last visited crossing (the walk is grid-independent; only
    # the colbits differ per grid)
    n_last_g = jnp.broadcast_to(n_last[None], (G,) + n_last.shape)
    cb_last = jax.vmap(
        lambda cb: jnp.take_along_axis(cb, n_last, axis=2))(colbits)
    _, _, _, last_ok, last_s, coord_last = resolve(n_last_g, cb_last)
    last_ok = last_ok & has_vis[None]
    last_s = jnp.where(last_ok, last_s, 0.0)
    coord_last = jnp.where(last_ok[..., None], coord_last, 0)

    dist_s = jnp.where(hit, hit_s, last_s)
    coord = jnp.where(hit[..., None], coord_hit, coord_last)
    dist = dist_s * pitch_scale[None, None, None, :].astype(f32)
    return dist, coord, hit
