"""Pallas TPU kernels for the planar-homography lift.

Same math as `ops/planar_lift.lift_and_average` (the two-pass banded-matrix
factorisation of the per-z-plane homography warp), but the 2-banded hat
interpolation matrices are built *inside* the kernels in VMEM instead of
being materialised in HBM.  At base scale the einsum formulation writes/reads
~1.2 GB of interpolation weights per level-0 pass; here the weight matrices
never leave the chip, leaving only the unavoidable tmp (pass-1 output)
traffic (~1.5 GB/level-0 at full DMA rate).

Kernel layout (per FPN level, per batch element; A = cameras, ZR = z-anchors
x BEV rows, M = BEV columns, K = the resampled image axis, N = the kept
image axis):

  pass-1 A  tmpA[zr, a, x, :] = sum_y hat(posA[a,x,zr]-y) f[a,y,x,:]
  pass-1 B  tmpB[zr, a, y, :] = sum_x hat(posB[a,y,zr]-x) f[a,y,x,:]
  pass-2    out[zr, i, :] = inv_count[i] * sum_a
               ( sum_x hat(pos2A[zr,a,i]-x) tmpA[zr,a,x,:]
               + sum_y hat(pos2B[zr,a,i]-y) tmpB[zr,a,y,:] )

Layout rules learned the hard way (Mosaic requires the last two dims of every
block to be 8/128-aligned or full, and pads the trailing-two tile to (8, 128)
— a spacer dim of size 1 before C silently costs 8x VMEM and DMA):

- tmp is (ZR_pad, A, N_pad, C) with ZR padded to 128s and N to 8s, so
  every block keeps real (.., C) trailing pairs and stays unpadded.
- pass-1 runs on a (A, N_pad/8, ZR_pad/128) grid: per program, 8 image
  columns x 128 zr rows — out blocks (128, 1, 8, C) are 4 KB-run strided
  writes, and the hat temporaries stay ~100 KB per unrolled column.
- pass-2 runs one program per zr row reading contiguous (1, A, N_pad, C)
  blocks; the whole camera sum is ONE MXU contraction over the concatenated
  (A*(w_pad+h_pad), M) hat matrix (separate small dots leave the MXU idle).
- padded positions are -2, whose hat support is empty -> padded tmp columns
  are exactly zero, so pass-2's tail weights multiply zeros (grid_sample
  zero-padding semantics are preserved).

Every kernel builds the weights transposed — W_T[k, m] = hat(pos[m] - k) via
a broadcasted iota over k — so both the forward contractions and the
transposed backward contractions are plain `dot_general`s with no in-kernel
transposes.  The lift is linear in the features, so the custom VJP needs only
the position arrays as residuals: dfeat = (transposed pass-2) then
(transposed pass-1, accumulated over zr-chunks in the grid).

Semantics parity: positions are pre-masked exactly like the einsum path
(`_band_limit` -> -2 kills the hat support; pass-2 positions additionally
masked by per-row pass-order selection and the camera-visibility mask), so
`lift_and_average_pallas` matches `lift_and_average` to bf16 tolerance.
Reference behaviour being reproduced: the SCA camera scatter-add + hit-count
normalisation (`spatial_cross_attention.py:149-172`) over grid_sample-style
bilinear taps (align_corners=False, zero padding).
"""

from __future__ import annotations

import functools
import os
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from occnet_tpu.ops.planar_lift import _band_limit, plane_homographies

# block sizes (env-overridable for tuning sweeps; defaults are the measured
# best at base scale)
_NB = int(os.environ.get("OCCNET_LIFT_NB", "8"))    # pass-1 image columns
_ZRB = int(os.environ.get("OCCNET_LIFT_ZRB", "128"))  # pass-1 zr rows
_WB = int(os.environ.get("OCCNET_LIFT_WB", "32"))   # pass-1 K-window rows


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _pad_axis(x, axis, target, value):
    pad = [(0, 0)] * x.ndim
    pad[axis] = (0, target - x.shape[axis])
    return jnp.pad(x, pad, constant_values=value) \
        if target > x.shape[axis] else x


def _round_up(n: int, m: int) -> int:
    return -(-n // m) * m


def _hat_t(pos_row: jax.Array, K: int, k0: float = 0.0) -> jax.Array:
    """pos_row (1, M) -> W_T (K, M) bf16 with W_T[k, m] = hat(pos[m]-k0-k)."""
    M = pos_row.shape[-1]
    k = jax.lax.broadcasted_iota(jnp.int32, (K, M), 0).astype(jnp.float32)
    return jnp.maximum(0.0, 1.0 - jnp.abs((pos_row - k0) - k)).astype(
        jnp.bfloat16)


# ---------------------------------------------------------------------------
# pass 1: resample feature columns (order A) / rows (order B) onto image lines
# ---------------------------------------------------------------------------


def _pass1_kernel(pos_ref, feat_ref, out_ref):
    # pos (1, nb, 1, zrb); feat (1, nb, K, C); out (zrb, 1, nb, C)
    #
    # Block-level predication: a block whose positions are all -2 (masked —
    # out of band, wrong pass order for every zr row, or camera-invisible
    # row) contributes exactly zero, so all its dots are skipped and zeros
    # written instead.  At base scale ~50% of pass-1 blocks are dead, and
    # block-dead ~= column-dead (the masks are row/column-structured), so
    # block granularity loses almost nothing while keeping the unrolled
    # dots branch-free (per-column @pl.when serialised the MXU pipeline
    # and measured SLOWER than no predication at all).
    K = feat_ref.shape[2]
    live = jnp.max(pos_ref[0]) > -2.0

    @pl.when(live)
    def _():
        for j in range(feat_ref.shape[1]):
            wt = _hat_t(pos_ref[0, j], K)          # (K, zrb)
            out_ref[:, 0, j, :] = jax.lax.dot_general(
                wt, feat_ref[0, j], (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).astype(out_ref.dtype)

    @pl.when(~live)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)


def _pass1(pos, feat_kc):
    """pos (A, N_pad, 1, ZR_pad), feat_kc (A, N_pad, K, C)
    -> tmp (ZR_pad, A, N_pad, C) bf16.

    Order A: N = w (BEV-facing image columns), K = h; order B: N = h, K = w.
    """
    A, N, K, C = feat_kc.shape
    ZR = pos.shape[3]
    nb, zrb = min(_NB, N), min(_ZRB, ZR)
    return pl.pallas_call(
        _pass1_kernel,
        grid=(A, N // nb, ZR // zrb),
        in_specs=[
            pl.BlockSpec((1, nb, 1, zrb), lambda a, n, z: (a, n, 0, z),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nb, K, C), lambda a, n, z: (a, n, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((zrb, 1, nb, C), lambda a, n, z: (z, a, n, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((ZR, A, N, C), jnp.bfloat16),
        interpret=_interpret(),
    )(pos, feat_kc)


def _block_window(pos, K: int):
    """Per pass-1 block (a, n-block, zr-block): 8-aligned window base into
    the K axis and a windowability flag.

    A block is windowable when every live position's 2-tap hat stencil fits
    in [base, base + _WB): live rows sorted by line slope make positions
    near-monotonic across any zr block (all of a camera's (z, row) image
    lines pass through one vanishing point — the projection of the BEV-x
    direction, z-independent), so ~all live blocks qualify and pass-1's
    dots contract over _WB rows instead of K."""
    A, N, _, ZR = pos.shape
    nb, zrb = min(_NB, N), min(_ZRB, ZR)
    p = pos.reshape(A, N // nb, nb, ZR // zrb, zrb)
    live = p > -2.0
    pmin = jnp.min(jnp.where(live, p, jnp.inf), axis=(2, 4))
    pmax = jnp.max(jnp.where(live, p, -jnp.inf), axis=(2, 4))
    base = jnp.clip((jnp.floor(pmin).astype(jnp.int32) // 8) * 8,
                    0, max(K - _WB, 0))
    win = ((pmax <= base.astype(jnp.float32) + (_WB - 1))
           & jnp.isfinite(pmin))
    return base, win.astype(jnp.int32)          # (A, N/nb, ZR/zrb) each


def _pass1w_kernel(base_ref, win_ref, zsel_ref, pos_ref, feat_ref, out_ref,
                   *, trash):
    # scalar-prefetched base/win/zsel (A, N/nb, ZR/zrb); pos (1, nb, 1,
    # zrb); feat (1, nb, K, C); out (zrb, 1, nb, C)
    a, n, z = pl.program_id(0), pl.program_id(1), pl.program_id(2)
    K = feat_ref.shape[2]
    live = jnp.max(pos_ref[0]) > -2.0
    base = base_ref[a, n, z]
    win = win_ref[a, n, z] > 0
    skipped = zsel_ref[a, n, z] == trash   # writing to the trash block

    @pl.when(live & win)
    def _():
        b0 = base.astype(jnp.float32)
        b8 = pl.multiple_of(base, 8)   # 8-aligned by _block_window
        for j in range(feat_ref.shape[1]):
            wt = _hat_t(pos_ref[0, j], _WB, k0=b0)        # (_WB, zrb)
            out_ref[:, 0, j, :] = jax.lax.dot_general(
                wt, feat_ref[0, j, pl.ds(b8, _WB), :],
                (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).astype(out_ref.dtype)

    @pl.when(live & ~win)
    def _():
        for j in range(feat_ref.shape[1]):
            wt = _hat_t(pos_ref[0, j], K)                 # (K, zrb)
            out_ref[:, 0, j, :] = jax.lax.dot_general(
                wt, feat_ref[0, j], (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).astype(out_ref.dtype)

    @pl.when(~live & ~skipped)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)


def _pass1w(pos, feat_kc):
    """`_pass1` with two block-level shortcuts (both driven by XLA-computed
    scalar-prefetch tables):

    - K-WINDOWED dots (K > _WB): slope-sorted compact rows make each
      block's positions span ~_WB feature rows, so the contraction runs
      over a dynamic _WB-slice instead of all K (`_block_window`).
    - WRITE-SKIPPED dead tails: blocks whose positions are all -4 (every
      row order-killed -> the tmp rows are never read by pass 2) route
      their output-block index to one per-(a, n) TRASH block row, so a
      contiguous dead run costs ONE block flush instead of one per z-block
      — at base scale ~half of tmpA's zero-writes disappear.  Band-dead
      blocks (-2) still write zeros: pass-2 border taps read them."""
    A, N, K, C = feat_kc.shape
    ZR = pos.shape[3]
    nb, zrb = min(_NB, N), min(_ZRB, ZR)
    nzb = ZR // zrb
    base, win = _block_window(pos, K)
    p = pos.reshape(A, N // nb, nb, ZR // zrb, zrb)
    wskip = jnp.max(p, axis=(2, 4)) <= -3.0        # all order-killed
    zidx = jax.lax.broadcasted_iota(jnp.int32, wskip.shape, 2)
    # z-block 0 is NEVER routed to trash: every dead zr row's pass-2 index
    # map reads compact row 0 (`_compact_order`), and for a camera with ZERO
    # live rows in this order compact row 0 is itself dead — if its block
    # were write-skipped, pass-2 would contract 0-weights against
    # UNINITIALISED memory, which is only correct while the stale bits
    # happen to be finite (0 * NaN = NaN).  This was the r4 turbo eval
    # failure: all-NaN occ logits whenever the buffer previously held NaN
    # bit patterns (SYNTH_BENCH RayIoU 4e-05, bit-identical across
    # checkpoints).  One zero-written block per (a, n) is the entire cost.
    zsel = jnp.where(wskip & (zidx > 0), nzb, zidx)  # (A, N/nb, ZR/zrb)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(A, N // nb, ZR // zrb),
        in_specs=[
            pl.BlockSpec((1, nb, 1, zrb),
                         lambda a, n, z, bb, ww, zs: (a, n, 0, z),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nb, K, C),
                         lambda a, n, z, bb, ww, zs: (a, n, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((zrb, 1, nb, C),
                               lambda a, n, z, bb, ww, zs: (zs[a, n, z],
                                                            a, n, 0),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        functools.partial(_pass1w_kernel, trash=nzb),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((ZR + zrb, A, N, C), jnp.bfloat16),
        interpret=_interpret(),
    )(base, win, zsel, pos, feat_kc)
    # the trash block row [ZR:] is garbage and never read: pass-2's compact
    # row indices are < ZR by construction — hand the padded buffer on
    # as-is (slicing would copy ~1 GB at level 0)
    return out


def _pass1_bwd_kernel(sp_ref, pos_ref, g_ref, out_ref):
    # sp: unused scalar-prefetch (see _pass1_bwd); pos (1, nb, 1, zrb);
    # g (zrb, 1, nb, C); out (1, nb, K, C), accumulated over the zr grid
    # dimension (innermost; block index ignores it)
    del sp_ref
    K = out_ref.shape[2]
    zc = pl.program_id(2)

    @pl.when(zc == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    live = jnp.max(pos_ref[0]) > -2.0

    @pl.when(live)
    def _():
        for j in range(out_ref.shape[1]):
            wt = _hat_t(pos_ref[0, j], K)          # (K, zrb)
            out_ref[0, j] += jnp.dot(
                wt, g_ref[:, 0, j, :].astype(jnp.bfloat16),
                preferred_element_type=jnp.float32).astype(out_ref.dtype)


def _pass1_bwd(sp, pos, g_tmp, K):
    """Transpose of `_pass1`: g (ZR_pad, A, N_pad, C) -> dfeat_kc
    (A, N_pad, K, C) f32.

    ``sp`` is a BATCHED int32 array used ONLY as a scalar-prefetch operand:
    this kernel reads `pl.program_id` and revisits its output block across
    the innermost grid axis, and jax's regular pallas vmap rule PREPENDS a
    batch grid dimension — which silently shifts every program_id and turns
    the zero-init/accumulate logic into gradient corruption at B >= 2.  A
    batch-mapped scalar-prefetch operand forces the `_batch_with_explicit_
    loop` fallback (one unbatched call per batch element), under which the
    kernel's grid assumptions hold.  (`_pass1w`/`_pass2_compact` are safe
    for the same reason: their real scalar tables are batch-mapped.)"""
    ZR, A, N, C = g_tmp.shape
    nb, zrb = min(_NB, N), min(_ZRB, ZR)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(A, N // nb, ZR // zrb),
        in_specs=[
            pl.BlockSpec((1, nb, 1, zrb), lambda a, n, z, sp: (a, n, 0, z),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((zrb, 1, nb, C), lambda a, n, z, sp: (z, a, n, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, nb, K, C),
                               lambda a, n, z, sp: (a, n, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        _pass1_bwd_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((A, N, K, C), jnp.float32),
        interpret=_interpret(),
    )(sp, pos, g_tmp)


# ---------------------------------------------------------------------------
# pass-1 order compaction: move each camera's live zr rows (rows whose pass
# order is this kernel's order AND that are camera-visible) into a dense
# prefix, so the ~50% of pass-1 blocks that used to be MIXED live/dead become
# fully live or fully dead — and the fully dead tail is skipped by the
# existing block predication.  This is ROADMAP "order compaction": each
# (cam, z, row) consumes exactly ONE of tmpA/tmpB, so compacted pass-1 does
# half the dots of the uncompacted form.
#
# The permutation is applied to the per-zr LINE COEFFICIENTS inside
# `_plane_positions` (a ZR-length gather, ~free) BEFORE the outer product
# with the image axis — permuting the expanded (N_pad, ZR) position arrays
# instead costs ~1.7 ms of XLA gather per array (measured), which ate most
# of the compaction win in the first cut.
# ---------------------------------------------------------------------------


def _compact_order(live, slope):
    """live (ZR,) bool, slope (ZR,) f32 -> (perm, inv_fill) int32.

    ``perm`` sorts zr rows live-first with live rows ordered by LINE SLOPE
    (compact row i holds original row perm[i]); ``inv_fill[zr]`` is the
    compact row holding original row zr, with dead rows repeating the
    previous live row's index — consecutive equal block indices make the
    pass-2 pipeline skip the re-fetch DMA for the unused slab.

    Slope order is what makes `_pass1w`'s K-windows tight: all of a
    camera's lines pass (numerically almost) through one vanishing point,
    so at every image column the position is monotone in the slope — any
    zr block of live rows spans only ~(zrb / n_live) * K feature rows."""
    key = jnp.where(live, slope, jnp.inf)                 # dead rows last
    perm = jnp.argsort(key, stable=True)
    inv_pos = jnp.argsort(perm).astype(jnp.int32)
    # Dead rows' pass-2 weights are all zero (pos2 is -2 wherever the row
    # is dead in this order), so they may read ANY in-range compact row;
    # row 0 keeps dead runs on one block so the pipeline skips the
    # re-fetch DMA.  (A running-max forward fill — the live-first-sort
    # trick — would corrupt live mappings here: slope order is not
    # monotone in the original index.)
    return perm, jnp.where(live, inv_pos, 0)


# ---------------------------------------------------------------------------
# pass 2: resample along the image lines onto BEV columns; camera sum +
# visibility-count normalisation folded in
# ---------------------------------------------------------------------------


def _pass2_w_all(p2a_ref, p2b_ref, A, w, h):
    """Concatenated hat weights (A*(w+h), M) so the whole camera sum is ONE
    MXU contraction."""
    was = [_hat_t(p2a_ref[0, a:a + 1, :], w) for a in range(A)]
    wbs = [_hat_t(p2b_ref[0, a:a + 1, :], h) for a in range(A)]
    return jnp.concatenate(was + wbs, axis=0)


def _pass2_kernel(p2a_ref, p2b_ref, inv_ref, ta_ref, tb_ref, out_ref):
    # p2a/p2b (1, A, M); inv (1, 1, M); tmpA (1, A, w, C); tmpB (1, A, h, C);
    # out (1, M, C)
    A = ta_ref.shape[1]
    w, h = ta_ref.shape[2], tb_ref.shape[2]
    C = out_ref.shape[2]
    w_all = _pass2_w_all(p2a_ref, p2b_ref, A, w, h)     # (A*(w+h), M)
    t_all = jnp.concatenate(
        [ta_ref[0].reshape(A * w, C), tb_ref[0].reshape(A * h, C)], axis=0)
    acc = jax.lax.dot_general(
        w_all, t_all, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)             # (M, C)
    inv = jnp.transpose(inv_ref[0])                     # (M, 1)
    out_ref[0] = (acc * inv).astype(out_ref.dtype)


def _pass2(pos2A, pos2B, inv_count, tmpA, tmpB, ZR, bev_h, out_dtype):
    """pos2A/B (ZR_pad, A, M), inv_count (bev_h, 1, M),
    tmpA (ZR_pad, A, w_pad, C), tmpB (ZR_pad, A, h_pad, C)
    -> out (ZR, M, C) (only real zr rows are computed)."""
    A, w = tmpA.shape[1], tmpA.shape[2]
    h, C = tmpB.shape[2], tmpB.shape[3]
    M = pos2A.shape[2]
    return pl.pallas_call(
        _pass2_kernel,
        grid=(ZR,),
        in_specs=[
            pl.BlockSpec((1, A, M), lambda zr: (zr, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, A, M), lambda zr: (zr, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, M), lambda zr: (zr % bev_h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, A, w, C), lambda zr: (zr, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, A, h, C), lambda zr: (zr, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, M, C), lambda zr: (zr, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((ZR, M, C), out_dtype),
        interpret=_interpret(),
    )(pos2A, pos2B, inv_count, tmpA, tmpB)


def _pass2_compact(pos2A, pos2B, inv_count, invA, invB, tmpA, tmpB, ZR,
                   bev_h, out_dtype):
    """`_pass2` over per-camera COMPACTED tmp buffers.

    tmpA/tmpB rows follow each camera's own live-first permutation, so the
    row holding output zr differs per camera: the tmp arrays are passed once
    per camera with a scalar-prefetched index map (invA/invB (A, ZRp) int32)
    selecting that camera's slab.  The kernel's math (one MXU contraction
    over the concatenated camera slabs) is identical to `_pass2`."""
    ZRp, A, M = pos2A.shape
    w, C = tmpA.shape[2], tmpA.shape[3]
    h = tmpB.shape[2]

    def kernel(ia_ref, ib_ref, p2a_ref, p2b_ref, inv_ref, *refs):
        del ia_ref, ib_ref
        tas, tbs, out_ref = refs[:A], refs[A:2 * A], refs[2 * A]
        w_all = _pass2_w_all(p2a_ref, p2b_ref, A, w, h)     # (A*(w+h), M)
        t_all = jnp.concatenate(
            [r[0, 0] for r in tas] + [r[0, 0] for r in tbs], axis=0)
        acc = jax.lax.dot_general(
            w_all, t_all, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)             # (M, C)
        inv = jnp.transpose(inv_ref[0])                     # (M, 1)
        out_ref[0] = (acc * inv).astype(out_ref.dtype)

    def _cam_map(a):
        def im(zr, ia, ib, _a=a):
            return (ia[_a, zr], _a, 0, 0)

        def im_b(zr, ia, ib, _a=a):
            return (ib[_a, zr], _a, 0, 0)

        return im, im_b

    specs_a, specs_b = [], []
    for a in range(A):
        im, im_b = _cam_map(a)
        specs_a.append(pl.BlockSpec((1, 1, w, C), im,
                                    memory_space=pltpu.VMEM))
        specs_b.append(pl.BlockSpec((1, 1, h, C), im_b,
                                    memory_space=pltpu.VMEM))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(ZR,),
        in_specs=[
            pl.BlockSpec((1, A, M), lambda zr, ia, ib: (zr, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, A, M), lambda zr, ia, ib: (zr, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, M), lambda zr, ia, ib: (zr % bev_h, 0, 0),
                         memory_space=pltpu.VMEM),
        ] + specs_a + specs_b,
        out_specs=pl.BlockSpec((1, M, C), lambda zr, ia, ib: (zr, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((ZR, M, C), out_dtype),
        interpret=_interpret(),
    )(invA, invB, pos2A, pos2B, inv_count, *([tmpA] * A), *([tmpB] * A))


def _pass2_bwd_kernel(p2a_ref, p2b_ref, inv_ref, g_ref, da_ref, db_ref):
    # g (1, M, C) -> dtmpA (1, A, w, C), dtmpB (1, A, h, C)
    A = da_ref.shape[1]
    w, h = da_ref.shape[2], db_ref.shape[2]
    C = g_ref.shape[2]
    inv = jnp.transpose(inv_ref[0])                 # (M, 1)
    g = (g_ref[0].astype(jnp.float32) * inv).astype(jnp.bfloat16)
    w_all = _pass2_w_all(p2a_ref, p2b_ref, A, w, h)     # (A*(w+h), M)
    d_all = jnp.dot(w_all, g,
                    preferred_element_type=jnp.float32)  # (A*(w+h), C)
    da_ref[0] = d_all[:A * w].reshape(A, w, C).astype(da_ref.dtype)
    db_ref[0] = d_all[A * w:].reshape(A, h, C).astype(db_ref.dtype)


def _pass2_bwd(pos2A, pos2B, inv_count, g_pad, w, h, bev_h):
    """Transpose of `_pass2` over the PADDED zr range (g rows beyond the real
    ZR are zero, and padded positions produce zero weights, so padded dtmp
    rows come out exactly zero for `_pass1_bwd` to consume)."""
    ZRp, A, M = pos2A.shape
    C = g_pad.shape[-1]
    return pl.pallas_call(
        _pass2_bwd_kernel,
        grid=(ZRp,),
        in_specs=[
            pl.BlockSpec((1, A, M), lambda zr: (zr, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, A, M), lambda zr: (zr, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, M), lambda zr: (zr % bev_h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, M, C), lambda zr: (zr, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, A, w, C), lambda zr: (zr, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, A, h, C), lambda zr: (zr, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((ZRp, A, w, C), jnp.bfloat16),
            jax.ShapeDtypeStruct((ZRp, A, h, C), jnp.bfloat16),
        ],
        interpret=_interpret(),
    )(pos2A, pos2B, inv_count, g_pad)


# ---------------------------------------------------------------------------
# level-lift with custom VJP (linear in feat; positions are geometry, no grad)
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(10, 11, 12, 13))
def lift_level(feat, posA_c, posB_c, invA, invB, posA, posB, pos2A, pos2B,
               inv_count, ZR, bev_h, out_dtype, hw):
    """One FPN level, one batch element: camera-summed, count-normalised lift.

    feat (A, h, w, C) bf16; posA_c/posA (A, w_pad, 1, ZR_pad);
    posB_c/posB (A, h_pad, 1, ZR_pad); invA/invB (A, ZR) int32 compact-row
    maps; pos2A/pos2B (ZR_pad, A, M) (padded rows -2); inv_count
    (bev_h, 1, M); hw = (h, w) static.  Returns (ZR, M, C).

    Forward runs order-compacted: each camera's pass-1 rows arrive permuted
    live-first (`_compact_order`, applied to the line coefficients in
    `_plane_positions`) so the dead-order half of pass-1 is a
    predication-skipped tail, and pass-2 routes rows via the
    scalar-prefetched invA/invB maps.  The backward keeps the uncompacted
    formulation and consumes the original-order posA/posB (dead in the
    forward — XLA drops them in inference graphs)."""
    h, w = hw
    w_pad, h_pad = posA_c.shape[1], posB_c.shape[1]
    featT = _pad_axis(jnp.swapaxes(feat, 1, 2), 1, w_pad, 0)  # (A,w_pad,h,C)
    featB = _pad_axis(feat, 1, h_pad, 0)                      # (A,h_pad,w,C)
    p1a = _pass1w if h > _WB else _pass1
    p1b = _pass1w if w > _WB else _pass1
    tmpA = p1a(posA_c, featT)                  # (ZR_pad, A, w_pad, C)
    tmpB = p1b(posB_c, featB)                  # (ZR_pad, A, h_pad, C)
    return _pass2_compact(pos2A, pos2B, inv_count, invA, invB, tmpA, tmpB,
                          ZR, bev_h, jnp.dtype(out_dtype))


def _lift_level_fwd(feat, posA_c, posB_c, invA, invB, posA, posB, pos2A,
                    pos2B, inv_count, ZR, bev_h, out_dtype, hw):
    out = lift_level(feat, posA_c, posB_c, invA, invB, posA, posB, pos2A,
                     pos2B, inv_count, ZR, bev_h, out_dtype, hw)
    return out, (invA, invB, posA, posB, pos2A, pos2B, inv_count)


def _lift_level_bwd(ZR, bev_h, out_dtype, hw, res, g):
    invA, invB, posA, posB, pos2A, pos2B, inv_count = res
    h, w = hw
    w_pad, h_pad = posA.shape[1], posB.shape[1]
    ZRp = posA.shape[3]
    g_pad = _pad_axis(g.astype(jnp.bfloat16), 0, ZRp, 0)
    g_tmpA, g_tmpB = _pass2_bwd(pos2A, pos2B, inv_count, g_pad, w_pad, h_pad,
                                bev_h)
    # order A resamples over image y (K = h); order B over image x (K = w).
    # invA/invB serve as the batch-mapped scalar-prefetch operand that keeps
    # `_pass1_bwd` vmap-safe (see its docstring) — their values are unused.
    dfeatT = _pass1_bwd(invA, posA, g_tmpA, h)      # (A, w_pad, h, C)
    dfeatB = _pass1_bwd(invB, posB, g_tmpB, w)      # (A, h_pad, w, C)
    dfeat = (jnp.swapaxes(dfeatT, 1, 2)[:, :, :w, :]
             + dfeatB[:, :h, :, :]).astype(jnp.bfloat16)

    def zeros(x):
        # int inputs (invA/invB) take float0 tangents per the custom_vjp
        # contract; float inputs take ordinary zeros
        if jnp.issubdtype(x.dtype, jnp.integer):
            import numpy as np
            return np.zeros(x.shape, jax.dtypes.float0)
        return jnp.zeros_like(x)

    return (dfeat, zeros(posA), zeros(posB), zeros(invA), zeros(invB),
            zeros(posA), zeros(posB), zeros(pos2A), zeros(pos2B),
            zeros(inv_count))


lift_level.defvjp(_lift_level_fwd, _lift_level_bwd)


# ---------------------------------------------------------------------------
# position construction (XLA, fp32 — cheap elementwise geometry)
# ---------------------------------------------------------------------------


def _plane_positions(Mz: jax.Array, bev_hw: Tuple[int, int], h: int, w: int,
                     eps: float = 1e-4):
    """Positions for one camera, all z planes.  Mz (Z, 3, 3) feature-pixel
    homographies.  Same geometry as `planar_lift.warp_level_multi_z`.

    Returns posA_c/posB_c ((w|h), ZR) in live-first compact zr order,
    invA/invB (ZR,) int32 compact-row maps for pass 2, posA/posB in original
    order (backward only), pos2A/pos2B (ZR, M), valid (Z, bev_h, bev_w)."""
    bev_h, bev_w = bev_hw
    Z = Mz.shape[0]
    f32 = jnp.float32
    ix = jnp.arange(bev_w, dtype=f32)
    iy = jnp.arange(bev_h, dtype=f32)
    xs = jnp.arange(w, dtype=f32)
    ygrid = jnp.arange(h, dtype=f32)

    px = (Mz[:, 0, 0, None, None] * ix[None, None, :]
          + Mz[:, 0, 1, None, None] * iy[None, :, None]
          + Mz[:, 0, 2, None, None])
    py = (Mz[:, 1, 0, None, None] * ix[None, None, :]
          + Mz[:, 1, 1, None, None] * iy[None, :, None]
          + Mz[:, 1, 2, None, None])
    pw = (Mz[:, 2, 0, None, None] * ix[None, None, :]
          + Mz[:, 2, 1, None, None] * iy[None, :, None]
          + Mz[:, 2, 2, None, None])
    in_front = pw > eps
    xf = px / jnp.where(in_front, pw, eps)
    yf = py / jnp.where(in_front, pw, eps)
    valid = (in_front & (xf > -0.5) & (xf < w - 0.5)
             & (yf > -0.5) & (yf < h - 0.5))

    p_inf = Mz[:, :, 0]
    p_r = Mz[:, None, :, 1] * iy[None, :, None] + Mz[:, None, :, 2]
    line = jnp.cross(jnp.broadcast_to(p_inf[:, None, :], p_r.shape), p_r)
    l0, l1, l2 = line[..., 0], line[..., 1], line[..., 2]   # (Z, bev_h)
    steep = jnp.abs(l1) < jnp.abs(l0)
    safe = lambda d: jnp.where(jnp.abs(d) < 1e-8,           # noqa: E731
                               jnp.where(d < 0, -1e-8, 1e-8), d)
    a = -l0 / safe(l1)
    b = -l2 / safe(l1)
    a2 = -l1 / safe(l0)
    b2 = -l2 / safe(l0)

    # Row-level kills, exact because pass-2's weights are already zero for
    # these rows: each (z, row) uses exactly ONE pass order (steepness is a
    # line property, independent of the BEV column), and rows no query of
    # which is camera-visible are never read at all.  Killing them here
    # turns pass-1 columns dead so the kernel predication skips their dots.
    row_any = valid.any(axis=-1)                            # (Z, bev_h)
    ZR = Z * bev_h
    liveA = (~steep & row_any).reshape(ZR)
    liveB = (steep & row_any).reshape(ZR)
    permA, invA = _compact_order(liveA, a.reshape(ZR))
    permB, invB = _compact_order(liveB, a2.reshape(ZR))

    def _pos(ca, cb, ks, extent, live, perm=None):
        # -4 marks ORDER-killed rows (pass-2 weights identically zero for
        # every column -> the whole tmp row is unread, so pass-1 may skip
        # even the zero-WRITE for all-(-4) blocks); band-dead columns of
        # live rows stay -2 (their zeros are read at image borders).
        ca, cb = ca.reshape(ZR), cb.reshape(ZR)
        if perm is not None:
            ca, cb, live = ca[perm], cb[perm], live[perm]
        p = _band_limit(ca[None, :] * ks[:, None] + cb[None, :], extent)
        return jnp.where(live[None, :], p, -4.0)            # (N, ZR)

    posA_c = _pos(a, b, xs, h, liveA, permA)     # live-first compact order
    posB_c = _pos(a2, b2, ygrid, w, liveB, permB)
    posA = _pos(a, b, xs, h, liveA)              # original order (backward)
    posB = _pos(a2, b2, ygrid, w, liveB)

    sel_a = valid & ~steep[..., None]
    sel_b = valid & steep[..., None]
    pos2A = jnp.where(sel_a, _band_limit(xf, w), -2.0).reshape(
        Z * bev_h, bev_w)
    pos2B = jnp.where(sel_b, _band_limit(yf, h), -2.0).reshape(
        Z * bev_h, bev_w)
    return posA_c, posB_c, invA, invB, posA, posB, pos2A, pos2B, valid


def lift_and_average_pallas(
    mlvl_feats: Sequence[jax.Array],   # per level (B, cams, h, w, C)
    ego2img: jax.Array,                # (B, cams, 4, 4)
    pc_range: Sequence[float],
    num_z: int,
    bev_hw: Tuple[int, int],
    img_hw: Tuple[int, int],
    out_dtype=jnp.bfloat16,
):
    """Drop-in for `planar_lift.lift_and_average`:
    returns (U_bar (B, L, Z, Q, C) out_dtype, count (B, Q) f32)."""
    z_extent = float(pc_range[5]) - float(pc_range[2])
    z_norm = jnp.linspace(0.5, z_extent - 0.5, num_z) / z_extent
    z_anchors = z_norm * z_extent + float(pc_range[2])
    H = plane_homographies(ego2img.astype(jnp.float32), pc_range, z_anchors,
                           bev_hw)                        # (B, A, Z, 3, 3)
    img_h, img_w = img_hw
    bev_h, bev_w = bev_hw
    Q = bev_h * bev_w
    B = ego2img.shape[0]
    ZR = num_z * bev_h
    ZRp = _round_up(ZR, _ZRB) if ZR > _ZRB else ZR

    u_levels = []
    count = None
    inv_count = None
    for lvl, feat in enumerate(mlvl_feats):
        _, A, h, w, C = feat.shape
        w_pad = _round_up(w, _NB)
        h_pad = _round_up(h, _NB)
        S = jnp.asarray([[w / img_w, 0, -0.5],
                         [0, h / img_h, -0.5],
                         [0, 0, 1.0]], jnp.float32)
        Ml = jnp.einsum("ij,bczjk->bczik", S, H)          # (B, A, Z, 3, 3)
        (posA_c, posB_c, invA, invB, posA, posB, pos2A, pos2B,
         valid) = jax.vmap(jax.vmap(
             lambda m: _plane_positions(m, bev_hw, h, w)))(Ml)

        # kernel layouts + padding (-2 -> empty hat support; zr-tail pad is
        # -4 = order-killed so `_pass1w` may skip even the zero-writes)
        def _pos_pad(p, n_pad):                # (B, A, N, ZR) -> kernel form
            p = _pad_axis(_pad_axis(p, 2, n_pad, -2.0), 3, ZRp, -4.0)
            return p[:, :, :, None, :]         # (B, A, N_pad, 1, ZRp)

        posA_c, posA = _pos_pad(posA_c, w_pad), _pos_pad(posA, w_pad)
        posB_c, posB = _pos_pad(posB_c, h_pad), _pos_pad(posB, h_pad)
        pos2A = _pad_axis(jnp.swapaxes(pos2A, 1, 2), 1, ZRp, -2.0)
        pos2B = _pad_axis(jnp.swapaxes(pos2B, 1, 2), 1, ZRp, -2.0)
        if lvl == 0:
            # count = #cameras in which any z-anchor of the query is visible
            # (finest-level footprint, as the einsum path)
            count = valid.any(axis=2).sum(axis=1).astype(jnp.float32)
            count = jnp.maximum(count, 1.0).reshape(B, Q)
            inv_count = (1.0 / count).reshape(B, bev_h, 1, bev_w)
        out = jax.vmap(
            lambda f, pac, pbc, ia, ib, pa, pb, p2a, p2b, ic: lift_level(
                f.astype(jnp.bfloat16), pac, pbc, ia, ib, pa, pb, p2a, p2b,
                ic, ZR, bev_h, jnp.dtype(out_dtype).name, (h, w)))(
            feat, posA_c, posB_c, invA, invB, posA, posB, pos2A, pos2B,
            inv_count)
        u_levels.append(out.reshape(B, num_z, Q, C))
    U_bar = jnp.stack(u_levels, axis=1).astype(out_dtype)
    return U_bar, count
