"""GridMask augmentation as a jittable masking op.

Equivalent of the reference's `GridMask.forward` (`models/utils/grid_mask.py:
84-124`, instantiated with use_h=use_w=True, rotate=1, offset=False,
ratio=0.5, mode=1, prob=0.7 at `bevformer_occ.py:52-53`).  The reference
builds the mask with host-side numpy/PIL per batch; here the same mask is
expressed in modular arithmetic so it traces: with grid period d, strip length
l = clip(int(0.5*d + 0.5), 1, d-1), random phases st_h/st_w on a 1.5x canvas
cropped centrally, mode=1 keeps pixels inside a row-strip OR column-strip.
Note rotate=1 makes the reference's random rotation always 0 degrees
(np.random.randint(1) == 0), so no rotation is needed.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def grid_mask(
    key: jax.Array,
    imgs: jax.Array,          # (N, H, W, C)
    prob: float = 0.7,
    ratio: float = 0.5,
) -> jax.Array:
    n, h, w, c = imgs.shape
    k_apply, k_d, k_sh, k_sw = jax.random.split(key, 4)

    apply = jax.random.uniform(k_apply) < prob
    d = jax.random.randint(k_d, (), 2, h)
    l = jnp.clip((d.astype(jnp.float32) * ratio + 0.5).astype(jnp.int32),
                 1, d - 1)
    st_h = jax.random.randint(k_sh, (), 0, d)
    st_w = jax.random.randint(k_sw, (), 0, d)

    hh = (3 * h) // 2
    ww = (3 * w) // 2
    off_h = (hh - h) // 2
    off_w = (ww - w) // 2

    ys = jnp.arange(h) + off_h
    xs = jnp.arange(w) + off_w
    # A pixel is inside a strip iff (coord - phase) mod d < l and coord >=
    # phase (strips start at st + d*i for i >= 0 on the canvas; phases are in
    # [0, d) and canvas coords are >= 0, so coord >= phase is subsumed for
    # i >= 0 by the mod test once coord >= st; st < d <= off guard is benign).
    row_strip = ((ys - st_h) % d) < l
    col_strip = ((xs - st_w) % d) < l
    keep = row_strip[:, None] | col_strip[None, :]        # mode=1
    mask = jnp.where(apply, keep, True)
    return imgs * mask[None, :, :, None].astype(imgs.dtype)
