"""Positional encodings for the BEV query grid.

`LearnedPositionalEncoding2D` mirrors mmdet's `LearnedPositionalEncoding`
(instantiated by the reference config `bevformer_base_occ.py:130-135`):
separate row/column embedding tables, channels = [col_embed, row_embed].
`LearnedPositionalEncoding3D` mirrors the reference's registered-but-unused
3D variant (`models/utils/positional_encoding.py:9-62`) for the capability
surface.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


class LearnedPositionalEncoding2D(nn.Module):
    num_feats: int          # per-axis channels (embed_dims // 2)
    row_num_embed: int
    col_num_embed: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, batch: int) -> jax.Array:
        """Returns (batch, H*W, 2*num_feats) position features, rows-major."""
        row = self.param("row_embed", nn.initializers.uniform(scale=1.0),
                         (self.row_num_embed, self.num_feats))
        col = self.param("col_embed", nn.initializers.uniform(scale=1.0),
                         (self.col_num_embed, self.num_feats))
        h, w = self.row_num_embed, self.col_num_embed
        pos = jnp.concatenate(
            [jnp.broadcast_to(col[None, :, :], (h, w, self.num_feats)),
             jnp.broadcast_to(row[:, None, :], (h, w, self.num_feats))],
            axis=-1)
        pos = pos.reshape(h * w, 2 * self.num_feats).astype(self.dtype)
        return jnp.broadcast_to(pos[None], (batch, h * w, 2 * self.num_feats))


class LearnedPositionalEncoding3D(nn.Module):
    """Row/col/height learned embedding (capability parity with the
    reference's `LearnedPositionalEncoding3D`)."""
    num_feats: int
    row_num_embed: int
    col_num_embed: int
    height_num_embed: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, batch: int) -> jax.Array:
        row = self.param("row_embed", nn.initializers.uniform(scale=1.0),
                         (self.row_num_embed, self.num_feats))
        col = self.param("col_embed", nn.initializers.uniform(scale=1.0),
                         (self.col_num_embed, self.num_feats))
        hei = self.param("height_embed", nn.initializers.uniform(scale=1.0),
                         (self.height_num_embed, self.num_feats))
        h, w, z = self.row_num_embed, self.col_num_embed, self.height_num_embed
        pos = jnp.concatenate([
            jnp.broadcast_to(col[None, :, None, :], (h, w, z, self.num_feats)),
            jnp.broadcast_to(row[:, None, None, :], (h, w, z, self.num_feats)),
            jnp.broadcast_to(hei[None, None, :, :], (h, w, z, self.num_feats)),
        ], axis=-1)
        pos = pos.reshape(h * w * z, 3 * self.num_feats).astype(self.dtype)
        return jnp.broadcast_to(pos[None], (batch,) + pos.shape)


class RelPositionEmbedding(nn.Module):
    """sin/cos 2D relative position features + MLP — equivalent of the
    reference's (unused) `RelPositionEmbedding`
    (`models/utils/position_embedding.py:5-34`)."""
    num_pos_feats: int = 64
    out_dim: int = 256
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, h: int, w: int) -> jax.Array:
        half = self.num_pos_feats // 2
        freqs = 1.0 / (10000.0 ** (jnp.arange(half) / max(half - 1, 1)))
        ys = (jnp.arange(h, dtype=jnp.float32) / h)[:, None] * freqs[None, :]
        xs = (jnp.arange(w, dtype=jnp.float32) / w)[:, None] * freqs[None, :]
        y_feat = jnp.concatenate([jnp.sin(ys), jnp.cos(ys)], axis=-1)
        x_feat = jnp.concatenate([jnp.sin(xs), jnp.cos(xs)], axis=-1)
        pos = jnp.concatenate([
            jnp.broadcast_to(x_feat[None, :, :], (h, w, self.num_pos_feats)),
            jnp.broadcast_to(y_feat[:, None, :], (h, w, self.num_pos_feats)),
        ], axis=-1).reshape(h * w, 2 * self.num_pos_feats)
        return nn.Dense(self.out_dim, dtype=self.dtype, name="proj")(
            pos.astype(self.dtype))
