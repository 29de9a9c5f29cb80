"""DETR-style detection decoder with iterative reference-point refinement.

Capability equivalent of the reference's registered-but-unused detection path
(`modules/decoder.py`: `DetectionTransformerDecoder` :52-129 and
`CustomMSDeformableAttention` :132-345, plus the `PerceptionTransformer`
object-query branch `modules/transformer.py:203-289`) — the legacy BEVFormer
3D-detection head the occ configs never invoke.  Provided so users of the
detection path find the same machinery: object queries cross-attend into the
BEV map through single-level deformable attention and refine sigmoid-space
reference points layer by layer.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from occnet_tpu.models.attention import (
    _const_bias_init,
    radial_offset_bias,
    xavier_uniform,
)
from occnet_tpu.models.norm import LayerNorm32
from occnet_tpu.ops.msda import multi_scale_deformable_attention


def inverse_sigmoid(x: jax.Array, eps: float = 1e-5) -> jax.Array:
    x = jnp.clip(x, eps, 1.0 - eps)
    return jnp.log(x / (1.0 - x))


class CustomMSDeformableAttention(nn.Module):
    """Single-value-source deformable attention over the BEV map
    (`decoder.py:132-345`): standard deformable-DETR attention with an output
    projection, 2D (or 4D box-normalised) reference points."""
    embed_dims: int = 256
    num_heads: int = 8
    num_levels: int = 1
    num_points: int = 4
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, query, value, query_pos, reference_points,
                 spatial_shapes, *, deterministic: bool = True):
        B, Q, C = query.shape
        H, L, P = self.num_heads, self.num_levels, self.num_points
        identity = query
        if query_pos is not None:
            query = query + query_pos
        value = nn.Dense(self.embed_dims, dtype=self.dtype,
                         kernel_init=xavier_uniform, name="value_proj")(value)
        value = value.reshape(B, -1, H, self.embed_dims // H)

        offsets = nn.Dense(H * L * P * 2, dtype=self.dtype,
                           kernel_init=nn.initializers.zeros,
                           bias_init=_const_bias_init(
                               radial_offset_bias(H, L, P)),
                           name="sampling_offsets")(query)
        offsets = offsets.reshape(B, Q, H, L, P, 2).astype(jnp.float32)
        attn = nn.Dense(H * L * P, dtype=self.dtype,
                        kernel_init=nn.initializers.zeros,
                        bias_init=nn.initializers.zeros,
                        name="attention_weights")(query)
        attn = jax.nn.softmax(
            attn.reshape(B, Q, H, L * P).astype(jnp.float32), axis=-1)
        attn = attn.reshape(B, Q, H, L, P)

        if reference_points.shape[-1] == 2:
            normalizer = jnp.asarray([[w, h] for h, w in spatial_shapes],
                                     jnp.float32)
            # (B, Q, 2) point reference shared across levels
            loc = reference_points[:, :, None, None, None, :].astype(
                jnp.float32) + offsets / normalizer[None, None, None, :,
                                                    None, :]
        else:   # (cx, cy, w, h) box reference (`decoder.py:331-336`)
            ref = reference_points.astype(jnp.float32)
            loc = ref[:, :, None, None, None, :2] + \
                offsets / P * ref[:, :, None, None, None, 2:] * 0.5
        out = multi_scale_deformable_attention(value, spatial_shapes, loc,
                                               attn)
        out = nn.Dense(self.embed_dims, dtype=self.dtype,
                       kernel_init=xavier_uniform, name="output_proj")(out)
        out = nn.Dropout(self.dropout)(out, deterministic=deterministic)
        return out + identity


class DecoderLayer(nn.Module):
    """self-attn (dense MHA) -> norm -> cross-attn (deformable into BEV) ->
    norm -> FFN -> norm."""
    embed_dims: int
    num_heads: int
    ffn_dim: int
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, query, bev_value, query_pos, reference_points,
                 spatial_shapes, *, deterministic: bool = True):
        ln = lambda n: LayerNorm32(out_dtype=self.dtype, name=n)  # noqa:E731
        q = query + query_pos if query_pos is not None else query
        sa = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads, dtype=self.dtype, name="self_attn")(
            q, q, query)
        query = ln("norm1")(query + sa)
        query = CustomMSDeformableAttention(
            embed_dims=self.embed_dims, num_heads=self.num_heads,
            dtype=self.dtype, name="cross_attn")(
            query, bev_value, query_pos, reference_points, spatial_shapes,
            deterministic=deterministic)
        query = ln("norm2")(query)
        y = nn.Dense(self.ffn_dim, dtype=self.dtype,
                     kernel_init=xavier_uniform, name="ffn_fc1")(query)
        y = nn.relu(y)
        y = nn.Dense(self.embed_dims, dtype=self.dtype,
                     kernel_init=xavier_uniform, name="ffn_fc2")(y)
        query = ln("norm3")(query + y)
        return query


class DetectionTransformerDecoder(nn.Module):
    """Stacked decoder with per-layer sigmoid-space reference refinement
    (`decoder.py:52-129`).

    Two refinement modes, matching the reference's two call shapes:

    - `reg_branches` given + 3D reference points (the `PerceptionTransformer`
      box-refine path, `decoder.py:105-121`): the external per-layer
      regression branch predicts a `code_size` box code and the reference is
      refined as new_xy = code[..., :2] + inv_sigmoid(ref_xy),
      new_z = code[..., 4:5] + inv_sigmoid(ref_z); deformable sampling always
      uses ref[..., :2].
    - no `reg_branches` (standalone use): an internal zero-init Dense(2)
      refines the 2D reference directly.

    Offset-by-one convention (matches the reference decoder, which a future
    detection head MUST respect): `inter_references[lvl]` is the
    POST-refinement reference of layer `lvl`, so when decoding layer `lvl`'s
    box code the head must pair `reg_branches[lvl](inter_states[lvl])` with
    the reference the layer SAW — `init_reference` for lvl 0, else
    `inter_references[lvl - 1]` (the reference BEVFormerHead convention);
    pairing with `inter_references[lvl]` double-refines the boxes.
    `models/bbox.decode_layer_boxes` implements the correct pairing and is
    regression-tested in `tests/test_decoder.py`.
    """
    num_layers: int = 6
    embed_dims: int = 256
    num_heads: int = 8
    ffn_dim: int = 512
    return_intermediate: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, query, bev_value, query_pos, reference_points,
                 spatial_shapes, *, reg_branches=None,
                 deterministic: bool = True):
        inter_states = []
        inter_refs = []
        ref = reference_points
        for lid in range(self.num_layers):
            query = DecoderLayer(
                self.embed_dims, self.num_heads, self.ffn_dim,
                dtype=self.dtype, name=f"layer{lid}")(
                query, bev_value, query_pos, ref[..., :2], spatial_shapes,
                deterministic=deterministic)
            if reg_branches is not None:
                assert ref.shape[-1] == 3, ref.shape
                tmp = reg_branches[lid](query.astype(jnp.float32))
                new_xy = tmp[..., :2] + inverse_sigmoid(ref[..., :2])
                new_z = tmp[..., 4:5] + inverse_sigmoid(ref[..., 2:3])
                ref = jax.nn.sigmoid(jnp.concatenate([new_xy, new_z], -1))
            else:
                delta = nn.Dense(2, dtype=jnp.float32,
                                 kernel_init=nn.initializers.zeros,
                                 name=f"ref_refine{lid}")(
                    query.astype(jnp.float32))
                ref = jax.nn.sigmoid(delta + inverse_sigmoid(ref))
            ref = jax.lax.stop_gradient(ref)
            inter_states.append(query)
            inter_refs.append(ref)
        if self.return_intermediate:
            return jnp.stack(inter_states), jnp.stack(inter_refs)
        return query, ref
