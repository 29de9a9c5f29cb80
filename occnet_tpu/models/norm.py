"""Normalisation layers.

`LayerNorm32` is a hand-rolled last-axis LayerNorm computed in fp32 (the
reference keeps LN in fp32 islands under AMP).  It exists instead of
flax.linen.LayerNorm because the fused multi-axis reduce flax emits in its
VJP triggers a libtpu AOT compiler bug on this toolchain ("Expected
instruction to have shape equal to f32[8,16] ..." during post-optimization);
explicit single-axis means avoid that pattern.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


class LayerNorm32(nn.Module):
    eps: float = 1e-5
    out_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        features = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (features,))
        bias = self.param("bias", nn.initializers.zeros, (features,))
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        xc = xf - mean
        var = jnp.mean(xc * xc, axis=-1, keepdims=True)
        y = xc * jax.lax.rsqrt(var + self.eps)
        return (y * scale + bias).astype(self.out_dtype)
