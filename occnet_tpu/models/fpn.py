"""FPN neck (flax.linen, NHWC).

Equivalent of the reference's mmdet FPN config
(`projects/configs/bevformer/bevformer_base_occ.py:59-66`): 3 input levels
(C3/C4/C5 of ResNet) -> 4 output levels at 256 channels, top-down pathway with
nearest-neighbour upsampling, `add_extra_convs='on_output'` with
`relu_before_extra_convs=True` for the extra stride-2 level.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp


def _upsample_nearest_2x(x: jax.Array) -> jax.Array:
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    return x.reshape(b, h * 2, w * 2, c)


class FPN(nn.Module):
    out_channels: int = 256
    num_outs: int = 4
    relu_before_extra_convs: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, inputs: Sequence[jax.Array]) -> Sequence[jax.Array]:
        n_in = len(inputs)
        # Xavier-uniform conv init matches mmcv FPN's default init.
        conv = lambda k, name: nn.Conv(  # noqa: E731
            self.out_channels, (k, k), padding=[(k // 2, k // 2)] * 2,
            dtype=self.dtype, name=name,
            kernel_init=nn.initializers.xavier_uniform())
        laterals = [conv(1, f"lateral_{i}")(x) for i, x in enumerate(inputs)]
        for i in range(n_in - 1, 0, -1):
            up = _upsample_nearest_2x(laterals[i])
            # Guard odd spatial dims: crop to the lateral's shape.
            up = up[:, : laterals[i - 1].shape[1], : laterals[i - 1].shape[2]]
            laterals[i - 1] = laterals[i - 1] + up
        outs = [conv(3, f"fpn_{i}")(laterals[i]) for i in range(n_in)]
        # Extra levels from the last output ('on_output').
        for i in range(self.num_outs - n_in):
            src = outs[-1]
            if self.relu_before_extra_convs and i > 0:
                src = nn.relu(src)
            outs.append(
                nn.Conv(self.out_channels, (3, 3), strides=(2, 2),
                        padding=[(1, 1), (1, 1)], dtype=self.dtype,
                        name=f"fpn_extra_{i}",
                        kernel_init=nn.initializers.xavier_uniform())(src))
        return outs
