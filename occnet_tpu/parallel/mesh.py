"""Device mesh + sharding layout.

TPU-native replacement for the reference's NCCL/DDP distributed backend
(SURVEY.md section 2.7): one global `jax.sharding.Mesh` with a `data` axis
(batch/DP — ICI within a slice, DCN across slices) and a `model` axis (spare
axis for BEV-row / camera sharding).  Gradient mean-reduction is implicit: the
train step is jitted over globally-sharded arrays and XLA inserts the
all-reduce that DDP (`apis/mmdet_train.py:75-79`) does by hook.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(dp: int = -1, mp: int = 1,
              devices: Optional[list] = None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if dp == -1:
        assert n % mp == 0, (n, mp)
        dp = n // mp
    assert dp * mp == n, f"mesh {dp}x{mp} != {n} devices"
    dev_array = np.asarray(devices).reshape(dp, mp)
    return Mesh(dev_array, axis_names=("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis (batch) sharding over the data axis."""
    return NamedSharding(mesh, P("data"))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: dict, mesh: Mesh) -> dict:
    """Place a host-side batch dict onto the mesh, batch-axis sharded."""
    sh = batch_sharding(mesh)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sh), batch)
