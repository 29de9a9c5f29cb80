"""Orbax checkpointing of (params, batch_stats, opt_state, step) + metadata.

Replaces the reference's mmcv CheckpointHook / runner.resume
(`apis/mmdet_train.py:195-198`, `default_runtime.py:1`): per-epoch (or
interval) checkpoints embedding the config, resumable into a TrainState.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any, Optional, Tuple

import jax
import numpy as np
import orbax.checkpoint as ocp

from occnet_tpu.config import OccNetConfig
from occnet_tpu.training.train import TrainState


def _config_json(cfg: OccNetConfig) -> str:
    return json.dumps(dataclasses.asdict(cfg), default=str)


def _env_meta() -> dict:
    """Environment/version metadata embedded in every checkpoint — the
    reference packs env_info + config text + versions + time into
    checkpoint meta (`tools/train.py:177-199,235-245`); this is the JAX
    equivalent (no torch/CUDA fields)."""
    import platform
    import time

    import jaxlib

    dev = jax.devices()[0]
    return {
        "time": time.strftime("%Y-%m-%d %H:%M:%S"),
        "hostname": platform.node(),
        "python": platform.python_version(),
        "jax": jax.__version__,
        "jaxlib": jaxlib.__version__,
        "backend": jax.default_backend(),
        "device_kind": getattr(dev, "device_kind", str(dev)),
        "device_count": jax.device_count(),
        "process_count": jax.process_count(),
    }


def _replicated_mesh():
    from jax.sharding import Mesh
    return Mesh(np.asarray(jax.devices()), ("all",))


def _to_global(tree):
    """Multi-process save support: orbax's save is a collective that rejects
    host-local (single-device) jax.Arrays.  Model/optimizer state is replicated
    across processes (DP), so lift any host-local leaf to a fully-replicated
    global array over a trivial mesh; leaves that are already global (produced
    by a jitted step over the global mesh) pass through untouched."""
    if jax.process_count() == 1:
        return tree
    from jax.experimental import multihost_utils as mh
    from jax.sharding import PartitionSpec

    mesh = _replicated_mesh()

    def go(x):
        if isinstance(x, jax.Array) and x.is_fully_addressable:
            return mh.host_local_array_to_global_array(
                np.asarray(jax.device_get(x)), mesh, PartitionSpec())
        return x

    return jax.tree_util.tree_map(go, tree)


def _global_target(tree):
    """Multi-process restore target: abstract leaves with a fully-replicated
    global sharding (each process reads the full array)."""
    if jax.process_count() == 1:
        return tree
    from jax.sharding import NamedSharding, PartitionSpec

    sharding = NamedSharding(_replicated_mesh(), PartitionSpec())

    def go(x):
        if isinstance(x, jax.Array):
            return jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=sharding)
        return x

    return jax.tree_util.tree_map(go, tree)


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: int = 3):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self.mngr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep,
                                                 create=True),
        )

    def save(self, step: int, state: TrainState,
             cfg: Optional[OccNetConfig] = None, block: bool = False):
        """Checkpoint asynchronously (orbax writes on background threads
        while training continues — the periodic-async-checkpoint design the
        reference lacks); pass block=True or call `wait` for a barrier."""
        payload = _to_global({
            "params": state.params,
            "batch_stats": state.batch_stats,
            "opt_state": state.opt_state,
            "step": state.step,
        })
        args = ocp.args.Composite(
            state=ocp.args.StandardSave(payload),
            **({"meta": ocp.args.JsonSave({"config": _config_json(cfg),
                                           "env": _env_meta()})}
               if cfg else {}),
        )
        self.mngr.save(step, args=args)
        if block:
            self.mngr.wait_until_finished()

    def wait(self):
        """Block until all in-flight async saves are durable."""
        self.mngr.wait_until_finished()

    def restore(self, state: TrainState,
                step: Optional[int] = None) -> TrainState:
        step = step if step is not None else self.mngr.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoint in {self.directory}")
        target = _global_target({
            "params": state.params,
            "batch_stats": state.batch_stats,
            "opt_state": state.opt_state,
            "step": state.step,
        })
        restored = self.mngr.restore(
            step, args=ocp.args.Composite(
                state=ocp.args.StandardRestore(target)))["state"]
        return TrainState(step=restored["step"], params=restored["params"],
                          batch_stats=restored["batch_stats"],
                          opt_state=restored["opt_state"])

    def latest_step(self) -> Optional[int]:
        return self.mngr.latest_step()
