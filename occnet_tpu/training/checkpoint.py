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
import orbax.checkpoint as ocp

from occnet_tpu.config import OccNetConfig
from occnet_tpu.training.train import TrainState


def _config_json(cfg: OccNetConfig) -> str:
    return json.dumps(dataclasses.asdict(cfg), default=str)


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
        payload = {
            "params": state.params,
            "batch_stats": state.batch_stats,
            "opt_state": state.opt_state,
            "step": state.step,
        }
        args = ocp.args.Composite(
            state=ocp.args.StandardSave(payload),
            **({"meta": ocp.args.JsonSave({"config": _config_json(cfg)})}
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
        target = {
            "params": state.params,
            "batch_stats": state.batch_stats,
            "opt_state": state.opt_state,
            "step": state.step,
        }
        restored = self.mngr.restore(
            step, args=ocp.args.Composite(
                state=ocp.args.StandardRestore(target)))["state"]
        return TrainState(step=restored["step"], params=restored["params"],
                          batch_stats=restored["batch_stats"],
                          opt_state=restored["opt_state"])

    def latest_step(self) -> Optional[int]:
        return self.mngr.latest_step()
