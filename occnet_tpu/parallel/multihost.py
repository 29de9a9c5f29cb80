"""Multi-host (multi-process) runtime support.

TPU-native replacement for the reference's process-group machinery
(SURVEY.md section 2.7): `init_dist(launcher, backend='nccl')`
(`tools/train.py:163-171`), the DDP wrap (`apis/mmdet_train.py:75-79`), and
the tmpdir-pickle eval collector (`apis/test.py:89-133`).

- `initialize()` wraps `jax.distributed.initialize` with env-derived defaults
  (a no-op on single-process runs and on TPU pods where the runtime
  autodetects peers).  After it, `jax.devices()` is the GLOBAL device list
  and the usual `make_mesh()` spans all hosts.
- `process_shard()` gives (shard, num_shards) for the deterministic index
  samplers (`data/sampler.py`) — each process loads only its shard, the
  TPU-native analogue of DistributedGroupSampler rank sharding.
- `global_batch()` assembles per-process host arrays into one globally
  sharded jax.Array on the mesh's data axis (replacing per-rank DDP feeding).
- `allgather_host()` is the eval-result collector: fetches a pytree from all
  processes onto every host (replacing `collect_results_cpu`'s
  broadcast+barrier+pickle dance).
- `barrier()` = `dist.barrier` equivalent.
"""

from __future__ import annotations

import os
from typing import Any, Optional, Tuple

import jax
import numpy as np


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> bool:
    """Initialise cross-host JAX.  Arguments default to the standard env vars
    (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID); returns
    True if distributed mode was initialised.

    On Cloud TPU pods all three are autodetected and may stay None; on CPU/GPU
    fleets they must be provided (the analogue of the reference's
    MASTER_ADDR/RANK env protocol, `tools/dist_train.sh:9-11`)."""
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS")
    if num_processes is None and "JAX_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and "JAX_PROCESS_ID" in os.environ:
        process_id = int(os.environ["JAX_PROCESS_ID"])
    if jax.distributed.is_initialized():
        return True         # idempotent re-entry
    if coordinator_address is None and num_processes is None:
        # no explicit coordination requested: single host, or a TPU-pod
        # runtime that auto-detects peers on first backend use.  NOTE this
        # is the only branch that may touch the backend — with explicit
        # arguments we must NOT (jax.process_count() would initialise XLA
        # and make distributed.initialize impossible).
        return jax.process_count() > 1
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id)
    return True


def process_shard() -> Tuple[int, int]:
    """(shard index, shard count) for host-side data loading."""
    return jax.process_index(), jax.process_count()


def global_batch(local_batch: Any, mesh: jax.sharding.Mesh,
                 axis: str = "data") -> Any:
    """Per-process host batch (leading dim = local batch) -> globally sharded
    jax.Array tree over `axis`.  Single-process: plain device_put."""
    sharding = jax.sharding.NamedSharding(
        mesh, jax.sharding.PartitionSpec(axis))
    if jax.process_count() == 1:
        return jax.tree_util.tree_map(
            lambda x: jax.device_put(x, sharding), local_batch)
    return jax.tree_util.tree_map(
        lambda x: jax.make_array_from_process_local_data(sharding, x),
        local_batch)


def allgather_host(tree: Any) -> Any:
    """Gather a host-local pytree from every process onto all hosts (numpy).

    Equivalent of the reference's `collect_results_cpu` (`apis/test.py:
    89-133`) without the tmpdir/pickle round-trip; results are ordered by
    process index, matching the contiguous-shard eval ordering guarantee
    (`datasets/samplers/distributed_sampler.py:36-38`)."""
    if jax.process_count() == 1:
        return jax.tree_util.tree_map(np.asarray, tree)
    from jax.experimental import multihost_utils

    # 64-bit leaves would be silently downcast to 32-bit by the gather under
    # default jax x32 (count overflow / precision loss in metric counters —
    # ADVICE r1), so split them into pairs of 32-bit arrays and recombine.
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    encoded, kinds = [], []
    for x in leaves:
        x = np.asarray(x)
        if x.dtype in (np.int64, np.uint64):
            encoded.append(((x >> 31).astype(np.int32),
                            (x & 0x7FFFFFFF).astype(np.int32)))
            kinds.append("i64")
        elif x.dtype == np.float64:
            hi = x.astype(np.float32)
            encoded.append((hi, (x - hi.astype(np.float64))
                            .astype(np.float32)))
            kinds.append("f64")
        else:
            encoded.append(x)
            kinds.append(None)
    gathered = multihost_utils.process_allgather(encoded)
    decoded = []
    for g, kind in zip(gathered, kinds):
        if kind == "i64":
            hi, lo = (np.asarray(a) for a in g)
            decoded.append((hi.astype(np.int64) << 31) | lo.astype(np.int64))
        elif kind == "f64":
            hi, lo = (np.asarray(a) for a in g)
            decoded.append(hi.astype(np.float64) + lo.astype(np.float64))
        else:
            decoded.append(np.asarray(g))
    return jax.tree_util.tree_unflatten(treedef, decoded)


def barrier(name: str = "barrier") -> None:
    if jax.process_count() == 1:
        return
    from jax.experimental import multihost_utils
    multihost_utils.sync_global_devices(name)
