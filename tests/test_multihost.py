"""Multi-host helpers on a single process (the degenerate but load-bearing
path): global_batch produces data-axis-sharded global arrays on the virtual
8-device mesh; allgather/barrier are identity; initialize() no-ops."""

import numpy as np

import jax

from occnet_tpu import parallel


def test_initialize_single_process_noop():
    assert parallel.initialize() is False
    assert parallel.process_shard() == (0, 1)


def test_global_batch_shards_on_mesh():
    mesh = parallel.make_mesh()
    batch = {"img": np.arange(8 * 4, dtype=np.float32).reshape(8, 4),
             "sem": np.zeros((8, 2), np.int32)}
    g = parallel.global_batch(batch, mesh)
    assert g["img"].shape == (8, 4)
    spec = g["img"].sharding.spec
    assert tuple(spec) == ("data",)
    # round-trips the data
    np.testing.assert_array_equal(np.asarray(g["img"]), batch["img"])


def test_allgather_and_barrier_single():
    tree = {"a": np.ones((3,), np.float32)}
    out = parallel.allgather_host(tree)
    np.testing.assert_array_equal(out["a"], tree["a"])
    parallel.barrier("t")
