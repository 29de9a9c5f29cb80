"""Multi-host helpers on a single process (the degenerate but load-bearing
path): global_batch produces data-axis-sharded global arrays on the virtual
8-device mesh; allgather/barrier are identity; initialize() no-ops."""

import os

import numpy as np
import pytest

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


def _run_two_process(mode, tmp_path, timeout, extra=()):
    import socket
    import subprocess
    import sys as _sys

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    worker = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "_multihost_worker.py")
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)          # worker sets its own device count
    # the axon sitecustomize registers a PJRT backend at interpreter start,
    # which breaks jax.distributed.initialize ("must be called before any
    # JAX calls"); disable its trigger and path for the workers
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = os.pathsep.join(
        p for p in env.get("PYTHONPATH", "").split(os.pathsep)
        if "axon" not in p)
    procs = [subprocess.Popen(
        [_sys.executable, worker, str(port), str(pid), mode, str(tmp_path),
         *extra],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        env=env) for pid in range(2)]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=timeout)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out[-3000:]}"
        assert f"WORKER{pid} OK" in out
    return outs


@pytest.mark.slow
def test_two_process_localhost(tmp_path):
    """REAL multi-process coverage (2 CPU processes x 2 virtual devices via
    jax.distributed on localhost): allgather_host incl. the 64-bit split
    encoding, global_batch assembly, barriers, submission-part merge."""
    _run_two_process("basic", tmp_path, timeout=600)


@pytest.mark.slow
def test_two_process_checkpoint(tmp_path):
    """Collective orbax save/restore of a replicated TrainState across 2
    processes — regression for 'Cannot serialize host local jax.Array in
    multi-host setting' (host-local leaves must be lifted to global arrays,
    training/checkpoint.py::_to_global)."""
    outs = _run_two_process("ckpt", tmp_path, timeout=1200)
    assert "CKPT OK" in outs[0]


# micro model + CUBIC 2 m eval grid shared by both runs of the cross-shard
# video test (8x8x2 voxels over +/-8 m, -1..3 m)
_VIDEO_OVERRIDES = [
    "model.img_h=32", "model.img_w=32", "model.bev_h=8", "model.bev_w=8",
    "model.pillar_h=2", "model.embed_dims=16", "model.out_dim=4",
    "model.compute_dtype=float32", "model.pc_range=-8,-8,-1,8,8,3",
    "model.encoder.num_layers=1", "model.encoder.ffn_dim=32",
    "model.encoder.num_points_in_pillar=2",
    "data.occ_size=8,8,2", "eval.occ_size=8,8,2", "eval.voxel_size=2.0",
    "eval.pc_range=-8,-8,-1,8,8,3",
]


@pytest.mark.slow
def test_two_process_video_cross_shard(tmp_path):
    """tools/test.py --distributed --video with ONE scene spanning the
    contiguous shard cut: proc1 starts a fresh temporal chain mid-scene
    (the reference's per-GPU `prev_frame_info` behaviour).  Asserts the
    2-process score stays within tolerance of single-process streaming —
    bounding the mid-scene-reset cost (VERDICT r3 #8)."""
    import importlib.util
    import json
    import sys as _sys

    from tests.test_cli import _write_miniset

    root = os.path.join(str(tmp_path), "data")
    os.makedirs(root, exist_ok=True)
    _write_miniset(root, 4, (32, 32), grid=(8, 8, 2), n_scenes=1)

    # single-process streaming reference (same seed-0 init weights)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    work1 = os.path.join(str(tmp_path), "work1p")
    old_argv = _sys.argv
    _sys.argv = ["test.py", "--config", "tiny_occ", "--eval", "--video",
                 "--work-dir", work1,
                 "--set", f"data.data_root={root}",
                 "data.val_ann=infos_val.pkl"] + _VIDEO_OVERRIDES
    try:
        spec = importlib.util.spec_from_file_location(
            "occnet_test_cli_1p", os.path.join(repo, "tools", "test.py"))
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        mod.main()
    finally:
        _sys.argv = old_argv
    with open(os.path.join(work1, "eval_results.json")) as f:
        s1 = json.load(f)

    outs = _run_two_process("videoshard", tmp_path, timeout=1800,
                            extra=_VIDEO_OVERRIDES)
    assert "VIDEO2P OK" in outs[0]
    with open(os.path.join(str(tmp_path), "work2p",
                           "eval_results.json")) as f:
        s2 = json.load(f)
    assert np.isfinite(s2["RayIoU"])
    # frames 0-1 are bitwise-shared; only proc1's fresh chain at frame 2
    # can move the score.  Bound the reset cost.
    delta = abs(s2["RayIoU"] - s1["RayIoU"])
    print(f"cross-shard reset cost: RayIoU {s1['RayIoU']:.4f} -> "
          f"{s2['RayIoU']:.4f} (|delta| {delta:.4f})")
    assert delta < 0.2, (s1, s2)


@pytest.mark.slow
def test_two_process_qshard(tmp_path):
    """EXECUTED BEV-query-sharded (model-axis) train step on a 2-process
    dp=2 x mp=2 mesh — the resharding collectives run through the
    cross-process Gloo backend, which works where the single-process
    virtual-device rendezvous CHECK-crashes (see __graft_entry__.py).
    Slow on this 1-core host (one big CPU compile per worker)."""
    outs = _run_two_process("qshard", tmp_path, timeout=1800)
    assert "QSHARD OK" in outs[0]
