"""Worker for the 2-process localhost multihost test (run via subprocess by
`test_multihost.py::test_two_process_localhost`).  Argv: coordinator_port
process_id mode.

Exercises the real cross-process paths that the in-process tests can only
cover in degenerate single-process form (VERDICT r1): `allgather_host`
(including the 64-bit split encoding), `global_batch`, `barrier`, the
multi-part submission merge, and — in mode "qshard" — an actually-executed
BEV-query-sharded (model-axis) train step.
"""

import os
import sys

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=2")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")


def main():
    port, pid, mode = sys.argv[1], int(sys.argv[2]), sys.argv[3]
    from occnet_tpu import parallel

    ok = parallel.initialize(coordinator_address=f"127.0.0.1:{port}",
                             num_processes=2, process_id=pid)
    assert ok
    assert jax.process_count() == 2
    assert len(jax.devices()) == 4, jax.devices()
    proc, n_proc = parallel.process_shard()
    assert (proc, n_proc) == (pid, 2)

    # --- allgather_host: wide-dtype exactness across processes -----------
    big = np.asarray([2 ** 40 + 17 + pid, 3], np.int64)
    fine = np.asarray([1e9 + 0.125 + pid, -2.5e-8], np.float64)
    small = np.asarray([pid, pid + 1], np.int32)
    g = parallel.allgather_host({"big": big, "fine": fine, "small": small})
    assert g["big"].dtype == np.int64 and g["fine"].dtype == np.float64
    np.testing.assert_array_equal(
        g["big"], [[2 ** 40 + 17, 3], [2 ** 40 + 18, 3]])
    np.testing.assert_array_equal(
        g["fine"], [[1e9 + 0.125, -2.5e-8], [1e9 + 1.125, -2.5e-8]])
    np.testing.assert_array_equal(g["small"], [[0, 1], [1, 2]])

    # --- global_batch over the data axis ---------------------------------
    from occnet_tpu.parallel import make_mesh
    mesh = make_mesh(dp=4, mp=1)
    local = {"x": np.full((2, 3), proc, np.float32)}
    gb = parallel.global_batch(local, mesh)
    assert gb["x"].shape == (4, 3)
    total = float(jax.jit(lambda x: x.sum())(gb["x"]))
    assert total == 0 * 6 + 1 * 6, total

    parallel.barrier("phase1")

    # --- multi-part submission merge -------------------------------------
    from occnet_tpu.evaluation.submission import (load_submission,
                                                  merge_submissions)
    import gzip
    import pickle
    tmp = sys.argv[4]
    part = os.path.join(tmp, f"sub.gz.part{proc}")
    with gzip.open(part, "wb") as f:
        pickle.dump({"method": "t", "results": {
            f"tok{proc * 2}": {"pcd_cls": np.zeros(3, np.uint8)},
            f"tok{proc * 2 + 1}": {"pcd_cls": np.ones(3, np.uint8)},
        }}, f)
    parallel.barrier("parts")
    if proc == 0:
        out = os.path.join(tmp, "sub.gz")
        n = merge_submissions([os.path.join(tmp, f"sub.gz.part{r}")
                               for r in range(2)], out)
        assert n == 4
        assert set(load_submission(out)["results"]) == {
            "tok0", "tok1", "tok2", "tok3"}

    if mode == "ckpt":
        # --- collective orbax save/restore of a replicated TrainState -----
        # Regression for the multi-process crash "Cannot serialize host
        # local jax.Array in multi-host setting": host-local leaves must be
        # lifted to global arrays before orbax's collective save
        # (training/checkpoint.py::_to_global).
        import dataclasses
        import importlib.util
        import jax.numpy as jnp
        from occnet_tpu.config import get_config
        from occnet_tpu.training import create_train_state
        from occnet_tpu.training.checkpoint import CheckpointManager

        cfg = get_config("tiny_turbo_occ")
        model_cfg = dataclasses.replace(
            cfg.model, img_h=32, img_w=32, bev_h=8, bev_w=8, pillar_h=2,
            embed_dims=16, out_dim=4, num_cams=2, compute_dtype="float32",
            encoder=dataclasses.replace(cfg.model.encoder, num_layers=1,
                                        ffn_dim=32, num_points_in_pillar=2))
        cfg = dataclasses.replace(cfg, model=model_cfg)
        spec = importlib.util.spec_from_file_location(
            "graft_entry", os.path.join(
                os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                "__graft_entry__.py"))
        ge = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(ge)
        batch = ge._example_batch(cfg, batch_size=1)
        _, state = create_train_state(cfg, jax.random.PRNGKey(0), batch)
        ckpt_dir = os.path.join(sys.argv[4], "ckpts")
        mngr = CheckpointManager(ckpt_dir)
        mngr.save(7, state, cfg, block=True)
        parallel.barrier("saved")
        assert mngr.latest_step() == 7
        restored = mngr.restore(state)
        ref = jax.tree_util.tree_leaves(state.params)
        got = jax.tree_util.tree_leaves(restored.params)
        assert len(ref) == len(got)
        for a, b in zip(ref, got):
            np.testing.assert_array_equal(np.asarray(jax.device_get(a)),
                                          np.asarray(jax.device_get(b)))
        if proc == 0:
            print("CKPT OK", flush=True)

    if mode == "qshard":
        # --- BEV-query (model-axis) sharded train step, EXECUTED ---------
        import dataclasses
        from occnet_tpu.config import get_config
        from occnet_tpu.parallel import shard_batch
        from occnet_tpu.training import create_train_state, make_train_step

        mesh2 = make_mesh(dp=2, mp=2)
        cfg = get_config("tiny_turbo_occ")
        model_cfg = dataclasses.replace(
            cfg.model, img_h=32, img_w=32, bev_h=8, bev_w=8, pillar_h=2,
            embed_dims=16, out_dim=4, num_cams=2, compute_dtype="float32",
            bev_shard_axis="model",
            encoder=dataclasses.replace(cfg.model.encoder, num_layers=1,
                                        ffn_dim=32, num_points_in_pillar=2))
        cfg = dataclasses.replace(cfg, model=model_cfg)

        sys.path.insert(0, os.path.join(os.path.dirname(
            os.path.dirname(os.path.abspath(__file__)))))
        import importlib.util
        spec = importlib.util.spec_from_file_location(
            "graft_entry", os.path.join(
                os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                "__graft_entry__.py"))
        ge = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(ge)
        # each process feeds its local half of the global batch
        local_batch = jax.tree_util.tree_map(
            lambda x: x, ge._example_batch(cfg, batch_size=1))
        with mesh2:
            # init inside the mesh context: bev_shard_axis adds
            # with_sharding_constraint ops that need a mesh to resolve
            model, state = create_train_state(cfg, jax.random.PRNGKey(0),
                                              local_batch)
            gbatch = parallel.global_batch(
                {k: np.asarray(v) for k, v in local_batch.items()}, mesh2)
            step = jax.jit(make_train_step(cfg, model))
            state, metrics = step(state, gbatch, jax.random.PRNGKey(1))
            loss = float(np.asarray(jax.device_get(metrics["loss"])))
        assert np.isfinite(loss), loss
        if proc == 0:
            print(f"QSHARD OK loss={loss:.4f}", flush=True)

    if mode == "videoshard":
        # --- tools/test.py --distributed --video across a scene cut -------
        # One 4-frame scene, 2 contiguous shards: proc1's shard starts
        # MID-SCENE, so its streaming state begins a fresh chain there
        # (matching the reference's per-GPU `prev_frame_info` behaviour,
        # bevformer_occ.py:59-64) — the launcher compares the resulting
        # score against single-process streaming to bound the reset cost.
        import importlib.util
        tmp = sys.argv[4]
        extra = sys.argv[5:]
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        old_argv = sys.argv
        sys.argv = ["test.py", "--config", "tiny_occ", "--eval", "--video",
                    "--distributed",
                    "--work-dir", os.path.join(tmp, "work2p"),
                    "--set", f"data.data_root={os.path.join(tmp, 'data')}",
                    "data.val_ann=infos_val.pkl"] + extra
        spec = importlib.util.spec_from_file_location(
            "occnet_test_cli_2p", os.path.join(repo, "tools", "test.py"))
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        mod.main()
        sys.argv = old_argv
        parallel.barrier("video2p")
        if proc == 0:
            print("VIDEO2P OK", flush=True)

    parallel.barrier("done")
    print(f"WORKER{proc} OK", flush=True)


if __name__ == "__main__":
    main()
