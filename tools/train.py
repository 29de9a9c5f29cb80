#!/usr/bin/env python
"""Training CLI.

Equivalent of the reference `tools/train.py` (:33-259): config selection +
dotted overrides (replacing --cfg-options), work-dir handling, seeding,
resume, then the train loop — which here is a jitted step over a device mesh
instead of mmcv runner + DDP.

Usage:
  python tools/train.py --config base_occ --work-dir work_dirs/base \
      --set optim.lr=1e-4 data.data_root=/data/nuscenes/
"""

import argparse
import json
import logging
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def parse_args():
    p = argparse.ArgumentParser(description="occnet_tpu training")
    p.add_argument("--config", default="base_occ")
    p.add_argument("--work-dir", default=None)
    p.add_argument("--resume", action="store_true")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--max-steps", type=int, default=None,
                   help="cap total steps (smoke runs)")
    p.add_argument("--device-normalize", action="store_true",
                   help="ship raw uint8 images to the device (4x less H2D) "
                        "and run photometric distortion + normalisation + "
                        "padding inside the jitted train step")
    p.add_argument("--synthetic-data", action="store_true",
                   help="train on random tensors (no dataset on disk)")
    p.add_argument("--synthetic-geometric", type=int, default=0, metavar="N",
                   help="train on N generated geometric scenes (multi-camera "
                        "renders of random voxel worlds, data/synthetic.py) "
                        "— a real learnable task with no dataset on disk; "
                        "--eval-interval-epochs evaluates RayIoU on a "
                        "held-out synthetic val split")
    p.add_argument("--synthetic-render-scale", type=int, default=1,
                   help="ray-cast the synthetic scenes at 1/N resolution "
                        "and pixel-repeat up to the model size (N^2 cheaper "
                        "generation; use 4 at base 928x1600 scale)")
    p.add_argument("--log-interval", type=int, default=50)
    p.add_argument("--profile", type=int, default=0, metavar="N",
                   help="capture a jax.profiler trace of N steps (after a "
                        "2-step warmup) into <work-dir>/trace — view with "
                        "TensorBoard/xprof (the reference's commented-out "
                        "profiler hook, apis/mmdet_train.py:146-149)")
    p.add_argument("--ckpt-interval-epochs", type=int, default=1)
    p.add_argument("--eval-interval-epochs", type=int, default=0,
                   help="run ray-metric evaluation on the val split every N "
                        "epochs (the reference's eval hook; 0 = off)")
    p.add_argument("--eval-dynamic-intervals", default="",
                   metavar="EPOCH:N[,EPOCH:N...]",
                   help="change the eval interval once training reaches an "
                        "epoch milestone, e.g. '20:1' = every epoch from "
                        "epoch 20 (the reference's dynamic_intervals, "
                        "core/evaluation/eval_hooks.py:38-52)")
    p.add_argument("--autoscale-lr", action="store_true",
                   help="scale optim.lr by data-parallel size / 8 — the "
                        "reference's 8-GPU linear-scaling rule "
                        "(tools/train.py:159-161)")
    p.add_argument("--temporal-queue", type=int, default=0,
                   help="train the temporal (video) path on N-frame scene "
                        "clips: frames 0..N-2 produce the history BEV "
                        "grad-free, frame N-1 is supervised (the "
                        "reference's EpochBasedRunner_video; 0 = "
                        "single-frame training)")
    p.add_argument("--backbone-checkpoint", default=None,
                   help="torchvision resnet state_dict (.pth) to initialise "
                        "the backbone (the reference's "
                        "pretrained='torchvision://resnet50')")
    p.add_argument("--distributed", action="store_true",
                   help="multi-host: jax.distributed.initialize from "
                        "JAX_COORDINATOR_ADDRESS/JAX_NUM_PROCESSES/"
                        "JAX_PROCESS_ID (no-op on auto-detected TPU pods)")
    p.add_argument("--set", nargs="*", default=[], metavar="KEY=VAL",
                   help="dotted config overrides")
    return p.parse_args()


def make_synthetic_batch(cfg, batch_size, rng, rig="ring"):
    """Random batch with a fabricated camera rig.

    rig="ring": symmetric ring, every camera f = w/2 (90-degree hfov).
    rig="nuscenes": the asymmetric FoV layout of the real nuScenes rig —
    five ~70-degree cameras (f = (w/2)/tan(35deg)) + one 110-degree back
    camera (f = (w/2)/tan(55deg)) — the workload where per-camera top-K
    pays off (narrow cameras see far fewer BEV queries than the back one).
    """
    import jax.numpy as jnp
    m = cfg.model
    img = rng.randn(batch_size, m.num_cams, m.img_h, m.img_w, 3)
    ego2img = np.tile(np.eye(4, dtype=np.float32),
                      (batch_size, m.num_cams, 1, 1))
    for ci in range(m.num_cams):
        a = 2 * np.pi * ci / m.num_cams
        R = np.array([[np.cos(a), -np.sin(a), 0], [0, 0, -1],
                      [np.sin(a), np.cos(a), 0.0]])
        if rig == "nuscenes":
            # camera at 180 degrees is the wide back camera
            back = (ci == m.num_cams // 2)
            f = (m.img_w / 2) / np.tan(np.deg2rad(55.0 if back else 35.0))
        else:
            f = m.img_w / 2
        K = np.array([[f, 0, m.img_w / 2],
                      [0, f, m.img_h / 2], [0, 0, 1]])
        ego2img[:, ci, :3, :3] = K @ R
    sem = rng.randint(0, 17, size=(batch_size, m.bev_w, m.bev_h, m.pillar_h))
    flow = rng.randn(batch_size, m.bev_w, m.bev_h, m.pillar_h, 2)
    return {
        "img": jnp.asarray(img, jnp.float32),
        "ego2img": jnp.asarray(ego2img),
        "voxel_semantics": jnp.asarray(sem, jnp.int32),
        "voxel_flow": jnp.asarray(flow, jnp.float32),
    }


def main():
    args = parse_args()
    import jax
    from occnet_tpu import parallel
    from occnet_tpu.config import get_config, apply_overrides
    from occnet_tpu.parallel import make_mesh
    from occnet_tpu.training import create_train_state, make_train_step
    from occnet_tpu.training.checkpoint import CheckpointManager
    from occnet_tpu.data import (NuSceneOccDataset, build_train_dataset,
                                 shuffled_shard_indices)

    if args.distributed:
        parallel.initialize()
    proc, n_proc = parallel.process_shard()

    cfg = get_config(args.config)
    overrides = dict(kv.split("=", 1) for kv in args.set)
    if overrides:
        cfg = apply_overrides(cfg, overrides)
    work_dir = args.work_dir or os.path.join("work_dirs", args.config)
    os.makedirs(work_dir, exist_ok=True)

    logging.basicConfig(
        level=logging.INFO,
        format="%(asctime)s %(levelname)s %(message)s",
        handlers=[logging.StreamHandler(),
                  logging.FileHandler(os.path.join(
                      work_dir, f"train_{int(time.time())}.log"))],
        force=True)   # jax/absl pre-configure the root logger
    log = logging.getLogger("occnet_tpu")
    log.info("devices: %s", jax.devices())
    log.info("config: %s", cfg)

    mesh = make_mesh(cfg.parallel.dp, cfg.parallel.mp)
    n_dp = mesh.shape["data"]
    global_batch = cfg.data.batch_size_per_device * n_dp
    if args.autoscale_lr:
        # linear-scaling rule against the reference's 8-GPU recipe
        # (`tools/train.py:159-161`: lr * n_gpus / 8)
        scaled = cfg.optim.lr * n_dp / 8.0
        cfg = apply_overrides(cfg, {"optim.lr": scaled})
        log.info("autoscale-lr: %.3e (dp=%d)", scaled, n_dp)
    rng = np.random.RandomState(args.seed)

    # dynamic eval intervals: sorted (milestone_epoch, interval) pairs; the
    # interval in force is the last milestone reached
    dyn_eval = sorted(
        (int(m), int(i)) for m, i in
        (kv.split(":") for kv in args.eval_dynamic_intervals.split(",")
         if kv))

    def eval_interval_at(epoch: int) -> int:
        iv = args.eval_interval_epochs
        for m, i in dyn_eval:
            if epoch + 1 >= m:
                iv = i
        return iv

    temporal = args.temporal_queue and args.temporal_queue > 1
    if temporal and args.device_normalize:
        raise SystemExit("--device-normalize is not yet supported with "
                         "--temporal-queue (the clip step has no on-device "
                         "augmentation path); drop one of the flags")
    dataset = None
    val_dataset = None
    if args.synthetic_geometric:
        if temporal:
            raise SystemExit("--synthetic-geometric generates one frame per "
                             "scene; no clips for --temporal-queue")
        from occnet_tpu.data.synthetic import SyntheticOccDataset
        if args.device_normalize:
            # raw-uint8 upload; the device pipeline normalises, with the
            # colour-destroying photometric distortion disabled (synthetic
            # class identity is colour-coded)
            cfg = apply_overrides(cfg, {"data.device_distortion": False})
        # disjoint seed ranges: val = seeds [0, n_val), train = [1000, ...)
        dataset = SyntheticOccDataset(
            cfg.data, cfg.model, args.synthetic_geometric, seed=1000,
            training=True, render_scale=args.synthetic_render_scale,
            log=log.info, device_normalize=args.device_normalize)
        if args.eval_interval_epochs or args.eval_dynamic_intervals:
            val_dataset = SyntheticOccDataset(
                cfg.data, cfg.model,
                max(8, args.synthetic_geometric // 16), seed=0,
                training=False,
                render_scale=args.synthetic_render_scale,
                device_normalize=args.device_normalize)
        steps_per_epoch = max(len(dataset) // global_batch, 1)
        cfg = apply_overrides(cfg, {"optim.steps_per_epoch": steps_per_epoch})
        log.info("synthetic-geometric dataset: %d scenes, %d steps/epoch",
                 len(dataset), steps_per_epoch)
    elif not args.synthetic_data:
        dataset = build_train_dataset(cfg.data, training=True,
                                      device_normalize=args.device_normalize)
        if temporal:
            from occnet_tpu.data import ClipDataset, ConcatOccDataset
            bev_hw = (cfg.model.bev_h, cfg.model.bev_w)

            def wrap(d):
                return ClipDataset(d, args.temporal_queue,
                                   cfg.model.pc_range, bev_hw)

            dataset = (ConcatOccDataset([wrap(d) for d in dataset.datasets])
                       if isinstance(dataset, ConcatOccDataset)
                       else wrap(dataset))
        steps_per_epoch = max(len(dataset) // global_batch, 1)
        cfg = apply_overrides(cfg, {"optim.steps_per_epoch": steps_per_epoch})
        log.info("dataset: %d %s, %d steps/epoch", len(dataset),
                 "clips" if temporal else "frames", steps_per_epoch)

    if dataset is not None:
        sample = dataset.collate([dataset.get_sample(0, rng)
                                  for _ in range(global_batch)])
        import jax.numpy as jnp
        sample = {k: jnp.asarray(v) for k, v in sample.items()
                  if k != "tokens"}
    else:
        sample = make_synthetic_batch(cfg, global_batch, rng)
    # model init wants a single-frame batch; clips supervise the last frame
    init_sample = ({**sample, "img": sample["img"][:, -1],
                    "ego2img": sample["ego2img"][:, -1]}
                   if temporal else sample)

    t0 = time.time()
    model, state = create_train_state(cfg, jax.random.PRNGKey(args.seed),
                                      init_sample)
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(state.params))
    log.info("model init in %.1fs — %.2fM params", time.time() - t0,
             n_params / 1e6)

    if args.backbone_checkpoint:
        import torch
        from occnet_tpu.utils.torch_convert import load_resnet_into_variables
        sd = torch.load(args.backbone_checkpoint, map_location="cpu",
                        weights_only=True)
        sd = sd.get("state_dict", sd)
        depth = int(cfg.model.backbone.type.replace("resnet", ""))
        new_vars = load_resnet_into_variables(
            {"params": state.params, "batch_stats": state.batch_stats},
            sd, depth=depth)
        state = state.replace(params=new_vars["params"],
                              batch_stats=new_vars["batch_stats"])
        log.info("backbone initialised from %s", args.backbone_checkpoint)

    ckpt = CheckpointManager(os.path.join(work_dir, "ckpts"))
    if args.resume and ckpt.latest_step() is not None:
        state = ckpt.restore(state)
        log.info("resumed from step %d", int(state.step))

    if temporal:
        from occnet_tpu.training.train import make_optimizer
        from occnet_tpu.training.temporal import make_temporal_train_step
        tx = make_optimizer(cfg, state.params)
        step_fn = jax.jit(make_temporal_train_step(cfg, model, tx),
                          donate_argnums=0)
    else:
        step_fn = jax.jit(make_train_step(cfg, model), donate_argnums=0)
    key = jax.random.PRNGKey(args.seed)

    total_steps = cfg.optim.total_epochs * cfg.optim.steps_per_epoch
    if args.max_steps:
        total_steps = min(total_steps, args.max_steps)

    from occnet_tpu.data.loader import PrefetchLoader

    # structured metric stream (the TensorBoard-hook equivalent,
    # default_runtime.py:6-11): one JSON line per logged step
    from occnet_tpu.utils.events import JsonlWriter
    from occnet_tpu.utils.profiling import device_sync, trace
    events = (JsonlWriter(os.path.join(work_dir, "metrics.jsonl"))
              if proc == 0 else None)

    import contextlib
    profiler = contextlib.ExitStack()

    step0 = int(state.step)
    profile_start = step0 + 2 if args.profile else None
    epoch_len = cfg.optim.steps_per_epoch
    t_start = time.time()
    loader_iter = None
    loader_epoch = -1
    for step in range(step0, total_steps):
        if profile_start is not None and step == profile_start:
            device_sync(state.params)   # trace only the profiled steps
            profiler.enter_context(trace(os.path.join(work_dir, "trace")))
        if profile_start is not None and step == profile_start + args.profile:
            device_sync(state.params)
            profiler.close()
            log.info("profiler trace (%d steps) written to %s",
                     args.profile, os.path.join(work_dir, "trace"))
        if dataset is not None:
            epoch = step // epoch_len
            if epoch != loader_epoch or loader_iter is None:
                # per-process shard of the epoch-seeded permutation (the
                # DistributedGroupSampler analogue; each host loads only its
                # slice of the global batch)
                order = shuffled_shard_indices(len(dataset), n_proc, proc,
                                               epoch, cfg.seed)
                local_batch = global_batch // n_proc
                skip = (step % epoch_len) * local_batch
                loader = PrefetchLoader(
                    dataset, local_batch, order[skip:], seed=cfg.seed,
                    epoch=epoch, num_workers=cfg.data.workers)
                loader_iter = iter(loader)
                loader_epoch = epoch
            batch = next(loader_iter)
            batch.pop("tokens")
            batch = parallel.global_batch(batch, mesh)
        else:
            batch = sample
        state, metrics = step_fn(state, batch, key)
        # Exactness-certificate accumulator (sca_topk_overflow /
        # dcn_window_overflow): lazy device-side sum — no per-step sync —
        # checked whenever metrics are fetched.  A nonzero count means the
        # static fast paths deviated from reference semantics AND their
        # custom VJPs returned gradients of a different function, so the
        # run aborts (detection latency <= --log-interval steps).  The
        # reference's per-camera rebatch is exact by construction
        # (spatial_cross_attention.py:137-153); this is our equivalent
        # guarantee, now enforced in training as well as eval.
        overflow_acc = overflow_acc + metrics["cert_overflow"] \
            if step > step0 else metrics["cert_overflow"]
        if step % args.log_interval == 0 or step == total_steps - 1:
            m = {k: float(v) for k, v in metrics.items()}
            m["cert_overflow"] = float(overflow_acc)
            if m["cert_overflow"]:
                if events is not None:
                    events.write(step, tag="abort", **m)
                raise SystemExit(
                    f"exactness certificate violated at/before step {step}: "
                    f"{int(m['cert_overflow'])} overflowed samples "
                    "(sca_topk_overflow / dcn_window_overflow) — gradients "
                    "since the violation are inconsistent; raise "
                    "model.encoder.sca.max_queries_per_cam or the backbone "
                    "dcn window radius, or fall back to gather mode")
            dt = (time.time() - t_start) / max(step - step0 + 1, 1)
            log.info("step %d/%d  loss %.4f (occ %.4f flow %.4f) "
                     "gnorm %.2f lr %.2e  %.2fs/it",
                     step, total_steps, m["loss"], m["loss_occ"],
                     m["loss_flow"], m["grad_norm"], m["lr"], dt)
            if events is not None:
                events.write(step, s_per_it=dt, **m)
        if (step + 1) % (epoch_len * args.ckpt_interval_epochs) == 0 or \
                step == total_steps - 1:
            # async: orbax writes on background threads; the final-step save
            # is made durable by the `ckpt.wait()` below before exit
            ckpt.save(step + 1, state, cfg)
            log.info("checkpoint @ step %d", step + 1)
        epoch_now = step // epoch_len
        cur_iv = eval_interval_at(epoch_now)
        if (cur_iv and dataset is not None
                and (step + 1) % epoch_len == 0
                and (epoch_now + 1) % cur_iv == 0):
            from occnet_tpu.training.eval_loop import run_evaluation
            if val_dataset is None:
                val_dataset = NuSceneOccDataset(
                    cfg.data,
                    os.path.join(cfg.data.data_root, cfg.data.val_ann),
                    training=False)
            scores = run_evaluation(cfg, model, state.params,
                                    state.batch_stats, val_dataset,
                                    log=log.info)
            if events is not None:
                events.write(step + 1, tag="eval", **scores)
    profiler.close()
    ckpt.wait()
    try:
        # best-effort peak-HBM report (unavailable on some backends)
        stats = jax.local_devices()[0].memory_stats() or {}
        peak = stats.get("peak_bytes_in_use")
        source = "runtime"
        if not peak:
            # axon/tunnel backends expose no runtime memory stats; fall back
            # to the compiled train step's STATIC program requirement
            # (temp + argument bytes — what the XLA OOM report calls
            # "program hbm requirement"); compile is an on-disk cache hit.
            ma = step_fn.lower(state, batch, key).compile().memory_analysis()
            if ma is not None:
                peak = (int(getattr(ma, "temp_size_in_bytes", 0))
                        + int(getattr(ma, "argument_size_in_bytes", 0)))
                source = "memory_analysis"
        if peak:
            log.info("peak HBM (%s): %.2f GiB", source, peak / 2 ** 30)
            if events is not None:
                events.write(total_steps, tag="hbm",
                             peak_bytes_in_use=int(peak), source=source)
    except Exception:  # noqa: BLE001
        pass
    if events is not None:
        events.close()
    log.info("done: %d steps", total_steps - step0)


if __name__ == "__main__":
    main()
