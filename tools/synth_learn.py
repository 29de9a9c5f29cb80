#!/usr/bin/env python
"""Learnability A/B on the synthetic geometric benchmark: train the exact
(gather) encoder and the TPU-native dense/turbo encoder on identical
generated scenes, then score both with the real ray-metric evaluator
(RayIoU / mAVE / OccScore) on a held-out synthetic val split.

This is the accuracy evidence for the flagship architecture (VERDICT r3
next-step #1): the reference demonstrates its encoder learns via trained
nuScenes checkpoints (`README.md:109-124`); with no nuScenes on disk, the
controlled equivalent is a synthetic task whose occupancy is inferable
from the rendered views by construction (`data/synthetic.py`).

Usage (TPU, ~30-60 min for both arms):
  python tools/synth_learn.py --scenes 256 --steps 2000 --batch 2 \
      --out SYNTH_BENCH.json
"""

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--configs", default="synth_tiny_occ,synth_tiny_turbo_occ")
    p.add_argument("--scenes", type=int, default=256)
    p.add_argument("--val-scenes", type=int, default=16)
    p.add_argument("--steps", type=int, default=2000)
    p.add_argument("--batch", type=int, default=2)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--log-interval", type=int, default=100)
    p.add_argument("--eval-every", type=int, default=0,
                   help="also evaluate mid-training every N steps (0 = only "
                        "at the end)")
    p.add_argument("--out", default="SYNTH_BENCH.json")
    p.add_argument("--cache-dir", default="/root/repo/.synth_cache",
                   help="scene-render cache ('' disables): reruns skip the "
                        "~1 s/scene TPU render phase entirely")
    p.add_argument("--set", nargs="*", default=[], metavar="KEY=VAL")
    return p.parse_args()


def run_arm(name, args, train_ds, val_ds):
    import jax

    from occnet_tpu.config import apply_overrides, get_config
    from occnet_tpu.data.loader import PrefetchLoader
    from occnet_tpu.data.sampler import shuffled_shard_indices
    from occnet_tpu.training import create_train_state, make_train_step
    from occnet_tpu.training.eval_loop import run_evaluation

    cfg = get_config(name)
    overrides = dict(kv.split("=", 1) for kv in args.set)
    steps_per_epoch = max(len(train_ds) // args.batch, 1)
    overrides["optim.steps_per_epoch"] = steps_per_epoch
    cfg = apply_overrides(cfg, overrides)
    # schedule horizon = the actual run length
    epochs = max(-(-args.steps // steps_per_epoch), 1)
    cfg = apply_overrides(cfg, {"optim.total_epochs": epochs})

    rng = np.random.RandomState(args.seed)
    sample = train_ds.collate([train_ds.get_sample(0, rng)
                               for _ in range(args.batch)])
    sample = {k: v for k, v in sample.items() if k != "tokens"}

    t0 = time.time()
    model, state = create_train_state(cfg, jax.random.PRNGKey(args.seed),
                                      sample)
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(state.params))
    print(f"[{name}] init {time.time() - t0:.1f}s, {n_params / 1e6:.2f}M "
          "params", flush=True)

    step_fn = jax.jit(make_train_step(cfg, model), donate_argnums=0)
    key = jax.random.PRNGKey(args.seed)

    history = []
    t_start = time.time()
    loader_iter, loader_epoch = None, -1
    overflow_total = 0
    for step in range(args.steps):
        epoch = step // steps_per_epoch
        if epoch != loader_epoch or loader_iter is None:
            order = shuffled_shard_indices(len(train_ds), 1, 0, epoch,
                                           cfg.seed)
            skip = (step % steps_per_epoch) * args.batch
            loader_iter = iter(PrefetchLoader(
                train_ds, args.batch, order[skip:], seed=cfg.seed,
                epoch=epoch, num_workers=2))
            loader_epoch = epoch
        batch = next(loader_iter)
        batch.pop("tokens")
        state, metrics = step_fn(state, batch, key)
        if step % args.log_interval == 0 or step == args.steps - 1:
            m = {k: float(v) for k, v in metrics.items()}
            overflow_total += int(m.get("cert_overflow", 0))
            dt = (time.time() - t_start) / (step + 1)
            print(f"[{name}] step {step}/{args.steps} loss {m['loss']:.4f} "
                  f"(occ {m['loss_occ']:.4f}) gnorm {m['grad_norm']:.2f} "
                  f"{dt:.2f}s/it", flush=True)
            history.append({"step": step, **m})
        if args.eval_every and step and step % args.eval_every == 0:
            scores = run_evaluation(cfg, model, state.params,
                                    state.batch_stats, val_ds,
                                    log=lambda *a: None)
            print(f"[{name}] step {step} eval: {scores}", flush=True)
            history.append({"step": step, "eval": scores})

    t_eval = time.time()
    scores = run_evaluation(cfg, model, state.params, state.batch_stats,
                            val_ds)
    print(f"[{name}] final eval ({time.time() - t_eval:.0f}s): {scores}",
          flush=True)
    # diagnostics: (a) train-split score separates memorisation-without-
    # generalisation from never-fit; (b) per-class voxel counts on one val
    # scene show WHICH classes the argmax ever predicts
    train_scores = run_evaluation(cfg, model, state.params,
                                  state.batch_stats, train_ds,
                                  max_samples=min(16, len(train_ds)),
                                  log=lambda *a: None)
    print(f"[{name}] train-split eval: {train_scores}", flush=True)
    import jax.numpy as jnp
    from occnet_tpu.models.head import get_occ
    from occnet_tpu.data.pipeline import make_device_normalizer
    norm = make_device_normalizer(cfg.data)
    infer = jax.jit(lambda p, bs, i, e: get_occ(model.apply(
        {"params": p, "batch_stats": bs}, norm(i), e))[0])
    n_cls = int(cfg.model.num_classes)
    for split, ds in (("val", val_ds), ("train", train_ds)):
        s = ds.get_sample(0)
        occ_cls = infer(state.params, state.batch_stats,
                        jnp.asarray(s["img"][None]),
                        jnp.asarray(s["ego2img"][None]))
        pred = np.asarray(occ_cls[0]).reshape(-1)
        gt = np.asarray(s["voxel_semantics"]).reshape(-1)
        pc = np.bincount(pred, minlength=n_cls)
        gc = np.bincount(gt, minlength=n_cls)
        print(f"[{name}] {split} scene 0 voxel counts (pred vs gt): "
              + " ".join(f"c{i}:{pc[i]}/{gc[i]}" for i in range(n_cls)
                         if pc[i] or gc[i]), flush=True)
    return {
        "config": name,
        "steps": args.steps,
        "batch": args.batch,
        "train_scenes": len(train_ds),
        "val_scenes": len(val_ds),
        "params_m": n_params / 1e6,
        "final_loss": history[-1]["loss"],
        "s_per_it": (t_eval - t_start) / args.steps,
        "cert_overflow_total": overflow_total,
        "scores": scores,
        "train_scores": train_scores,
        "history": history,
    }


def main():
    args = parse_args()
    from occnet_tpu.config import get_config
    from occnet_tpu.data.synthetic import SyntheticOccDataset
    from occnet_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    names = args.configs.split(",")
    # all arms must share geometry so they share the SAME dataset
    cfg0 = get_config(names[0])
    print(f"generating {args.scenes}+{args.val_scenes} scenes...", flush=True)
    t0 = time.time()
    cache = args.cache_dir or None
    train_ds = SyntheticOccDataset(cfg0.data, cfg0.model, args.scenes,
                                   seed=1000, training=True,
                                   log=lambda s: print(s, flush=True),
                                   cache_dir=cache)
    val_ds = SyntheticOccDataset(cfg0.data, cfg0.model, args.val_scenes,
                                 seed=0, training=False, cache_dir=cache)
    print(f"scenes in {time.time() - t0:.0f}s", flush=True)

    results = [run_arm(n, args, train_ds, val_ds) for n in names]
    out = {"benchmark": "synthetic-geometric",
           "scenes": args.scenes, "steps": args.steps, "results": results}
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(f"\n{'config':<26}{'RayIoU':>8}{'@1':>8}{'@2':>8}{'@4':>8}"
          f"{'mAVE':>8}{'OccScore':>9}")
    for r in results:
        s = r["scores"]
        print(f"{r['config']:<26}{s['RayIoU']:>8.3f}{s['RayIoU@1']:>8.3f}"
              f"{s['RayIoU@2']:>8.3f}{s['RayIoU@4']:>8.3f}{s['mAVE']:>8.3f}"
              f"{s['OccScore']:>9.3f}")
    print(f"written: {args.out}")


if __name__ == "__main__":
    main()
