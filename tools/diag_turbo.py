#!/usr/bin/env python
"""Diagnose the turbo (dense-encoder) train/eval forward divergence seen in
SYNTH_BENCH r4: train loss fits (0.136) while the eval forward scores
RayIoU ~0 with bit-identical results across checkpoints (VERDICT r4 #1).

Trains `synth_tiny_turbo_occ` for --steps on the cached synthetic scenes and,
every --check-every steps, probes on ONE fixed train batch:
  - non-finite scan of params and batch_stats (which collection key, count);
  - eval-mode forward (train=False, running BN stats): NaN count + argmax
    class histogram of the occ logits;
  - train-mode forward (train=True, batch BN stats, dropout off via rng but
    deterministic=False — noise is fine for a histogram): same;
  - voxel-accuracy of both against the batch labels.

If eval goes NaN / constant while train stays sane, the step at which it
first happens and the first non-finite batch_stats key localise the bug.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def tree_nonfinite(tree):
    import jax
    import jax.numpy as jnp
    bad = []
    for path, leaf in jax.tree_util.tree_leaves_with_path(tree):
        n = int(jnp.sum(~jnp.isfinite(jnp.asarray(leaf, jnp.float32))))
        if n:
            name = "/".join(str(getattr(p, "key", p)) for p in path)
            bad.append((name, n, int(np.prod(leaf.shape))))
    return bad


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--config", default="synth_tiny_turbo_occ")
    p.add_argument("--scenes", type=int, default=256)
    p.add_argument("--val-scenes", type=int, default=16)
    p.add_argument("--steps", type=int, default=400)
    p.add_argument("--batch", type=int, default=2)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--check-every", type=int, default=50)
    p.add_argument("--cache-dir", default="/root/repo/.synth_cache")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from occnet_tpu.config import apply_overrides, get_config
    from occnet_tpu.data.loader import PrefetchLoader
    from occnet_tpu.data.pipeline import make_device_normalizer
    from occnet_tpu.data.sampler import shuffled_shard_indices
    from occnet_tpu.data.synthetic import SyntheticOccDataset
    from occnet_tpu.models.head import get_occ
    from occnet_tpu.training import create_train_state, make_train_step
    from occnet_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    cfg = get_config(args.config)
    steps_per_epoch = max(args.scenes // args.batch, 1)
    epochs = max(-(-args.steps // steps_per_epoch), 1)
    cfg = apply_overrides(cfg, {"optim.steps_per_epoch": steps_per_epoch,
                                "optim.total_epochs": epochs})

    print(f"loading {args.scenes}+{args.val_scenes} scenes...", flush=True)
    train_ds = SyntheticOccDataset(cfg.data, cfg.model, args.scenes,
                                   seed=1000, training=True,
                                   log=lambda s: print(s, flush=True),
                                   cache_dir=args.cache_dir)
    val_ds = SyntheticOccDataset(cfg.data, cfg.model, args.val_scenes,
                                 seed=0, training=False,
                                 cache_dir=args.cache_dir)

    rng = np.random.RandomState(args.seed)
    sample = train_ds.collate([train_ds.get_sample(0, rng)
                               for _ in range(args.batch)])
    sample = {k: v for k, v in sample.items() if k != "tokens"}

    t0 = time.time()
    model, state = create_train_state(cfg, jax.random.PRNGKey(args.seed),
                                      sample)
    print(f"init {time.time() - t0:.1f}s", flush=True)

    norm = make_device_normalizer(cfg.data)
    n_cls = int(cfg.model.num_classes)

    @jax.jit
    def eval_fwd(params, batch_stats, img, ego2img):
        outs = model.apply({"params": params, "batch_stats": batch_stats},
                           norm(img), ego2img)
        occ_cls, flow = get_occ(outs)
        logits = outs["occ"].astype(jnp.float32)
        return (occ_cls,
                jnp.sum(~jnp.isfinite(logits)),
                jnp.sum(~jnp.isfinite(outs["flow"].astype(jnp.float32))))

    @jax.jit
    def train_fwd(params, batch_stats, img, ego2img, key):
        outs, _ = model.apply(
            {"params": params, "batch_stats": batch_stats},
            norm(img), ego2img, train=True,
            rngs={"dropout": key, "grid_mask": key},
            mutable=["batch_stats", "intermediates"])
        occ_cls, flow = get_occ(outs)
        logits = outs["occ"].astype(jnp.float32)
        return occ_cls, jnp.sum(~jnp.isfinite(logits))

    probe_batch = sample
    labels = np.asarray(probe_batch["voxel_semantics"])

    def probe(state, step):
        bad_p = tree_nonfinite(state.params)
        bad_b = tree_nonfinite(state.batch_stats)
        if bad_p:
            print(f"  [step {step}] NON-FINITE PARAMS: {bad_p[:8]}",
                  flush=True)
        if bad_b:
            print(f"  [step {step}] NON-FINITE BATCH_STATS: {bad_b[:8]}",
                  flush=True)
        if not bad_b:
            print(f"  [step {step}] batch_stats all finite", flush=True)
        img = jnp.asarray(probe_batch["img"])
        e2i = jnp.asarray(probe_batch["ego2img"])
        ec, enan, efnan = eval_fwd(state.params, state.batch_stats, img, e2i)
        e1, e1nan, _ = eval_fwd(state.params, state.batch_stats, img[:1],
                                e2i[:1])
        tc, tnan = train_fwd(state.params, state.batch_stats, img, e2i,
                             jax.random.PRNGKey(123))
        ec, tc, e1 = np.asarray(ec), np.asarray(tc), np.asarray(e1)
        eh = np.bincount(ec.reshape(-1), minlength=n_cls)
        th = np.bincount(tc.reshape(-1), minlength=n_cls)
        eacc = float((ec == labels).mean())
        tacc = float((tc == labels).mean())
        b1agree = float((e1[0] == ec[0]).mean())
        print(f"  [step {step}] eval : nan_occ={int(enan)} "
              f"nan_flow={int(efnan)} acc={eacc:.4f} "
              f"b1_nan={int(e1nan)} b1_vs_b2_agree={b1agree:.4f} "
              f"hist={{{', '.join(f'{i}:{c}' for i, c in enumerate(eh) if c)}}}",
              flush=True)
        print(f"  [step {step}] train: nan_occ={int(tnan)} acc={tacc:.4f} "
              f"hist={{{', '.join(f'{i}:{c}' for i, c in enumerate(th) if c)}}}",
              flush=True)

    probe(state, 0)

    step_fn = jax.jit(make_train_step(cfg, model), donate_argnums=0)
    key = jax.random.PRNGKey(args.seed)
    loader_iter, loader_epoch = None, -1
    t_start = time.time()
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
        if (step + 1) % args.check_every == 0 or step == args.steps - 1:
            m = {k: float(v) for k, v in metrics.items()}
            dt = (time.time() - t_start) / (step + 1)
            print(f"step {step + 1}/{args.steps} loss {m['loss']:.4f} "
                  f"gnorm {m['grad_norm']:.2f} {dt:.2f}s/it", flush=True)
            probe(state, step + 1)

    # reproduce the EXACT r4 synth_learn eval path: run_evaluation (B=1
    # inference via _cached_infer + render_pred_gt + accumulator)
    from occnet_tpu.training.eval_loop import run_evaluation
    scores = run_evaluation(cfg, model, state.params, state.batch_stats,
                            val_ds, log=lambda *a: None)
    print(f"run_evaluation val  : {scores}", flush=True)
    tscores = run_evaluation(cfg, model, state.params, state.batch_stats,
                             train_ds, max_samples=8, log=lambda *a: None)
    print(f"run_evaluation train: {tscores}", flush=True)
    print("diag done", flush=True)


if __name__ == "__main__":
    main()
