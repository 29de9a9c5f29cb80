"""Pallas lift kernels (interpret mode on CPU) vs the einsum planar lift:
forward parity, count parity, and gradient parity (the lift is linear in the
features, so grads must match the einsum path's autodiff)."""

import numpy as np

import jax
import jax.numpy as jnp

from occnet_tpu.ops.lift_pallas import lift_and_average_pallas
from occnet_tpu.ops.planar_lift import lift_and_average

PC_RANGE = (-40.0, -40.0, -1.0, 40.0, 40.0, 5.4)
IMG_HW = (64, 96)


def _ring_cameras(n_cam=3, batch=1):
    ego2img = np.zeros((batch, n_cam, 4, 4), np.float32)
    K = np.array([[60.0, 0, 48], [0, 60, 32], [0, 0, 1]])
    base = np.array([[0.0, -1.0, 0.0], [0.0, 0.0, -1.0], [1.0, 0.0, 0.0]])
    for b in range(batch):
        for ci in range(n_cam):
            a = 2 * np.pi * ci / n_cam + 0.1 * b
            Rz = np.array([[np.cos(a), -np.sin(a), 0],
                           [np.sin(a), np.cos(a), 0], [0, 0, 1.0]])
            m = np.eye(4, dtype=np.float32)
            m[:3, :3] = K @ (Rz @ base).T
            ego2img[b, ci] = m
    return jnp.asarray(ego2img)


def _feats(rng, n_cam=3, batch=1, ch=16, strides=(8, 16)):
    feats = []
    for s in strides:
        h, w = IMG_HW[0] // s, IMG_HW[1] // s
        feats.append(jnp.asarray(
            rng.randn(batch, n_cam, h, w, ch).astype(np.float32)))
    return feats


def test_pallas_lift_matches_einsum():
    rng = np.random.RandomState(0)
    feats = _feats(rng)
    ego2img = _ring_cameras()
    bev_hw, num_z = (14, 14), 4

    a1, c1 = lift_and_average(feats, ego2img, PC_RANGE, num_z, bev_hw, IMG_HW)
    a2, c2 = lift_and_average_pallas(feats, ego2img, PC_RANGE, num_z, bev_hw,
                                     IMG_HW)
    assert a2.shape == a1.shape and a2.dtype == a1.dtype
    np.testing.assert_array_equal(np.asarray(c1), np.asarray(c2))
    d = np.abs(np.asarray(a1, np.float32) - np.asarray(a2, np.float32))
    assert d.max() < 0.05, d.max()   # bf16 accumulation-order differences
    assert np.asarray(c1).max() >= 1


def test_pallas_lift_batch2():
    rng = np.random.RandomState(1)
    feats = _feats(rng, batch=2)
    ego2img = _ring_cameras(batch=2)
    a1, c1 = lift_and_average(feats, ego2img, PC_RANGE, 4, (14, 14), IMG_HW)
    a2, c2 = lift_and_average_pallas(feats, ego2img, PC_RANGE, 4, (14, 14),
                                     IMG_HW)
    np.testing.assert_array_equal(np.asarray(c1), np.asarray(c2))
    d = np.abs(np.asarray(a1, np.float32) - np.asarray(a2, np.float32))
    assert d.max() < 0.05, d.max()


def test_pallas_lift_grads_match():
    """d(loss)/d(feat) of the pallas path equals the einsum path's autodiff
    (both bf16-rounded; compare in f32 with loose tolerance)."""
    rng = np.random.RandomState(2)
    feats = _feats(rng, ch=8, strides=(16,))
    ego2img = _ring_cameras()
    cot = jnp.asarray(rng.randn(1, 1, 4, 14 * 14, 8).astype(np.float32))

    def loss(fn, fs):
        u, _ = fn(fs, ego2img, PC_RANGE, 4, (14, 14), IMG_HW)
        return jnp.sum(u.astype(jnp.float32) * cot)

    g1 = jax.grad(lambda fs: loss(lift_and_average, fs))(feats)
    g2 = jax.grad(lambda fs: loss(lift_and_average_pallas, fs))(feats)
    for a, b in zip(g1, g2):
        a, b = np.asarray(a, np.float32), np.asarray(b, np.float32)
        scale = max(np.abs(a).max(), 1e-3)
        assert np.abs(a - b).max() / scale < 0.04, np.abs(a - b).max()


def test_pallas_lift_batch2_grads_match_per_sample():
    """Vmapped (B=2) gradients == per-sample gradients.

    Regression for the r4/r5 lift backward bug: `_pass1_bwd`'s kernel reads
    `pl.program_id`, and jax's regular pallas vmap rule PREPENDS a batch grid
    dimension, silently shifting every program_id — corrupting gradients at
    B >= 2 until the kernel was routed through the explicit-loop batching
    path via a batch-mapped scalar-prefetch operand."""
    rng = np.random.RandomState(3)
    feats = _feats(rng, ch=8, strides=(16,), batch=2)
    ego2img = _ring_cameras(batch=2)
    # bev_h=33 x num_z=4 -> ZR=132 > _ZRB=128, i.e. TWO zr grid blocks: the
    # old bug only corrupts when the accumulation axis has >1 block (with a
    # single block the shifted zero-init condition is accidentally correct)
    cot = jnp.asarray(rng.randn(2, 1, 4, 33 * 14, 8).astype(np.float32))

    def loss(fs, e2i, c):
        u, _ = lift_and_average_pallas(fs, e2i, PC_RANGE, 4, (33, 14),
                                       IMG_HW)
        return jnp.sum(u.astype(jnp.float32) * c)

    g2 = jax.grad(loss)(feats, ego2img, cot)
    for bi in range(2):
        g1 = jax.grad(loss)([f[bi:bi + 1] for f in feats],
                            ego2img[bi:bi + 1], cot[bi:bi + 1])
        for a, b in zip(g2, g1):
            a = np.asarray(a, np.float32)[bi]
            b = np.asarray(b, np.float32)[0]
            assert np.isfinite(a).all()
            scale = max(np.abs(b).max(), 1e-3)
            assert np.abs(a - b).max() / scale < 1e-5, np.abs(a - b).max()


def test_pallas_lift_windowed_batch2_matches_einsum():
    """B=2 forward through the `_pass1w` windowed/write-skip kernel (feature
    maps wider than _WB=32) matches the einsum oracle and is finite.

    Regression for the r4 turbo eval NaN: a camera with ZERO live rows in a
    pass order had its whole tmp slab write-skipped, so pass-2 contracted
    zero weights against uninitialised memory (0 * NaN = NaN whenever the
    stale bits were non-finite); z-block 0 is now always written."""
    rng = np.random.RandomState(4)
    feats = _feats(rng, ch=8, strides=(2,), batch=2)   # (32, 48): w > _WB
    ego2img = _ring_cameras(batch=2)
    a1, c1 = lift_and_average(feats, ego2img, PC_RANGE, 4, (14, 14), IMG_HW)
    a2, c2 = lift_and_average_pallas(feats, ego2img, PC_RANGE, 4, (14, 14),
                                     IMG_HW)
    assert np.isfinite(np.asarray(a2, np.float32)).all()
    np.testing.assert_array_equal(np.asarray(c1), np.asarray(c2))
    d = np.abs(np.asarray(a1, np.float32) - np.asarray(a2, np.float32))
    assert d.max() < 0.05, d.max()
