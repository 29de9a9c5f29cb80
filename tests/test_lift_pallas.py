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
