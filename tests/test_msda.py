"""Deformable-attention core parity vs a torch grid_sample oracle.

The oracle reimplements the semantics of mmcv's
`multi_scale_deformable_attn_pytorch` (the reference's CPU cross-check for its
CUDA kernel, `spatial_cross_attention.py:394-396`) directly with
`torch.nn.functional.grid_sample` so our XLA/Pallas kernels are validated
against an independent implementation.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from occnet_tpu.ops.msda import (
    bilinear_sample,
    multi_scale_deformable_attention,
    multi_scale_deformable_attention_chunked,
)


def torch_msda_oracle(value, spatial_shapes, sampling_locations,
                      attention_weights):
    """value (B,V,H,D); loc (B,Q,H,L,P,2); weights (B,Q,H,L,P)."""
    B, V, H, D = value.shape
    _, Q, _, L, P, _ = sampling_locations.shape
    splits = [h * w for h, w in spatial_shapes]
    value_list = value.split(splits, dim=1)
    out = torch.zeros(B, Q, H, D, dtype=torch.float64)
    for lvl, (h, w) in enumerate(spatial_shapes):
        v = value_list[lvl].permute(0, 2, 3, 1).reshape(B * H, D, h, w)
        grid = sampling_locations[:, :, :, lvl] * 2 - 1       # (B,Q,H,P,2)
        grid = grid.permute(0, 2, 1, 3, 4).reshape(B * H, Q, P, 2)
        sampled = F.grid_sample(v, grid, mode="bilinear",
                                padding_mode="zeros", align_corners=False)
        sampled = sampled.reshape(B, H, D, Q, P).permute(0, 3, 1, 4, 2)
        w_l = attention_weights[:, :, :, lvl]                  # (B,Q,H,P)
        out += (sampled * w_l[..., None]).sum(dim=3).double()
    return out.reshape(B, Q, H * D)


def make_inputs(seed=0, B=2, H=4, D=8, Q=37, P=6,
                shapes=((9, 13), (5, 7), (3, 4))):
    rng = np.random.RandomState(seed)
    L = len(shapes)
    V = sum(h * w for h, w in shapes)
    value = rng.randn(B, V, H, D).astype(np.float32)
    # sampling locations in [-0.2, 1.2] to exercise the zero-padding border
    loc = rng.uniform(-0.2, 1.2, size=(B, Q, H, L, P, 2)).astype(np.float32)
    w = rng.rand(B, Q, H, L, P).astype(np.float32)
    w = w / w.sum(axis=(3, 4), keepdims=True)
    return value, shapes, loc, w


def test_msda_matches_torch_oracle():
    value, shapes, loc, w = make_inputs()
    got = multi_scale_deformable_attention(
        jnp.asarray(value), shapes, jnp.asarray(loc), jnp.asarray(w))
    want = torch_msda_oracle(
        torch.from_numpy(value), shapes, torch.from_numpy(loc),
        torch.from_numpy(w)).numpy()
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5, rtol=1e-5)


def test_msda_chunked_matches_unchunked():
    value, shapes, loc, w = make_inputs(B=1, Q=64)
    full = multi_scale_deformable_attention(
        jnp.asarray(value), shapes, jnp.asarray(loc), jnp.asarray(w))
    chunked = multi_scale_deformable_attention_chunked(
        jnp.asarray(value), shapes, jnp.asarray(loc), jnp.asarray(w),
        chunk_size=16)
    np.testing.assert_allclose(np.asarray(full), np.asarray(chunked),
                               atol=1e-6)
    # non-dividing chunk sizes pad Q to a whole number of chunks instead of
    # silently running unchunked (the base-scale Q=12288 / chunk-8000 OOM,
    # r3) or walking the divisor search to chunk size 1 (ADVICE r3)
    snapped = multi_scale_deformable_attention_chunked(
        jnp.asarray(value), shapes, jnp.asarray(loc), jnp.asarray(w),
        chunk_size=39)
    np.testing.assert_allclose(np.asarray(full), np.asarray(snapped),
                               atol=1e-6)
    # prime Q with a non-dividing chunk: must still match (pads, not a
    # Q-iteration scan)
    value, shapes, loc, w = make_inputs(B=1, Q=61)
    full = multi_scale_deformable_attention(
        jnp.asarray(value), shapes, jnp.asarray(loc), jnp.asarray(w))
    padded = multi_scale_deformable_attention_chunked(
        jnp.asarray(value), shapes, jnp.asarray(loc), jnp.asarray(w),
        chunk_size=16)
    np.testing.assert_allclose(np.asarray(full), np.asarray(padded),
                               atol=1e-6)


def test_bilinear_sample_exact_centres():
    """Sampling exactly at pixel centres returns the pixel values."""
    h, w, D = 5, 6, 3
    rng = np.random.RandomState(1)
    v = rng.randn(1, 1, h * w, D).astype(np.float32)
    ys, xs = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    loc = np.stack([(xs + 0.5) / w, (ys + 0.5) / h],
                   axis=-1).reshape(1, 1, -1, 2).astype(np.float32)
    got = bilinear_sample(jnp.asarray(v), h, w, jnp.asarray(loc))
    np.testing.assert_allclose(np.asarray(got)[0, 0], v[0, 0], atol=1e-6)


def test_bilinear_sample_out_of_bounds_is_zero():
    v = np.ones((1, 1, 12, 2), np.float32)
    loc = np.array([[[[-0.5, 0.5], [1.5, 0.5], [0.5, -0.5], [0.5, 1.5]]]],
                   np.float32)
    got = np.asarray(bilinear_sample(jnp.asarray(v), 3, 4, jnp.asarray(loc)))
    np.testing.assert_allclose(got, 0.0, atol=1e-7)


def test_bilinear_sample_packed_matches_gather4():
    """One-row packed-table sampling == the 4-gather form, values and
    gradients, with locations straddling every border (the clamp-remapped
    weight cases) and fully out of bounds."""
    import jax
    from occnet_tpu.ops.msda import bilinear_sample_packed

    h, w, D = 5, 7, 3
    rng = np.random.RandomState(3)
    v = rng.randn(2, 2, h * w, D).astype(np.float32)
    # span [-0.3, 1.3] normalised so corners fall in-, cross- and out-of-grid
    loc = (rng.rand(2, 2, 64, 2) * 1.6 - 0.3).astype(np.float32)

    f_ref = lambda v_: bilinear_sample(v_, h, w, jnp.asarray(loc))  # noqa
    f_pack = lambda v_: bilinear_sample_packed(  # noqa: E731
        v_, h, w, jnp.asarray(loc))
    np.testing.assert_allclose(np.asarray(f_pack(jnp.asarray(v))),
                               np.asarray(f_ref(jnp.asarray(v))),
                               rtol=1e-5, atol=1e-5)
    g = rng.randn(2, 2, 64, D).astype(np.float32)
    to_scalar = lambda f: lambda v_: jnp.sum(f(v_) * g)  # noqa: E731
    gr = jax.grad(to_scalar(f_ref))(jnp.asarray(v))
    gp = jax.grad(to_scalar(f_pack))(jnp.asarray(v))
    np.testing.assert_allclose(np.asarray(gp), np.asarray(gr),
                               rtol=1e-5, atol=1e-5)


def test_patch_matches_ref_formulation_and_grads():
    """The packed corner-patch fast path == the per-corner reference
    formulation, values AND gradients, including clamp-shifted border
    windows (x0 == -1 / extent-1)."""
    import jax
    from occnet_tpu.ops.msda import multi_scale_deformable_attention_ref

    value, shapes, loc, w = make_inputs(seed=3, Q=29)
    # force plenty of border-window samples around every edge
    loc[0, :5] = np.float32(0.0)                  # x0 = y0 = -1
    loc[0, 5:9] = np.float32(1.0)                 # x0/y0 = extent-1
    loc[0, 9:12, ..., 0] = np.float32(1.0 / 13)   # near-left column, lvl 0
    args = (jnp.asarray(value), shapes, jnp.asarray(loc), jnp.asarray(w))
    got = multi_scale_deformable_attention(*args)
    want = multi_scale_deformable_attention_ref(*args)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=1e-5)

    def loss_patch(v, l, a):
        return jnp.sum(multi_scale_deformable_attention(v, shapes, l, a)
                       ** 2)

    def loss_ref(v, l, a):
        return jnp.sum(multi_scale_deformable_attention_ref(v, shapes, l, a)
                       ** 2)

    g1 = jax.grad(loss_patch, argnums=(0, 1, 2))(
        jnp.asarray(value), jnp.asarray(loc), jnp.asarray(w))
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(
        jnp.asarray(value), jnp.asarray(loc), jnp.asarray(w))
    for a, b, name in zip(g1, g2, ("value", "loc", "weights")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=3e-4, rtol=2e-4, err_msg=name)


@pytest.mark.slow
def test_pallas_kernel_matches_oracle_and_grads():
    """`ops/msda_pallas` (interpreter mode on the CPU test mesh) == torch
    grid_sample oracle == XLA patch formulation, forward and gradients."""
    import jax
    from occnet_tpu.ops.msda_pallas import (
        multi_scale_deformable_attention_pallas)

    value, shapes, loc, w = make_inputs(seed=5, B=1, H=2, D=8, Q=70, P=4)
    got = multi_scale_deformable_attention_pallas(
        jnp.asarray(value), shapes, jnp.asarray(loc), jnp.asarray(w))
    want = torch_msda_oracle(
        torch.from_numpy(value), shapes, torch.from_numpy(loc),
        torch.from_numpy(w)).numpy()
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5, rtol=1e-5)

    def loss_pl(v, l, a):
        return jnp.sum(multi_scale_deformable_attention_pallas(
            v, shapes, l, a) ** 2)

    def loss_xla(v, l, a):
        return jnp.sum(multi_scale_deformable_attention(
            v, shapes, l, a) ** 2)

    g1 = jax.grad(loss_pl, argnums=(0, 1, 2))(
        jnp.asarray(value), jnp.asarray(loc), jnp.asarray(w))
    g2 = jax.grad(loss_xla, argnums=(0, 1, 2))(
        jnp.asarray(value), jnp.asarray(loc), jnp.asarray(w))
    for a, b, name in zip(g1, g2, ("value", "loc", "weights")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=3e-4, rtol=2e-4, err_msg=name)


def test_pallas_banded_level_matches_oracle(monkeypatch):
    """The row-banded kernel for over-budget levels (base-scale level 0) ==
    the torch oracle: shrink the VMEM row budget so every test level runs
    multi-band, covering band-boundary slabs and the pl.when skip logic."""
    import occnet_tpu.ops.msda_pallas as mp

    monkeypatch.setattr(mp, "_VMEM_ROW_BUDGET", 48)
    value, shapes, loc, w = make_inputs(seed=7, B=1, H=2, D=8, Q=70, P=4,
                                        shapes=((9, 13), (8, 9)))
    got = mp.multi_scale_deformable_attention_pallas(
        jnp.asarray(value), shapes, jnp.asarray(loc), jnp.asarray(w))
    want = torch_msda_oracle(
        torch.from_numpy(value), shapes, torch.from_numpy(loc),
        torch.from_numpy(w)).numpy()
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5, rtol=1e-5)


def test_pallas_bf16_aligned_kernel_matches_xla(monkeypatch):
    """The opt-in bf16 VMEM-resident kernel (8-aligned 16-row fetch + one-hot
    sublane selection) == the XLA formulation on bf16 values."""
    import occnet_tpu.ops.msda_pallas as mp

    monkeypatch.setenv("OCCNET_MSDA_BF16_VMEM", "1")
    value, shapes, loc, w = make_inputs(seed=9, B=1, H=2, D=8, Q=70, P=4)
    v16 = jnp.asarray(value, jnp.bfloat16)
    got = mp.multi_scale_deformable_attention_pallas(
        v16, shapes, jnp.asarray(loc), jnp.asarray(w))
    want = multi_scale_deformable_attention(
        v16, shapes, jnp.asarray(loc), jnp.asarray(w))
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        atol=6e-3, rtol=6e-3)
