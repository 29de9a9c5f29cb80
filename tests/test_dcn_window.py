"""Dense window-kernel DCNv2 vs the gather formulation: values, gradients,
overflow certificate semantics, and out-of-image zeroing."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from occnet_tpu.ops.dcn_window import (
    _sampled_gather,
    _sampled_window,
    modulated_deform_conv_window,
)
from occnet_tpu.ops.deform_conv import modulated_deform_conv


def _rand_case(seed, B=2, h=7, w=9, Cin=4, Cout=5, off_scale=1.5):
    rng = np.random.RandomState(seed)
    x = rng.randn(B, h, w, Cin).astype(np.float32)
    offset = (rng.randn(B, h, w, 18) * off_scale).astype(np.float32)
    mask = rng.rand(B, h, w, 9).astype(np.float32)
    weight = rng.randn(3, 3, Cin, Cout).astype(np.float32)
    return x, offset, mask, weight


def test_window_matches_gather_when_in_window():
    x, offset, mask, weight = _rand_case(0)
    # keep floor(off) within [-R, R] for R=3
    offset = np.clip(offset, -2.9, 2.9)
    got, overflow = modulated_deform_conv_window(
        jnp.asarray(x), jnp.asarray(offset), jnp.asarray(mask),
        jnp.asarray(weight), radius=3)
    want = modulated_deform_conv(
        jnp.asarray(x), jnp.asarray(offset), jnp.asarray(mask),
        jnp.asarray(weight))
    assert int(overflow) == 0
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_window_no_mask_matches_gather():
    x, offset, _, weight = _rand_case(1)
    offset = np.clip(offset, -1.9, 1.9)
    got, overflow = modulated_deform_conv_window(
        jnp.asarray(x), jnp.asarray(offset), None,
        jnp.asarray(weight), radius=2)
    want = modulated_deform_conv(
        jnp.asarray(x), jnp.asarray(offset), None, jnp.asarray(weight))
    assert int(overflow) == 0
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_overflow_certificate_counts_only_contributing_samples():
    x, offset, mask, weight = _rand_case(2)
    offset = np.clip(offset, -0.9, 0.9)
    # one in-image sample pushed past the window: must count
    offset[0, 3, 4, 0] = 2.7        # tap 0 dy; floor=2 > R=1
    # one sample pushed fully out of the image: zero contribution either
    # way, must NOT count and must not change the output
    offset[1, 0, 0, 0] = -30.0
    _, overflow = _sampled_window(
        jnp.asarray(x), jnp.asarray(offset), jnp.asarray(mask), 1)
    assert int(overflow) == 1

    # the out-of-image sample alone -> exact, certificate clean
    offset[0, 3, 4, 0] = 0.5
    got, overflow = modulated_deform_conv_window(
        jnp.asarray(x), jnp.asarray(offset), jnp.asarray(mask),
        jnp.asarray(weight), radius=1)
    want = modulated_deform_conv(
        jnp.asarray(x), jnp.asarray(offset), jnp.asarray(mask),
        jnp.asarray(weight))
    assert int(overflow) == 0
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_window_gradients_match_gather():
    x, offset, mask, _ = _rand_case(3, Cin=3)
    offset = np.clip(offset, -1.9, 1.9)
    g = np.random.RandomState(7).randn(2, 7 * 9, 9, 3).astype(np.float32)

    def win(x_, o_, m_):
        from occnet_tpu.ops.dcn_window import _sampled_window_vjp
        return jnp.sum(_sampled_window_vjp(x_, o_, m_, 2) * g)

    def gat(x_, o_, m_):
        return jnp.sum(_sampled_gather(x_, o_, m_) * g)

    args = (jnp.asarray(x), jnp.asarray(offset), jnp.asarray(mask))
    for i in range(3):
        gw = jax.grad(win, argnums=i)(*args)
        gg = jax.grad(gat, argnums=i)(*args)
        np.testing.assert_allclose(np.asarray(gw), np.asarray(gg),
                                   rtol=1e-4, atol=1e-4, err_msg=f"arg {i}")


@pytest.mark.slow
def test_backbone_window_mode_sows_certificate():
    """DCN stages in window mode run and expose `dcn_window_overflow`
    intermediates; zero-init offsets (the mmcv init) certify exact."""
    from occnet_tpu.models.resnet import ResNet
    model = ResNet(depth=50, out_indices=(1, 2, 3),
                   dcn_stages=(False, False, True, True),
                   dcn_mode="window", dcn_window_radius=1,
                   dtype=jnp.float32)
    x = jnp.asarray(np.random.RandomState(5).randn(1, 64, 96, 3),
                    jnp.float32)
    vars_ = model.init({"params": jax.random.PRNGKey(0)}, x)
    outs, aux = model.apply(vars_, x, mutable=["intermediates"])
    leaves = [(path, leaf) for path, leaf in
              jax.tree_util.tree_leaves_with_path(aux["intermediates"])
              if any("dcn_window_overflow" in str(k) for k in path)]
    # stage 3 has 6 blocks + stage 4 has 3; the two stride-2 entry blocks
    # fall back to the gather path and sow nothing
    assert len(leaves) == 7
    assert all(int(leaf) == 0 for _, leaf in leaves)
    assert all(np.isfinite(np.asarray(o)).all() for o in outs)


def test_kernel_variants_agree(monkeypatch):
    """The dyabs-major kernel (default) and the legacy (ky, sy)-major
    nesting compute the identical function."""
    x, offset, mask, weight = _rand_case(6)
    offset = np.clip(offset, -2.5, 2.5)
    args = (jnp.asarray(x), jnp.asarray(offset), jnp.asarray(mask),
            jnp.asarray(weight))
    monkeypatch.setenv("OCCNET_DCN_KERNEL", "dymajor")
    got_dy, over_dy = modulated_deform_conv_window(*args, radius=3)
    monkeypatch.setenv("OCCNET_DCN_KERNEL", "legacy")
    got_legacy, over_legacy = modulated_deform_conv_window(*args, radius=3)
    assert int(over_dy) == int(over_legacy) == 0
    np.testing.assert_allclose(np.asarray(got_dy), np.asarray(got_legacy),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.slow
def test_needed_radius_is_tight():
    """`needed_radius` is exactly the smallest exact radius: certificate
    clean at R=needed (and values match gather), nonzero at R=needed-1."""
    from occnet_tpu.ops.dcn_window import needed_radius

    x, offset, mask, weight = _rand_case(8, off_scale=2.0)
    need = int(needed_radius(jnp.asarray(offset), 7, 9))
    assert need >= 1
    got, overflow = modulated_deform_conv_window(
        jnp.asarray(x), jnp.asarray(offset), jnp.asarray(mask),
        jnp.asarray(weight), radius=need)
    want = modulated_deform_conv(
        jnp.asarray(x), jnp.asarray(offset), jnp.asarray(mask),
        jnp.asarray(weight))
    assert int(overflow) == 0
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)
    _, under = _sampled_window(jnp.asarray(x), jnp.asarray(offset),
                               jnp.asarray(mask), need - 1)
    assert int(under) > 0


def test_zero_offsets_certify_radius_zero():
    """The mmcv zero-init offset field needs R=0, and the kernel is exact
    there (the cheapest possible window: S=2 slots per axis)."""
    from occnet_tpu.ops.dcn_window import needed_radius

    x, offset, mask, weight = _rand_case(9)
    offset = np.zeros_like(offset)
    assert int(needed_radius(jnp.asarray(offset), 7, 9)) == 0
    got, overflow = modulated_deform_conv_window(
        jnp.asarray(x), jnp.asarray(offset), jnp.asarray(mask),
        jnp.asarray(weight), radius=0)
    want = modulated_deform_conv(
        jnp.asarray(x), jnp.asarray(offset), jnp.asarray(mask),
        jnp.asarray(weight))
    assert int(overflow) == 0
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_dcn_layer_indices_map():
    from occnet_tpu.models.resnet import dcn_layer_indices
    idx = dcn_layer_indices(50, (False, False, True, True))
    assert idx == {"layer3_0": 0, "layer3_1": 1, "layer3_2": 2,
                   "layer3_3": 3, "layer3_4": 4, "layer3_5": 5,
                   "layer4_0": 6, "layer4_1": 7, "layer4_2": 8}


@pytest.mark.slow
def test_backbone_per_layer_radii_and_needed_sow():
    """Per-layer `dcn_window_radii` plumb through ResNet, and every
    window-eligible DCN layer sows `dcn_radius_needed` (zero for the
    zero-init offsets) — the contract of tools/test.py's one-pass probe."""
    from occnet_tpu.models.resnet import ResNet
    model = ResNet(depth=50, out_indices=(1, 2, 3),
                   dcn_stages=(False, False, True, True),
                   dcn_mode="window", dcn_window_radius=3,
                   dcn_window_radii=(1, 0, 2, 1, 0, 1, 2, 0, 1),
                   dtype=jnp.float32)
    x = jnp.asarray(np.random.RandomState(5).randn(1, 64, 96, 3),
                    jnp.float32)
    vars_ = model.init({"params": jax.random.PRNGKey(0)}, x)
    outs, aux = model.apply(vars_, x, mutable=["intermediates"])
    over = [(p, l) for p, l in
            jax.tree_util.tree_leaves_with_path(aux["intermediates"])
            if any("dcn_window_overflow" in str(k) for k in p)]
    need = [(p, l) for p, l in
            jax.tree_util.tree_leaves_with_path(aux["intermediates"])
            if any("dcn_radius_needed" in str(k) for k in p)]
    # 9 DCN blocks; the two stride-2 entry blocks use the gather path
    assert len(over) == 7 and len(need) == 7
    assert all(int(l) == 0 for _, l in over)
    assert all(int(l) == 0 for _, l in need)
    assert all(np.isfinite(np.asarray(o)).all() for o in outs)


@pytest.mark.parametrize("radius", [1, 4])
def test_window_radii(radius):
    x, offset, mask, weight = _rand_case(4)
    offset = np.clip(offset, -(radius - 0.1), radius - 0.1)
    got, overflow = modulated_deform_conv_window(
        jnp.asarray(x), jnp.asarray(offset), jnp.asarray(mask),
        jnp.asarray(weight), radius=radius)
    want = modulated_deform_conv(
        jnp.asarray(x), jnp.asarray(offset), jnp.asarray(mask),
        jnp.asarray(weight))
    assert int(overflow) == 0
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)
