"""Modulated deformable conv vs a direct numpy oracle, plus: zero offsets
reduce DCN to a plain conv, and the R101-DCN backbone stages build/run."""

import numpy as np

import jax
import jax.numpy as jnp

from occnet_tpu.ops.deform_conv import modulated_deform_conv


def _oracle(x, offset, mask, weight, stride, dilation):
    B, h, w, Cin = x.shape
    kh, kw, _, Cout = weight.shape
    K = kh * kw
    pad = dilation * (kh - 1) // 2
    ho, wo = -(-h // stride), -(-w // stride)
    out = np.zeros((B, ho, wo, Cout), np.float64)

    def sample(b, y, xx):
        y0, x0 = int(np.floor(y)), int(np.floor(xx))
        ty, tx = y - y0, xx - x0
        acc = np.zeros(Cin)
        for dy in (0, 1):
            for dx in (0, 1):
                cy, cx = y0 + dy, x0 + dx
                if 0 <= cy < h and 0 <= cx < w:
                    wgt = (ty if dy else 1 - ty) * (tx if dx else 1 - tx)
                    acc += wgt * x[b, cy, cx]
        return acc

    for b in range(B):
        for i in range(ho):
            for j in range(wo):
                for k in range(K):
                    ky, kx = divmod(k, kw)
                    py = i * stride - pad + ky * dilation + offset[b, i, j,
                                                                  2 * k]
                    px = j * stride - pad + kx * dilation + offset[b, i, j,
                                                                   2 * k + 1]
                    s = sample(b, py, px) * (
                        mask[b, i, j, k] if mask is not None else 1.0)
                    out[b, i, j] += s @ weight[ky, kx]
    return out.astype(np.float32)


def test_dcn_matches_oracle():
    rng = np.random.RandomState(0)
    B, h, w, Cin, Cout = 2, 7, 9, 4, 5
    x = rng.randn(B, h, w, Cin).astype(np.float32)
    offset = (rng.randn(B, h, w, 18) * 1.5).astype(np.float32)
    mask = rng.rand(B, h, w, 9).astype(np.float32)
    weight = rng.randn(3, 3, Cin, Cout).astype(np.float32)

    got = np.asarray(modulated_deform_conv(
        jnp.asarray(x), jnp.asarray(offset), jnp.asarray(mask),
        jnp.asarray(weight)))
    want = _oracle(x, offset, mask, weight, 1, 1)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_dcn_stride2_matches_oracle():
    rng = np.random.RandomState(1)
    B, h, w, Cin, Cout = 1, 8, 6, 3, 4
    x = rng.randn(B, h, w, Cin).astype(np.float32)
    offset = (rng.randn(B, 4, 3, 18) * 1.0).astype(np.float32)
    mask = rng.rand(B, 4, 3, 9).astype(np.float32)
    weight = rng.randn(3, 3, Cin, Cout).astype(np.float32)
    got = np.asarray(modulated_deform_conv(
        jnp.asarray(x), jnp.asarray(offset), jnp.asarray(mask),
        jnp.asarray(weight), stride=2))
    want = _oracle(x, offset, mask, weight, 2, 1)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_zero_offset_unit_mask_is_plain_conv():
    rng = np.random.RandomState(2)
    B, h, w, Cin, Cout = 1, 6, 6, 3, 8
    x = rng.randn(B, h, w, Cin).astype(np.float32)
    weight = rng.randn(3, 3, Cin, Cout).astype(np.float32)
    offset = np.zeros((B, h, w, 18), np.float32)
    got = np.asarray(modulated_deform_conv(
        jnp.asarray(x), jnp.asarray(offset), None, jnp.asarray(weight)))
    want = jax.lax.conv_general_dilated(
        jnp.asarray(x), jnp.asarray(weight), (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    np.testing.assert_allclose(got, np.asarray(want), rtol=1e-4, atol=1e-4)


def test_r101_dcn_backbone_builds():
    from occnet_tpu.models.resnet import ResNet
    model = ResNet(depth=50, out_indices=(1, 2, 3),
                   dcn_stages=(False, False, True, True),
                   dtype=jnp.float32)
    x = jnp.asarray(np.random.RandomState(3).randn(1, 64, 96, 3),
                    jnp.float32)
    vars_ = model.init({"params": jax.random.PRNGKey(0)}, x)
    outs = model.apply(vars_, x)
    assert len(outs) == 3
    # DCN params exist on stage-3/4 blocks only
    p = vars_["params"]
    assert "conv_offset" in p["layer3_0"]["conv2"]
    assert "conv_offset" in p["layer4_0"]["conv2"]
    assert "conv_offset" not in p["layer2_0"].get("conv2", {})
    assert all(np.isfinite(np.asarray(o)).all() for o in outs)


def test_converter_maps_dcn_blocks():
    """mmcv ModulatedDeformConv2dPack keys (conv2.weight +
    conv2.conv_offset.{weight,bias}) convert into the flax DCN layout."""
    from occnet_tpu.utils.torch_convert import convert_torchvision_resnet
    rng = np.random.RandomState(0)
    sd = {}

    def add_bn(prefix, c):
        sd[f"{prefix}.weight"] = rng.randn(c).astype(np.float32)
        sd[f"{prefix}.bias"] = rng.randn(c).astype(np.float32)
        sd[f"{prefix}.running_mean"] = rng.randn(c).astype(np.float32)
        sd[f"{prefix}.running_var"] = rng.rand(c).astype(np.float32)

    sd["conv1.weight"] = rng.randn(64, 3, 7, 7).astype(np.float32)
    add_bn("bn1", 64)
    for stage, n_blocks in enumerate((3, 4, 6, 3)):
        cin = 64 * (2 ** stage) * (1 if stage == 0 else 2)
        mid = 64 * (2 ** stage)
        for b in range(n_blocks):
            src = f"layer{stage + 1}.{b}"
            sd[f"{src}.conv1.weight"] = rng.randn(
                mid, 4, 1, 1).astype(np.float32)
            if stage >= 2:   # DCN stages
                sd[f"{src}.conv2.weight"] = rng.randn(
                    mid, mid, 3, 3).astype(np.float32)
                sd[f"{src}.conv2.conv_offset.weight"] = rng.randn(
                    27, mid, 3, 3).astype(np.float32)
                sd[f"{src}.conv2.conv_offset.bias"] = np.zeros(
                    27, np.float32)
            else:
                sd[f"{src}.conv2.weight"] = rng.randn(
                    mid, mid, 3, 3).astype(np.float32)
            sd[f"{src}.conv3.weight"] = rng.randn(
                mid * 4, mid, 1, 1).astype(np.float32)
            for ci, c in ((1, mid), (2, mid), (3, mid * 4)):
                add_bn(f"{src}.bn{ci}", c)

    params, stats = convert_torchvision_resnet(sd, depth=50)
    assert "conv_offset" in params["layer3_0"]["conv2"]
    assert "conv_offset" not in params["layer2_0"]["conv2"]
    np.testing.assert_allclose(
        params["layer3_0"]["conv2"]["conv_offset"]["kernel"],
        np.transpose(sd["layer3.0.conv2.conv_offset.weight"], (2, 3, 1, 0)))
    assert params["layer3_0"]["conv2"]["kernel"].shape == (3, 3, 256, 256)
