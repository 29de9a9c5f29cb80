"""Weight-converter and visualisation tests (CPU-only)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def _fake_torchvision_resnet50_sd():
    """State dict with torchvision resnet50 names/shapes (random values)."""
    rng = np.random.RandomState(0)
    sd = {}

    def conv(name, o, i, k):
        sd[name] = rng.randn(o, i, k, k).astype(np.float32)

    def bn(name, c):
        sd[f"{name}.weight"] = rng.rand(c).astype(np.float32)
        sd[f"{name}.bias"] = rng.randn(c).astype(np.float32)
        sd[f"{name}.running_mean"] = rng.randn(c).astype(np.float32)
        sd[f"{name}.running_var"] = rng.rand(c).astype(np.float32) + 0.5

    conv("conv1.weight", 64, 3, 7)
    bn("bn1", 64)
    blocks = (3, 4, 6, 3)
    inc = 64
    for s, n in enumerate(blocks):
        mid = 64 * 2 ** s
        out = mid * 4
        for b in range(n):
            p = f"layer{s + 1}.{b}"
            conv(f"{p}.conv1.weight", mid, inc if b == 0 else out, 1)
            bn(f"{p}.bn1", mid)
            conv(f"{p}.conv2.weight", mid, mid, 3)
            bn(f"{p}.bn2", mid)
            conv(f"{p}.conv3.weight", out, mid, 1)
            bn(f"{p}.bn3", out)
            if b == 0:
                conv(f"{p}.downsample.0.weight", out, inc, 1)
                bn(f"{p}.downsample.1", out)
        inc = out
    return sd


@pytest.mark.slow
def test_resnet_conversion_numerics():
    """Converted weights reproduce torch's forward on a small crop: compare
    our flax ResNet stem+block against a torch reimplementation of the same
    ops using the identical weights."""
    import torch
    import torch.nn.functional as F
    from occnet_tpu.models.resnet import ResNet
    from occnet_tpu.utils.torch_convert import load_resnet_into_variables

    sd = _fake_torchvision_resnet50_sd()
    model = ResNet(depth=50, out_indices=(0, 1, 2, 3), frozen_stages=-1,
                   dtype=jnp.float32)
    x = np.random.RandomState(1).randn(1, 64, 64, 3).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x))
    variables = load_resnet_into_variables(
        dict(variables), sd, depth=50, flip_input_channels=False, subtree="")
    outs = model.apply(variables, jnp.asarray(x))

    # torch oracle for the stem output (post conv1/bn1/relu/maxpool)
    xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
    w = torch.from_numpy(sd["conv1.weight"])
    y = F.conv2d(xt, w, stride=2, padding=3)
    y = F.batch_norm(y, torch.from_numpy(sd["bn1.running_mean"]),
                     torch.from_numpy(sd["bn1.running_var"]),
                     torch.from_numpy(sd["bn1.weight"]),
                     torch.from_numpy(sd["bn1.bias"]), eps=1e-5)
    y = F.relu(y)
    y = F.max_pool2d(y, 3, stride=2, padding=1)

    # full stage-1 oracle
    def torch_block(x, p, stride, has_down):
        idn = x
        o = F.conv2d(x, torch.from_numpy(sd[f"{p}.conv1.weight"]))
        o = F.batch_norm(o, torch.from_numpy(sd[f"{p}.bn1.running_mean"]),
                         torch.from_numpy(sd[f"{p}.bn1.running_var"]),
                         torch.from_numpy(sd[f"{p}.bn1.weight"]),
                         torch.from_numpy(sd[f"{p}.bn1.bias"]), eps=1e-5)
        o = F.relu(o)
        o = F.conv2d(o, torch.from_numpy(sd[f"{p}.conv2.weight"]),
                     stride=stride, padding=1)
        o = F.batch_norm(o, torch.from_numpy(sd[f"{p}.bn2.running_mean"]),
                         torch.from_numpy(sd[f"{p}.bn2.running_var"]),
                         torch.from_numpy(sd[f"{p}.bn2.weight"]),
                         torch.from_numpy(sd[f"{p}.bn2.bias"]), eps=1e-5)
        o = F.relu(o)
        o = F.conv2d(o, torch.from_numpy(sd[f"{p}.conv3.weight"]))
        o = F.batch_norm(o, torch.from_numpy(sd[f"{p}.bn3.running_mean"]),
                         torch.from_numpy(sd[f"{p}.bn3.running_var"]),
                         torch.from_numpy(sd[f"{p}.bn3.weight"]),
                         torch.from_numpy(sd[f"{p}.bn3.bias"]), eps=1e-5)
        if has_down:
            idn = F.conv2d(x, torch.from_numpy(
                sd[f"{p}.downsample.0.weight"]), stride=stride)
            idn = F.batch_norm(
                idn, torch.from_numpy(sd[f"{p}.downsample.1.running_mean"]),
                torch.from_numpy(sd[f"{p}.downsample.1.running_var"]),
                torch.from_numpy(sd[f"{p}.downsample.1.weight"]),
                torch.from_numpy(sd[f"{p}.downsample.1.bias"]), eps=1e-5)
        return F.relu(o + idn)

    for b in range(3):
        y = torch_block(y, f"layer1.{b}", 1, b == 0)
    want = y.numpy().transpose(0, 2, 3, 1)
    got = np.asarray(outs[0])
    # random-weight activations compound to ~1e4 after 3 blocks; allow fp32
    # accumulation-order noise
    np.testing.assert_allclose(got, want, atol=1e-3, rtol=2e-2)


def test_vis_utils(tmp_path):
    from occnet_tpu.utils.vis import (
        occupancy_to_bev_image, save_occupancy_bev, save_tensor,
        save_voxel_scatter)
    rng = np.random.RandomState(0)
    sem = np.full((50, 50, 8), 16, np.int32)
    sem[10:20, 10:20, :3] = 0
    img = occupancy_to_bev_image(sem)
    assert img.shape == (50, 50, 3)
    # column with a car on top gets the car colour
    assert tuple(img[15, 15]) == (255, 158, 0)
    save_occupancy_bev(sem, str(tmp_path / "bev.png"))
    save_voxel_scatter(sem, str(tmp_path / "vox.png"))
    save_tensor(rng.randn(16, 16), str(tmp_path / "t.png"))
    for f in ("bev.png", "vox.png", "t.png"):
        assert (tmp_path / f).stat().st_size > 0
