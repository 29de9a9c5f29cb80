"""VoVNet backbone: spec coverage, ceil-mode pooling vs torch, frozen
stages, and checkpoint-converter round-trip (reference
`models/backbones/vovnet.py`)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from occnet_tpu.models.vovnet import VOVNET_SPECS, VoVNet, _ceil_maxpool
from occnet_tpu.utils.torch_convert import load_vovnet_into_variables


def _init(spec, hw=(64, 96), frozen_stages=-1):
    model = VoVNet(spec=spec, out_indices=(1, 2, 3),
                   frozen_stages=frozen_stages)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(1, *hw, 3).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x)
    return model, variables, x


@pytest.mark.slow
def test_all_seven_specs_build_and_forward():
    assert len(VOVNET_SPECS) == 7
    for spec, s in VOVNET_SPECS.items():
        model, variables, x = _init(spec)
        outs = model.apply(variables, x)
        assert len(outs) == 3
        # strides 8/16/32, channels from the spec table
        for i, o in enumerate(outs):
            assert o.shape[1] == 64 // (8 * 2 ** i)
            assert o.shape[-1] == s["out"][i + 1]


def test_ceil_maxpool_matches_torch_ceil_mode():
    import torch
    rng = np.random.RandomState(1)
    for h, w in ((56, 56), (57, 55), (14, 20), (13, 13)):
        x = rng.randn(1, h, w, 5).astype(np.float32)
        ours = np.asarray(_ceil_maxpool(jnp.asarray(x)))
        ref = torch.nn.functional.max_pool2d(
            torch.as_tensor(x).permute(0, 3, 1, 2), 3, 2,
            ceil_mode=True).permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(ours, ref, atol=1e-6)


@pytest.mark.slow
def test_frozen_stages_cut_gradients():
    model, variables, x = _init("V-19-slim-eSE", frozen_stages=1)

    def loss(params):
        outs = model.apply({"params": params,
                            "batch_stats": variables["batch_stats"]}, x)
        return sum(jnp.sum(o * o) for o in outs)

    g = jax.grad(loss)(variables["params"])
    flat = jax.tree_util.tree_flatten_with_path(g)[0]
    for path, leaf in flat:
        name = "/".join(str(p.key) for p in path)
        norm = float(jnp.abs(leaf).sum())
        if name.startswith(("stem", "stage2_")):
            assert norm == 0.0, f"frozen {name} got gradient"
        elif name.startswith("stage3_0/concat"):
            assert norm > 0.0, f"live {name} has zero gradient"


def _fabricate_vovnet_sd(params, stats, spec):
    """Flax variables -> reference-layout torch state_dict (numpy), inverting
    the converter's transforms; also returns the key count for coverage."""
    s = VOVNET_SPECS[spec]
    sd = {}

    def put_conv(src, dst):
        sd[f"{dst}.weight"] = np.transpose(src["kernel"], (3, 2, 0, 1))
        if "bias" in src:
            sd[f"{dst}.bias"] = src["bias"]

    def put_bn(p, st, dst):
        sd[f"{dst}.weight"] = p["scale"]
        sd[f"{dst}.bias"] = p["bias"]
        sd[f"{dst}.running_mean"] = st["mean"]
        sd[f"{dst}.running_var"] = st["var"]

    def put_block(bp, bs, src):
        if "dw_conv" in bp:
            put_conv(bp["dw_conv"], f"{src}/dw_conv3x3")
            put_conv(bp["pw_conv"], f"{src}/pw_conv1x1")
            put_bn(bp["pw_bn"], bs["pw_bn"], f"{src}/pw_norm")
        else:
            put_conv(bp["conv"], f"{src}/conv")
            put_bn(bp["bn"], bs["bn"], f"{src}/norm")

    for i, post in ((0, "stem_1"), (1, "stem_2"), (2, "stem_3")):
        put_block(params[f"stem{i}"], stats[f"stem{i}"], f"stem.{post}")
    for stage in range(4):
        sn = stage + 2
        for b in range(s["blocks"][stage]):
            src = f"stage{sn}.OSA{sn}_{b + 1}"
            bp, bs = params[f"stage{sn}_{b}"], stats[f"stage{sn}_{b}"]
            if "reduction" in bp:
                put_block(bp["reduction"], bs["reduction"],
                          f"{src}.conv_reduction.OSA{sn}_{b + 1}_reduction_0")
            for i in range(s["layers"]):
                put_block(bp[f"l{i}"], bs[f"l{i}"],
                          f"{src}.layers.{i}.OSA{sn}_{b + 1}_{i}")
            put_block(bp["concat"], bs["concat"],
                      f"{src}.concat.OSA{sn}_{b + 1}_concat")
            put_conv(bp["ese"]["fc"], f"{src}.ese.fc")
    return sd


@pytest.mark.parametrize("spec", ["V-19-slim-eSE", "V-19-slim-dw-eSE",
                                  "V-19-dw-eSE"])
def test_vovnet_converter_round_trip(spec):
    _, variables, _ = _init(spec)
    rng = np.random.RandomState(2)
    rand = jax.tree_util.tree_map(
        lambda x: np.asarray(rng.randn(*np.shape(x)), np.float32), variables)
    sd = _fabricate_vovnet_sd(rand["params"], rand["batch_stats"], spec)
    new_vars = load_vovnet_into_variables(
        {"params": {"backbone": variables["params"]},
         "batch_stats": {"backbone": variables["batch_stats"]}},
        sd, spec=spec, flip_input_channels=False)
    got_p = new_vars["params"]["backbone"]
    got_s = new_vars["batch_stats"]["backbone"]
    # every leaf reproduced exactly -> the converter covers the whole tree
    for got, want in ((got_p, rand["params"]),
                      (got_s, rand["batch_stats"])):
        flat_g = jax.tree_util.tree_flatten_with_path(got)[0]
        flat_w = dict(jax.tree_util.tree_flatten_with_path(want)[0])
        assert len(flat_g) == len(flat_w)
        for path, leaf in flat_g:
            np.testing.assert_array_equal(np.asarray(leaf), flat_w[path],
                                          err_msg=str(path))


def test_vovnet_converter_flips_input_channels():
    _, variables, _ = _init("V-19-slim-eSE")
    rng = np.random.RandomState(3)
    rand = jax.tree_util.tree_map(
        lambda x: np.asarray(rng.randn(*np.shape(x)), np.float32), variables)
    sd = _fabricate_vovnet_sd(rand["params"], rand["batch_stats"],
                              "V-19-slim-eSE")
    new_vars = load_vovnet_into_variables(
        {"params": {"backbone": variables["params"]},
         "batch_stats": {"backbone": variables["batch_stats"]}},
        sd, spec="V-19-slim-eSE", flip_input_channels=True)
    got = np.asarray(new_vars["params"]["backbone"]["stem0"]["conv"]["kernel"])
    np.testing.assert_array_equal(
        got, rand["params"]["stem0"]["conv"]["kernel"][:, :, ::-1, :])
