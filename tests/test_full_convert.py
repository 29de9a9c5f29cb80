"""Full-checkpoint converter round-trip: fabricate a reference-layout
(BEVFormerOcc .pth) state_dict from an initialised tiny gather-mode model by
inverting the documented tensor-layout transforms, convert it back, and check
every parameter and batch-stat leaf is reproduced exactly and that the
conversion covers the COMPLETE tree (no silently-skipped module)."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from occnet_tpu.config import tiny_occ
from occnet_tpu.models.detector import OccNet
from occnet_tpu.utils.torch_convert import load_bevformer_into_variables

STAGE_BLOCKS = (3, 4, 6, 3)


@pytest.fixture(scope="module")
def variables():
    cfg = tiny_occ()
    model_cfg = dataclasses.replace(
        cfg.model, img_h=64, img_w=96, bev_h=10, bev_w=10, pillar_h=4,
        embed_dims=32, out_dim=8, compute_dtype="float32",
        encoder=dataclasses.replace(
            cfg.model.encoder, num_layers=1, ffn_dim=64,
            num_points_in_pillar=4),
    )
    model = OccNet(model_cfg)
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.randn(1, 6, 64, 96, 3).astype(np.float32))
    ego2img = jnp.asarray(
        np.broadcast_to(np.eye(4, dtype=np.float32), (1, 6, 4, 4)))
    return model.init({"params": jax.random.PRNGKey(0)}, img, ego2img)


def _randomize(tree, rng):
    return jax.tree_util.tree_map(
        lambda x: np.asarray(rng.randn(*np.shape(x)), np.float32), tree)


def _fabricate_state_dict(params, stats):
    """Our variables -> reference-layout torch state_dict (numpy values),
    inverting the converter's layout transforms."""
    sd = {}

    def lin(src, dst):
        sd[f"{dst}.weight"] = np.transpose(src["kernel"])
        if "bias" in src:
            sd[f"{dst}.bias"] = src["bias"]

    def conv2d(src, dst):
        sd[f"{dst}.weight"] = np.transpose(src["kernel"], (3, 2, 0, 1))
        if "bias" in src:
            sd[f"{dst}.bias"] = src["bias"]

    def bn(p, s, dst):
        sd[f"{dst}.weight"] = p["scale"]
        sd[f"{dst}.bias"] = p["bias"]
        sd[f"{dst}.running_mean"] = s["mean"]
        sd[f"{dst}.running_var"] = s["var"]

    # backbone (torchvision names); conv1 input channels are BGR-flipped by
    # the converter, so pre-flip here to round-trip
    bb, bs = params["backbone"], stats["backbone"]
    sd["img_backbone.conv1.weight"] = np.transpose(
        bb["conv1"]["kernel"][:, :, ::-1, :], (3, 2, 0, 1))
    bn(bb["bn1"], bs["bn1"], "img_backbone.bn1")
    for stage, n_blocks in enumerate(STAGE_BLOCKS):
        for b in range(n_blocks):
            ours = bb[f"layer{stage + 1}_{b}"]
            ourss = bs[f"layer{stage + 1}_{b}"]
            dst = f"img_backbone.layer{stage + 1}.{b}"
            for ci in (1, 2, 3):
                conv2d(ours[f"conv{ci}"], f"{dst}.conv{ci}")
                bn(ours[f"bn{ci}"], ourss[f"bn{ci}"], f"{dst}.bn{ci}")
            if "downsample_conv" in ours:
                conv2d(ours["downsample_conv"], f"{dst}.downsample.0")
                bn(ours["downsample_bn"], ourss["downsample_bn"],
                   f"{dst}.downsample.1")

    # FPN: 3 laterals + 3 fpn convs + 1 extra (stored as fpn_convs.3)
    for i in range(3):
        conv2d(params["neck"][f"lateral_{i}"],
               f"img_neck.lateral_convs.{i}.conv")
        conv2d(params["neck"][f"fpn_{i}"], f"img_neck.fpn_convs.{i}.conv")
    conv2d(params["neck"]["fpn_extra_0"], "img_neck.fpn_convs.3.conv")

    head = params["head"]
    sd["pts_bbox_head.bev_embedding.weight"] = head["bev_embedding"]
    pe = head["positional_encoding"]
    sd["pts_bbox_head.positional_encoding.row_embed.weight"] = pe["row_embed"]
    sd["pts_bbox_head.positional_encoding.col_embed.weight"] = pe["col_embed"]

    T = "pts_bbox_head.transformer"
    trans = head["transformer"]
    sd[f"{T}.level_embeds"] = trans["level_embeds"]
    sd[f"{T}.cams_embeds"] = trans["cams_embeds"]
    for lname, layer in trans["encoder"].items():
        i = int(lname.replace("layer", ""))
        E = f"{T}.encoder.layers.{i}"
        for name in ("sampling_offsets", "attention_weights", "value_proj",
                     "output_proj"):
            lin(layer["self_attn"][name], f"{E}.attentions.0.{name}")
        for name in ("sampling_offsets", "attention_weights", "value_proj"):
            lin(layer["cross_attn"]["deformable_attention"][name],
                f"{E}.attentions.1.deformable_attention.{name}")
        lin(layer["cross_attn"]["output_proj"],
            f"{E}.attentions.1.output_proj")
        lin(layer["ffn"]["fc1"], f"{E}.ffns.0.layers.0.0")
        lin(layer["ffn"]["fc2"], f"{E}.ffns.0.layers.1")
        for j in range(3):
            sd[f"{E}.norms.{j}.weight"] = layer[f"norm{j + 1}"]["scale"]
            sd[f"{E}.norms.{j}.bias"] = layer[f"norm{j + 1}"]["bias"]
    for j in (0, 1):
        dec = trans[f"decoder{j}"]
        decs = stats["head"]["transformer"][f"decoder{j}"]
        sd[f"{T}.decoder.{j}.conv.weight"] = np.transpose(
            dec["conv"]["kernel"], (4, 3, 0, 1, 2))
        bn_dst = f"{T}.decoder.{j}.bn"
        sd[f"{bn_dst}.weight"] = dec["bn"]["scale"]
        sd[f"{bn_dst}.bias"] = dec["bn"]["bias"]
        sd[f"{bn_dst}.running_mean"] = decs["bn"]["mean"]
        sd[f"{bn_dst}.running_var"] = decs["bn"]["var"]
    for name in ("predicter", "flow_predicter"):
        lin(trans[name]["fc1"], f"{T}.{name}.0")
        lin(trans[name]["fc2"], f"{T}.{name}.2")
    return sd


def test_full_checkpoint_round_trip(variables):
    rng = np.random.RandomState(1)
    want_params = _randomize(variables["params"], rng)
    want_stats = _randomize(variables["batch_stats"], rng)
    sd = _fabricate_state_dict(want_params, want_stats)

    new_vars = load_bevformer_into_variables(
        {"params": variables["params"], "batch_stats":
         variables["batch_stats"]},
        sd, depth=50, num_encoder_layers=1)

    flat_want = jax.tree_util.tree_leaves_with_path(want_params)
    flat_got = dict(jax.tree_util.tree_leaves_with_path(new_vars["params"]))
    assert len(flat_want) == len(flat_got)
    for path, w in flat_want:
        np.testing.assert_array_equal(
            np.asarray(flat_got[path]), w, err_msg=str(path))
    for path, w in jax.tree_util.tree_leaves_with_path(want_stats):
        got = dict(jax.tree_util.tree_leaves_with_path(
            new_vars["batch_stats"]))[path]
        np.testing.assert_array_equal(np.asarray(got), w, err_msg=str(path))


def test_converter_rejects_shape_mismatch(variables):
    rng = np.random.RandomState(2)
    params = _randomize(variables["params"], rng)
    stats = _randomize(variables["batch_stats"], rng)
    sd = _fabricate_state_dict(params, stats)
    sd["pts_bbox_head.bev_embedding.weight"] = np.zeros((3, 3), np.float32)
    with pytest.raises(ValueError):
        load_bevformer_into_variables(
            {"params": variables["params"],
             "batch_stats": variables["batch_stats"]},
            sd, depth=50, num_encoder_layers=1)
