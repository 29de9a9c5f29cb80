"""End-to-end cross-implementation logit parity.

THE correctness oracle VERDICT r2 asked for: a pure-torch re-statement of the
reference BEVFormerOcc forward (`tests/torch_reference_occnet.py`, semantics
read from `/root/reference/projects/mmdet3d_plugin/bevformer/...`) and the
converted JAX model are driven from ONE fabricated reference-layout torch
state_dict and must produce the same occupancy/flow logits to ~1e-4 in fp32.

Unlike `test_full_convert.py` (which round-trips the converter's own layout
transforms and is therefore blind to a systematic convention error), the two
forwards here are independent implementations: a transposed FFN kernel, a
wrong BN epsilon, a mis-ordered cam/level embed add, a flipped (row, col)
positional-encoding concat, or a z-anchor/offset distribution mismatch all
produce different logits.  `test_parity_is_sensitive` proves the comparison
has teeth by corrupting one square weight and asserting the match breaks.

Covered end to end: ResNet-50 trunk (frozen BN), FPN (+extra level), learned
positional encoding, BEV query table, get_reference_points/point_sampling,
TemporalSelfAttention ([query,query] fallback AND a real prev-BEV queue),
SpatialCrossAttention + MSDeformableAttention3D (dense-masked AND static
top-K compaction paths), FFN/LayerNorms, cam/level embeds, Conv3d+BN voxel
decoder, occ/flow predicters.
"""

import dataclasses

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from occnet_tpu.config import tiny_occ  # noqa: E402
from occnet_tpu.geometry import compose_ego2img  # noqa: E402
from occnet_tpu.models.detector import OccNet  # noqa: E402
from occnet_tpu.utils.torch_convert import (  # noqa: E402
    load_bevformer_into_variables,
)

from tests.torch_reference_occnet import BEVFormerOcc  # noqa: E402

BEV_H = BEV_W = 10
EMBED = 32
LAYERS = 2
PILLAR_H = 4
OUT_DIM = 8
IMG_H, IMG_W = 64, 96
PC_RANGE = (-40.0, -40.0, -1.0, 40.0, 40.0, 5.4)


def make_cameras():
    """6 surround pinhole cameras (60 deg yaw steps, ~77 deg HFOV) built in
    the ego frame, then split into (lidar2img, ego2lidar) so the test
    exercises the reference's two-matrix composition (`encoder.py:126`)."""
    f, cx, cy = 60.0, IMG_W / 2.0, IMG_H / 2.0
    K = np.array([[f, 0, cx], [0, f, cy], [0, 0, 1.0]], np.float64)
    cam_height = 1.5
    ego2img = []
    for i in range(6):
        th = np.deg2rad(60.0 * i)
        z_cam = np.array([np.cos(th), np.sin(th), 0.0])
        x_cam = np.array([np.sin(th), -np.cos(th), 0.0])
        y_cam = np.cross(z_cam, x_cam)
        R = np.stack([x_cam, y_cam, z_cam])          # ego -> cam rotation
        t = -R @ np.array([0.0, 0.0, cam_height])
        P = np.eye(4)
        P[:3, :3] = K @ R
        P[:3, 3] = K @ t
        ego2img.append(P)
    ego2img = np.stack(ego2img)                      # (6, 4, 4)

    # Non-trivial ego2lidar (small yaw + offset); lidar2img compensates so
    # lidar2img @ ego2lidar == ego2img exactly.
    a = np.deg2rad(4.0)
    ego2lidar = np.array(
        [[np.cos(a), -np.sin(a), 0, 0.5],
         [np.sin(a), np.cos(a), 0, -0.3],
         [0, 0, 1, 0.1],
         [0, 0, 0, 1.0]])
    lidar2img = ego2img @ np.linalg.inv(ego2lidar)
    return (lidar2img.astype(np.float32), ego2lidar.astype(np.float32),
            (ego2img @ np.eye(4)).astype(np.float32))


def randomize_state_dict(sd, seed):
    """Reference-layout state dict with every tensor randomised (variance-
    scaled so activations stay O(1) through the trunk): catches scale/bias or
    mean/var swaps that default-initialised (0/1) tensors would hide."""
    rng = np.random.RandomState(seed)
    out = {}
    for k, v in sd.items():
        shape = tuple(v.shape)
        if k.endswith("num_batches_tracked"):
            out[k] = v
            continue
        if "running_var" in k:
            arr = 0.5 + rng.rand(*shape)
        elif "running_mean" in k:
            arr = 0.2 * rng.randn(*shape)
        elif v.ndim >= 2:
            fan_in = int(np.prod(shape[1:]))
            arr = rng.randn(*shape) / np.sqrt(fan_in)
        elif k.endswith(".weight"):     # 1-D weight == norm scale
            arr = 1.0 + 0.2 * rng.randn(*shape)
        else:
            arr = 0.1 * rng.randn(*shape)
        out[k] = torch.from_numpy(np.asarray(arr, np.float32).reshape(shape))
    return out


def jax_model_cfg(**enc_overrides):
    cfg = tiny_occ()
    enc = dataclasses.replace(
        cfg.model.encoder, num_layers=LAYERS, ffn_dim=64,
        num_points_in_pillar=4, **enc_overrides)
    return dataclasses.replace(
        cfg.model, img_h=IMG_H, img_w=IMG_W, bev_h=BEV_H, bev_w=BEV_W,
        pillar_h=PILLAR_H, embed_dims=EMBED, out_dim=OUT_DIM,
        compute_dtype="float32", encoder=enc)


@pytest.fixture(scope="module")
def setup():
    lidar2img, ego2lidar, ego2img = make_cameras()
    rng = np.random.RandomState(3)
    img = rng.randn(1, 6, 3, IMG_H, IMG_W).astype(np.float32)

    model_t = BEVFormerOcc(
        bev_h=BEV_H, bev_w=BEV_W, embed_dims=EMBED, ffn_dim=64,
        num_layers=LAYERS, pillar_h=PILLAR_H, out_dim=OUT_DIM,
        num_points_in_pillar=4, pc_range=PC_RANGE)
    sd = randomize_state_dict(model_t.state_dict(), seed=7)
    model_t.load_state_dict(sd)
    model_t.eval()

    img_metas = [{
        "lidar2img": lidar2img,
        "ego2lidar": ego2lidar,
        "img_shape": [(IMG_H, IMG_W, 3)] * 6,
    }]
    with torch.no_grad():
        out_t = model_t(torch.from_numpy(img), img_metas)
    occ_t = out_t["occ"].numpy()
    flow_t = out_t["flow"].numpy()
    bev_t = out_t["bev_embed"].numpy()      # (1, C, H, W)
    bev_t = bev_t.reshape(1, EMBED, BEV_H * BEV_W).transpose(0, 2, 1)

    img_j = jnp.asarray(img.transpose(0, 1, 3, 4, 2))     # NCHW -> NHWC
    e2i = compose_ego2img(jnp.asarray(lidar2img)[None],
                          jnp.asarray(ego2lidar)[None])
    np.testing.assert_allclose(np.asarray(e2i)[0], ego2img, rtol=2e-5,
                               atol=1e-3)
    return dict(sd=sd, img_j=img_j, ego2img=e2i, occ_t=occ_t, flow_t=flow_t,
                bev_t=bev_t, model_t=model_t, img_metas=img_metas)


def jax_forward(setup, model_cfg, prev_bev=None):
    model = OccNet(model_cfg)
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           setup["img_j"], setup["ego2img"])
    variables = load_bevformer_into_variables(
        {"params": variables["params"],
         "batch_stats": variables["batch_stats"]},
        setup["sd"], depth=50, num_encoder_layers=LAYERS,
        flip_input_channels=False)
    out, aux = model.apply(variables, setup["img_j"], setup["ego2img"],
                           prev_bev, train=False,
                           mutable=["intermediates"])
    return out, aux


def test_end_to_end_logit_parity(setup):
    """Dense-masked SCA (max_queries_per_cam=0): every (camera, query) pair
    computed and visibility-masked — numerically the reference rebatch."""
    out, _ = jax_forward(
        setup, jax_model_cfg(
            sca=dataclasses.replace(jax_model_cfg().encoder.sca,
                                    max_queries_per_cam=0)))
    np.testing.assert_allclose(np.asarray(out["bev_embed"]), setup["bev_t"],
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(out["occ"]), setup["occ_t"],
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(out["flow"]), setup["flow_t"],
                               rtol=1e-4, atol=1e-4)
    # sanity: the comparison is over non-degenerate logits
    assert float(np.std(setup["occ_t"])) > 1e-2


def test_topk_compaction_matches_reference(setup):
    """Static top-K SCA (the TPU production path) on the same weights: exact
    whenever K covers the per-camera visible set (certified by the
    sca_topk_overflow intermediate == 0)."""
    cfg = jax_model_cfg()
    cfg = dataclasses.replace(
        cfg, encoder=dataclasses.replace(
            cfg.encoder,
            sca=dataclasses.replace(cfg.encoder.sca,
                                    max_queries_per_cam=64)))
    out, aux = jax_forward(setup, cfg)
    overflow = jax.tree_util.tree_leaves(
        aux["intermediates"])
    assert max(float(x) for x in overflow if np.ndim(x) == 0) == 0.0
    np.testing.assert_allclose(np.asarray(out["occ"]), setup["occ_t"],
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(out["flow"]), setup["flow_t"],
                               rtol=1e-4, atol=1e-4)


def test_temporal_prev_bev_parity(setup):
    """Real 2-slot TSA queue: both sides get the same (unaligned) prev BEV —
    the reference encoder's prev_bev path (`encoder.py:204-215`,
    `temporal_self_attention.py:195-222`)."""
    rng = np.random.RandomState(11)
    prev = rng.randn(BEV_H * BEV_W, 1, EMBED).astype(np.float32) * 0.3
    with torch.no_grad():
        out_t = setup["model_t"](
            torch.from_numpy(np.asarray(setup["img_j"]).transpose(
                0, 1, 4, 2, 3)),
            setup["img_metas"], prev_bev=torch.from_numpy(prev))
    cfg = jax_model_cfg(
        sca=dataclasses.replace(jax_model_cfg().encoder.sca,
                                max_queries_per_cam=0))
    out, _ = jax_forward(setup, cfg,
                         prev_bev=jnp.asarray(prev.transpose(1, 0, 2)))
    np.testing.assert_allclose(np.asarray(out["occ"]),
                               out_t["occ"].numpy(), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(out["flow"]),
                               out_t["flow"].numpy(), rtol=1e-4, atol=1e-4)


def test_parity_is_sensitive(setup):
    """Prove the oracle catches layout errors: transposing one square weight
    (layer-0 TSA value_proj) must break the match."""
    sd_bad = dict(setup["sd"])
    key = ("pts_bbox_head.transformer.encoder.layers.0."
           "attentions.0.value_proj.weight")
    sd_bad[key] = sd_bad[key].T.contiguous()
    cfg = jax_model_cfg(
        sca=dataclasses.replace(jax_model_cfg().encoder.sca,
                                max_queries_per_cam=0))
    model = OccNet(cfg)
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           setup["img_j"], setup["ego2img"])
    variables = load_bevformer_into_variables(
        {"params": variables["params"],
         "batch_stats": variables["batch_stats"]},
        sd_bad, depth=50, num_encoder_layers=LAYERS,
        flip_input_channels=False)
    out = model.apply(variables, setup["img_j"], setup["ego2img"],
                      train=False)
    assert float(np.max(np.abs(np.asarray(out["occ"]) -
                               setup["occ_t"]))) > 1e-3
