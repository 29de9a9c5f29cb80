"""Torch checkpoint -> occnet_tpu parameter conversion.

Capability equivalent of the reference's `pretrained='torchvision://resnet50'`
backbone init (config `bevformer_base_occ.py:58`) and its checkpoint
load/resume interface: maps a torchvision ResNet-50/101 state_dict onto the
flax `backbone` subtree.  Conventions:

- torch conv weight (O, I, kH, kW) -> flax (kH, kW, I, O)
- BatchNorm weight/bias -> FrozenBatchNorm scale/bias (params);
  running_mean/var -> batch_stats mean/var.
- Channel order: our input pipeline decodes RGB while the reference feeds BGR
  with to_rgb=False; `flip_input_channels=True` (default) reverses the input
  channels of conv1 so RGB inputs reproduce the BGR-trained activations.

Works on plain dict state_dicts (torch.load(...) or ['state_dict']); tensors
may be torch tensors or numpy arrays.
"""

from __future__ import annotations

from typing import Dict, Mapping, Tuple

import numpy as np

STAGE_BLOCKS = {50: (3, 4, 6, 3), 101: (3, 4, 23, 3)}


def _to_np(t) -> np.ndarray:
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t)


def _conv(t) -> np.ndarray:
    return np.transpose(_to_np(t), (2, 3, 1, 0))


def convert_torchvision_resnet(
    state_dict: Mapping[str, "np.ndarray"],
    depth: int = 50,
    flip_input_channels: bool = True,
) -> Tuple[Dict, Dict]:
    """Returns (params, batch_stats) trees for the `backbone` module."""
    sd = {k.replace("module.", ""): v for k, v in state_dict.items()}
    params: Dict = {}
    stats: Dict = {}

    def bn_pair(src_prefix: str):
        p = {"scale": _to_np(sd[f"{src_prefix}.weight"]),
             "bias": _to_np(sd[f"{src_prefix}.bias"])}
        s = {"mean": _to_np(sd[f"{src_prefix}.running_mean"]),
             "var": _to_np(sd[f"{src_prefix}.running_var"])}
        return p, s

    w = _conv(sd["conv1.weight"])
    if flip_input_channels:
        w = w[:, :, ::-1, :].copy()
    params["conv1"] = {"kernel": w}
    params["bn1"], stats["bn1"] = bn_pair("bn1")

    for stage, n_blocks in enumerate(STAGE_BLOCKS[depth]):
        for b in range(n_blocks):
            src = f"layer{stage + 1}.{b}"
            dst = f"layer{stage + 1}_{b}"
            bp: Dict = {}
            bs: Dict = {}
            for ci in (1, 2, 3):
                bp[f"conv{ci}"] = {
                    "kernel": _conv(sd[f"{src}.conv{ci}.weight"])}
                bp[f"bn{ci}"], bs[f"bn{ci}"] = bn_pair(f"{src}.bn{ci}")
            if f"{src}.downsample.0.weight" in sd:
                bp["downsample_conv"] = {
                    "kernel": _conv(sd[f"{src}.downsample.0.weight"])}
                bp["downsample_bn"], bs["downsample_bn"] = bn_pair(
                    f"{src}.downsample.1")
            params[dst] = bp
            stats[dst] = bs
    return params, stats


def load_resnet_into_variables(variables: Dict, state_dict: Mapping,
                               depth: int = 50,
                               flip_input_channels: bool = True,
                               subtree: str = "backbone") -> Dict:
    """Returns a new variables dict with the backbone subtree (or the root,
    subtree="") replaced by the converted torchvision weights (shape-checked
    against the existing tree)."""
    import jax

    params, stats = convert_torchvision_resnet(state_dict, depth,
                                               flip_input_channels)

    def merge(dst, src, path=""):
        out = dict(dst)
        for k, v in src.items():
            if k not in dst:
                raise KeyError(f"unexpected converted key {path}/{k}")
            if isinstance(v, Mapping) and not isinstance(
                    v, np.ndarray):
                out[k] = merge(dst[k], v, f"{path}/{k}")
            else:
                want = np.shape(dst[k])
                got = np.shape(v)
                if want != got:
                    raise ValueError(
                        f"shape mismatch at {path}/{k}: {want} vs {got}")
                out[k] = jax.numpy.asarray(v, dst[k].dtype)
        return out

    new_vars = dict(variables)
    if subtree:
        new_params = dict(new_vars["params"])
        new_params[subtree] = merge(new_vars["params"][subtree], params,
                                    f"params/{subtree}")
        new_vars["params"] = new_params
        bstats = dict(new_vars.get("batch_stats", {}))
        if subtree in bstats:
            bstats[subtree] = merge(bstats[subtree], stats,
                                    f"batch_stats/{subtree}")
            new_vars["batch_stats"] = bstats
    else:
        new_vars["params"] = merge(new_vars["params"], params, "params")
        if new_vars.get("batch_stats"):
            new_vars["batch_stats"] = merge(new_vars["batch_stats"], stats,
                                            "batch_stats")
    return new_vars
