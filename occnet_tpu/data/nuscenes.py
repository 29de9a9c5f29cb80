"""nuScenes/OpenOcc dataset: infos-pkl reader + per-sample geometry.

Equivalent of the reference `NuSceneOcc` dataset (`datasets/nuscenes_occ.py:
21-140`): loads `nuscenes_infos_{train,val}_occ.pkl`, builds per-frame
`lidar2img` (viewpad @ lidar2cam) and `ego2lidar` from the camera calibration
(:80-113, including the LightwheelOcc quaternion branch :91-99), reads the 6
camera JPEGs and the occ GT npz, and runs the host-side pipeline
(photometric jitter -> normalise -> pad).  Output batches are numpy dicts the
jitted train/eval steps consume directly.
"""

from __future__ import annotations

import os
import pickle
from typing import Dict, List, Optional, Sequence

import numpy as np

from occnet_tpu.config import DataConfig
from occnet_tpu.data.pipeline import (
    load_occ_gt,
    normalize_img,
    pad_to_divisor,
    photometric_distortion,
)
from occnet_tpu.data.quat import quat_to_rot, transform_matrix

# nuScenes surround-camera order used by the infos dicts.
CAM_ORDER = (
    "CAM_FRONT", "CAM_FRONT_RIGHT", "CAM_FRONT_LEFT",
    "CAM_BACK", "CAM_BACK_LEFT", "CAM_BACK_RIGHT",
)


def _decode_image(path: str) -> np.ndarray:
    """JPEG -> (H, W, 3) uint8 RGB.  Uses tf.io (no PIL in this image)."""
    import tensorflow as tf  # local import: heavy
    data = tf.io.read_file(path)
    return tf.io.decode_jpeg(data, channels=3).numpy()


def load_infos(ann_file: str, load_interval: int = 1):
    with open(ann_file, "rb") as f:
        data = pickle.load(f)
    infos = data["infos"][::load_interval]
    metadata = data.get("metadata", {})
    return infos, metadata


def build_camera_matrices(info: dict, version: str = "") -> Dict[str, np.ndarray]:
    """Per-frame lidar2img/ego2lidar from an infos entry
    (`nuscenes_occ.py:80-113`)."""
    ego2lidar = transform_matrix(
        info["lidar2ego_translation"], info["lidar2ego_rotation"],
        inverse=True)
    lidar2img = []
    intrinsics = []
    lidar2cam = []
    cams = info["cams"]
    keys = [k for k in CAM_ORDER if k in cams] or list(cams.keys())
    for cam_type in keys:
        cam = cams[cam_type]
        if "LightwheelOcc" in version:
            s2l_r = quat_to_rot(cam["sensor2lidar_rotation"])
        else:
            s2l_r = np.asarray(cam["sensor2lidar_rotation"], np.float64)
        lidar2cam_r = np.linalg.inv(s2l_r)
        t = np.asarray(cam["sensor2lidar_translation"], np.float64)
        l2c = np.eye(4)
        l2c[:3, :3] = lidar2cam_r
        l2c[:3, 3] = -lidar2cam_r @ t
        K = np.asarray(cam["cam_intrinsic"], np.float64)
        viewpad = np.eye(4)
        viewpad[: K.shape[0], : K.shape[1]] = K
        lidar2img.append(viewpad @ l2c)
        intrinsics.append(viewpad)
        lidar2cam.append(l2c)
    return {
        "lidar2img": np.stack(lidar2img).astype(np.float32),
        "lidar2cam": np.stack(lidar2cam).astype(np.float32),
        "cam_intrinsic": np.stack(intrinsics).astype(np.float32),
        "ego2lidar": ego2lidar.astype(np.float32),
        "img_paths": [
            os.path.join("", cams[k].get("data_path", cams[k].get("cam_path",
                                                                  "")))
            for k in keys],
    }


class NuSceneOccDataset:
    """Minimal map-style dataset over the infos list."""

    def __init__(self, cfg: DataConfig, ann_file: str,
                 training: bool = True, load_interval: int = 1,
                 size_divisor: int = 32, device_normalize: bool = False):
        self.cfg = cfg
        self.training = training
        self.size_divisor = size_divisor
        # device_normalize: return raw uint8 images (4x less host->device
        # traffic — 27 vs 107 MB/frame at base scale) and let the caller
        # normalise on device: eval via `make_device_normalizer(cfg)`
        # (bitwise-exact), training via `make_device_train_augmenter(cfg)`
        # (photometric distortion + normalise + pad inside the jitted step).
        self.device_normalize = device_normalize
        self.infos, self.metadata = load_infos(ann_file, load_interval)
        self.version = str(self.metadata.get("version", ""))

    def __len__(self):
        return len(self.infos)

    def sample_token(self, idx: int) -> str:
        return self.infos[idx]["token"]

    def get_sample(self, idx: int,
                   rng: Optional[np.random.RandomState] = None) -> dict:
        info = self.infos[idx]
        geo = build_camera_matrices(info, self.version)

        imgs = []
        for p in geo["img_paths"]:
            path = p if os.path.isabs(p) else os.path.join(
                self.cfg.data_root, p)
            if not os.path.isabs(p) and not os.path.exists(path):
                path = p  # infos sometimes store data_root-relative paths
            decoded = _decode_image(path)
            imgs.append(decoded if self.device_normalize
                        else decoded.astype(np.float32))
        imgs = np.stack(imgs)

        if self.device_normalize:
            # ship UNPADDED uint8; `make_device_normalizer` normalises then
            # pads on device, matching the host path's normalise->pad order
            pass
        else:
            if self.training and rng is not None:
                imgs = photometric_distortion(imgs, rng)
            # RGB means (the reference's BGR means reversed; pipeline.py).
            mean = np.asarray(self.cfg.img_mean, np.float32)
            std = np.asarray(self.cfg.img_std, np.float32)
            if not self.cfg.to_rgb:
                mean, std = mean[::-1].copy(), std[::-1].copy()
            imgs = normalize_img(imgs, mean, std)
            imgs = pad_to_divisor(imgs, self.size_divisor)

        # occ_path in infos is data_root-relative (the reference joins
        # `data_root` at `nuscenes_occ.py:165`); missing file (test split)
        # -> zero labels at the configured grid size
        occ_path = info.get("occ_path")
        if occ_path and not os.path.isabs(occ_path):
            joined = os.path.join(self.cfg.data_root, occ_path)
            occ_path = joined if os.path.exists(joined) else occ_path
        sem, flow = load_occ_gt(occ_path, occ_size=tuple(self.cfg.occ_size))
        ego2img = np.einsum(
            "cij,jk->cik", geo["lidar2img"], geo["ego2lidar"])

        ego2global = transform_matrix(
            info.get("ego2global_translation", (0.0, 0.0, 0.0)),
            info.get("ego2global_rotation", (1.0, 0.0, 0.0, 0.0)))
        return {
            "img": imgs,                       # (6, H, W, 3) float32
            "ego2img": ego2img.astype(np.float32),
            "lidar2img": geo["lidar2img"],
            "ego2lidar": geo["ego2lidar"],
            "voxel_semantics": sem.astype(np.int32),
            "voxel_flow": flow,
            "token": info["token"],
            # temporal-path metadata (streaming state + clip alignment)
            "scene_token": info.get("scene_token", ""),
            "ego2global": ego2global.astype(np.float32),
        }

    def collate(self, samples: Sequence[dict]) -> dict:
        batch = {}
        for k in ("img", "ego2img", "voxel_semantics", "voxel_flow"):
            batch[k] = np.stack([s[k] for s in samples])
        batch["tokens"] = [s["token"] for s in samples]
        return batch


def build_train_dataset(cfg: DataConfig, training: bool = True, **kwargs):
    """Construct the train split from a DataConfig: a plain NuSceneOccDataset,
    or — when `cfg.extra_trainsets` names additional (data_root, ann_file)
    pairs — the ConcatOccDataset of all of them (the reference's
    `ConcatDataset` trainset, `bevformer_base_occ_w_lightwheel.py:219-226`).
    The LightwheelOcc quaternion-calibration branch triggers off each ann
    file's own metadata version, as in the reference (`nuscenes_occ.py:91`)."""
    import dataclasses

    main = NuSceneOccDataset(
        cfg, os.path.join(cfg.data_root, cfg.train_ann),
        training=training, **kwargs)
    if not cfg.extra_trainsets:
        return main
    extras = []
    for root, ann in cfg.extra_trainsets:
        ecfg = dataclasses.replace(cfg, data_root=root, extra_trainsets=())
        extras.append(NuSceneOccDataset(
            ecfg, os.path.join(root, ann), training=training, **kwargs))
    return ConcatOccDataset([main] + extras)


class ConcatOccDataset:
    """Concatenation of occ datasets (the reference's `ConcatDataset` of
    nuScenes + LightwheelOcc synthetic trainsets,
    `bevformer_base_occ_w_lightwheel.py:181-226`)."""

    def __init__(self, datasets: Sequence["NuSceneOccDataset"]):
        self.datasets = list(datasets)
        self._offsets = np.cumsum([0] + [len(d) for d in self.datasets])

    def __len__(self):
        return int(self._offsets[-1])

    def _locate(self, idx: int):
        ds = int(np.searchsorted(self._offsets, idx, side="right")) - 1
        return self.datasets[ds], idx - int(self._offsets[ds])

    def sample_token(self, idx: int) -> str:
        ds, local = self._locate(idx)
        return ds.sample_token(local)

    def get_sample(self, idx: int,
                   rng: Optional[np.random.RandomState] = None) -> dict:
        ds, local = self._locate(idx)
        return ds.get_sample(local, rng)

    def collate(self, samples):
        return self.datasets[0].collate(samples)
