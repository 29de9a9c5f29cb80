"""occnet_tpu — a TPU-native (JAX/XLA/Pallas/pjit) camera-to-occupancy framework.

Built from scratch with the capabilities of OpenDriveLab/OccNet (CVPR 2024
Occupancy & Flow challenge baseline): 6 surround cameras -> ResNet+FPN ->
BEVFormer-style encoder (temporal self-attention + spatial cross-attention via
deformable sampling) -> 200x200 BEV -> 3D-conv voxel decoder -> 17-class
semantic occupancy + 2-channel flow over a 200x200x16 grid, evaluated with an
on-device ray-casting RayIoU/mAVE "OccScore" metric.

Reference semantics captured in SURVEY.md; citations in docstrings point into
/root/reference (file:line).
"""

__version__ = "0.1.0"

from occnet_tpu.config import OccNetConfig  # noqa: F401
