from occnet_tpu.data.nuscenes import NuSceneOccDataset  # noqa: F401
from occnet_tpu.data.sampler import (  # noqa: F401
    shuffled_shard_indices,
    contiguous_shard_indices,
)
