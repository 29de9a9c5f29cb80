from occnet_tpu.data.clips import ClipDataset  # noqa: F401
from occnet_tpu.data.nuscenes import (  # noqa: F401
    ConcatOccDataset,
    NuSceneOccDataset,
    build_train_dataset,
)
from occnet_tpu.data.sampler import (  # noqa: F401
    shuffled_shard_indices,
    contiguous_shard_indices,
)
