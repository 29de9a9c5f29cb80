from occnet_tpu.ops.msda import (  # noqa: F401
    multi_scale_deformable_attention,
    bilinear_sample,
)
