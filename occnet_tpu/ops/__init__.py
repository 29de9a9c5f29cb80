from occnet_tpu.ops.msda import (  # noqa: F401
    multi_scale_deformable_attention,
    bilinear_sample,
)
from occnet_tpu.ops.render_diff import (  # noqa: F401
    render_depth_loss,
    render_expected_depth,
    splat_points,
)
