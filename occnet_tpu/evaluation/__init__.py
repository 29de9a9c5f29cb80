from occnet_tpu.evaluation.ray_metrics import (  # noqa: F401
    generate_lidar_rays,
    render_sample,
    RayMetricAccumulator,
    occ_score_from_metrics,
)
