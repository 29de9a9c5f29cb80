from occnet_tpu.models.detector import OccNet  # noqa: F401
