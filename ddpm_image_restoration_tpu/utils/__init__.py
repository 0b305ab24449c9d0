from ddpm_image_restoration_tpu.utils.logging import MetricLogger  # noqa: F401
