from ddpm_image_restoration_tpu.evaluation.metrics import (  # noqa: F401
    psnr,
    ssim_metric,
    normalized_l2,
    batch_metrics,
)
