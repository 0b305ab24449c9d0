from ddpm_image_restoration_tpu.models.unet import (  # noqa: F401
    CodecDiffusionModel,
    build_model,
)
from ddpm_image_restoration_tpu.models.time_embedding import TimeEmbedding  # noqa: F401
