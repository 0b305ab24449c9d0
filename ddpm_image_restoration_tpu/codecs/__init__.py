from ddpm_image_restoration_tpu.codecs.pil_codecs import (  # noqa: F401
    compress_batch,
    compress_uint8,
    HostCodecPool,
)
from ddpm_image_restoration_tpu.codecs.surrogate import codec_surrogate  # noqa: F401
from ddpm_image_restoration_tpu.codecs.quality import (  # noqa: F401
    quality_for_timestep,
    init_timestep_for_quality,
    sample_quality_range,
)
