from ddpm_image_restoration_tpu.ops.dct import (  # noqa: F401
    spatial_block_dct,
    low_freq_mask,
    adjusted_group_count,
)
from ddpm_image_restoration_tpu.ops.attention import spatial_attention  # noqa: F401
from ddpm_image_restoration_tpu.ops.resize import (  # noqa: F401
    upsample_2x_bilinear,
    max_pool_2x,
    adaptive_avg_pool,
)
