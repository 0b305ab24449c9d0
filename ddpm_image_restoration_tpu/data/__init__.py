from ddpm_image_restoration_tpu.data.dataset import (  # noqa: F401
    ImageFolderDataset,
    SyntheticImageDataset,
    split_indices,
)
from ddpm_image_restoration_tpu.data.pipeline import DegradationLoader  # noqa: F401
from ddpm_image_restoration_tpu.data.real_patches import (  # noqa: F401
    ConcatDataset,
    RealPatchDataset,
)
