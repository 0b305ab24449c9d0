from ddpm_image_restoration_tpu.diffusion.losses import (  # noqa: F401
    ssim,
    frequency_aware_loss,
    avif_frequency_aware_loss,
    color_preservation_loss,
    hybrid_loss,
    loss_for_preset,
)
from ddpm_image_restoration_tpu.diffusion.ddrm import (  # noqa: F401
    DDRMSampler,
    phase_consistency,
    make_consistency_fn,
)
from ddpm_image_restoration_tpu.diffusion.gaussian_mixture import (  # noqa: F401
    GaussianMixtureSampler,
    svd_structure_preservation,
)
from ddpm_image_restoration_tpu.diffusion.forward import forward_process  # noqa: F401
from ddpm_image_restoration_tpu.diffusion.ensemble import (  # noqa: F401
    dihedral,
    dihedral_inverse,
    sample_ensemble,
)
