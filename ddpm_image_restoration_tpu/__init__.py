"""ddpm_image_restoration_tpu — TPU-native diffusion-based compression-artifact removal.

A from-scratch JAX/XLA/Pallas framework with the capabilities of the reference
project Azure0413/DDPM_Image_Restoration (PyTorch, single-GPU): restoring images
degraded by lossy codecs (JPEG / WebP / AVIF) with a DDRM-style diffusion sampler
whose forward "noising" process is actual codec compression at decreasing quality.

Layer map (each subpackage = one layer of the reference, redesigned TPU-first):

  codecs/      host PIL codec round-trips + differentiable on-device surrogates
  data/        host-side degradation data pipeline (flat-dir images -> batches)
  ops/         blockwise DCT, attention, norms (jnp + Pallas kernels)
  models/      Flax UNet family (WebP / JPEG / AVIF codec-specialised variants)
  diffusion/   losses, forward process, DDRM + Gaussian-mixture samplers
  train/       jitted train/eval steps, optax schedules, Orbax checkpointing
  parallel/    device mesh, sharding rules, multi-chip train/restore
  evaluation/  PSNR/SSIM/LPIPS-style metrics, FID machinery, eval harness
  utils/       viz, logging, profiling
  cli/         train / restore / evaluate entry points with config presets
"""

__version__ = "0.1.0"

from ddpm_image_restoration_tpu.config import (  # noqa: F401
    CodecPreset,
    TrainConfig,
    get_preset,
)
