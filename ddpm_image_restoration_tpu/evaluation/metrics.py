"""Quality metrics, jnp-native, matching the reference's formulas.

  * PSNR: -10*log10(MSE + 1e-8) on [0,1]-clamped images
    (webp_inference.py:697; validation omits the eps, webp_training.py:575 —
    the eps only matters for identical images).
  * SSIM: pytorch_msssim-compatible (diffusion/losses.ssim).
  * normalized L2: ||a-b|| / sqrt(numel) (webp_inference.py:700).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from ddpm_image_restoration_tpu.diffusion.losses import ssim


def _to01(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.clip(x.astype(jnp.float32) * 0.5 + 0.5, 0.0, 1.0)


def psnr(pred: jnp.ndarray, target: jnp.ndarray, from_minus1: bool = True) -> jnp.ndarray:
    """Scalar PSNR in dB over the whole batch (the reference averages the
    batch MSE before the log)."""
    a = _to01(pred) if from_minus1 else pred
    b = _to01(target) if from_minus1 else target
    mse = jnp.mean((a - b) ** 2)
    return -10.0 * jnp.log10(mse + 1e-8)


def ssim_metric(pred: jnp.ndarray, target: jnp.ndarray, from_minus1: bool = True) -> jnp.ndarray:
    a = _to01(pred) if from_minus1 else pred
    b = _to01(target) if from_minus1 else target
    return ssim(a, b, data_range=1.0)


def normalized_l2(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    a = _to01(pred)
    b = _to01(target)
    return jnp.linalg.norm((a - b).reshape(-1)) / jnp.sqrt(a.size)


@jax.jit
def batch_metrics(pred: jnp.ndarray, target: jnp.ndarray) -> Dict[str, jnp.ndarray]:
    return {
        "psnr": psnr(pred, target),
        "ssim": ssim_metric(pred, target),
        "l2": normalized_l2(pred, target),
    }
