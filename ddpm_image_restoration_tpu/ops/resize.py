"""Spatial resize ops (NHWC): pooling, bilinear upsampling, adaptive pooling.

The reference uses nn.MaxPool2d(2) between UNet stages (webp_training.py:342),
F.interpolate(scale_factor=2, mode='bilinear', align_corners=False) in the
decoder (webp_training.py:389-393), and nn.AdaptiveAvgPool2d(s) in the AVIF
multi-scale attention (avif.py:258-266). jax.image.resize's 'linear' method
matches align_corners=False (half-pixel centers).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def max_pool_2x(x: jnp.ndarray) -> jnp.ndarray:
    """2x2/stride-2 max pool over NHWC."""
    return lax.reduce_window(
        x, -jnp.inf, lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
    )


def upsample_2x_bilinear(x: jnp.ndarray) -> jnp.ndarray:
    b, h, w, c = x.shape
    return jax.image.resize(x, (b, 2 * h, 2 * w, c), method="linear")


def avg_pool(x: jnp.ndarray, window: int) -> jnp.ndarray:
    out = lax.reduce_window(
        x, 0.0, lax.add, (1, window, window, 1), (1, window, window, 1), "VALID"
    )
    return out / (window * window)


def adaptive_avg_pool(x: jnp.ndarray, out_size: int) -> jnp.ndarray:
    """Average-pool NHWC x to out_size x out_size.

    For H divisible by out_size this is exact window pooling (what
    AdaptiveAvgPool2d computes); otherwise (including upsampling, which torch
    permits, e.g. pooling a 4x4 map "to" 8x8 at the deepest UNet level) fall
    back to linear resize — a documented deviation, the module is a learned
    attention gate so the exact interpolant is immaterial.
    """
    b, h, w, c = x.shape
    if h == out_size and w == out_size:
        return x
    if h % out_size == 0 and w % out_size == 0 and h >= out_size:
        return avg_pool(x, h // out_size)
    return jax.image.resize(x, (b, out_size, out_size, c), method="linear")
