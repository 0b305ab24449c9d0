"""Spatial resize ops (NHWC): pooling, bilinear upsampling, adaptive pooling.

The reference uses nn.MaxPool2d(2) between UNet stages (webp_training.py:342),
F.interpolate(scale_factor=2, mode='bilinear', align_corners=False) in the
decoder (webp_training.py:389-393), and nn.AdaptiveAvgPool2d(s) in the AVIF
multi-scale attention (avif.py:258-266). jax.image.resize's 'linear' method
matches align_corners=False (half-pixel centers).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
from jax import lax


def max_pool_2x(x: jnp.ndarray) -> jnp.ndarray:
    """2x2/stride-2 max pool over NHWC."""
    return lax.reduce_window(
        x, -jnp.inf, lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
    )


def _upsample_2x_axis(x: jnp.ndarray, axis: int) -> jnp.ndarray:
    """Exact 2x linear upsample (half-pixel centers) along one axis via
    fixed-weight shift/adds: out[2i] = 0.25*in[i-1] + 0.75*in[i],
    out[2i+1] = 0.75*in[i] + 0.25*in[i+1], edges clamped."""
    n = x.shape[axis]
    first = lax.slice_in_dim(x, 0, 1, axis=axis)
    last = lax.slice_in_dim(x, n - 1, n, axis=axis)
    prev = jnp.concatenate([first, lax.slice_in_dim(x, 0, n - 1, axis=axis)], axis)
    nxt = jnp.concatenate([lax.slice_in_dim(x, 1, n, axis=axis), last], axis)
    even = 0.25 * prev + 0.75 * x
    odd = 0.75 * x + 0.25 * nxt
    stacked = jnp.stack([even, odd], axis=axis + 1)  # [..., n, 2, ...]
    shape = list(x.shape)
    shape[axis] = 2 * n
    return stacked.reshape(shape)


def upsample_2x_bilinear(x: jnp.ndarray) -> jnp.ndarray:
    """2x bilinear upsample, align_corners=False semantics (matches
    F.interpolate(scale_factor=2, mode='bilinear') / jax.image.resize
    'linear' to float tolerance).

    Formulation selectable via DDPM_IR_RESIZE_IMPL = resize (default) |
    shifts. `shifts` computes the fixed 2x weights (0.25, 0.75) as separable
    shift/adds at the tensor's native layout; `resize` is
    jax.image.resize's interpolation-matrix dot-generals. Isolated
    microbenchmarks (scripts/bench_micro_ops.py) favour `resize` on TPU
    (0.53 vs 1.01 ms at [16,64,64,64]->2x bf16); the switch exists because
    in-context layout interactions can reverse such rankings.
    """
    if os.environ.get("DDPM_IR_RESIZE_IMPL", "resize") == "shifts":
        return _upsample_2x_axis(_upsample_2x_axis(x, 1), 2)
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
