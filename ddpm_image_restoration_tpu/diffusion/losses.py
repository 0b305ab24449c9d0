"""Training losses, jnp-native.

Reproduces the reference's loss zoo:
  * `frequency_aware_loss`  — MSE + 0.5*Σ_c[|rfft2| MSE + 0.5*angle MSE]
                              + 0.3*(1-SSIM), on [0,1]-rescaled tensors
                              (webp_training.py:105-132)
  * `avif_frequency_aware_loss` — full fft2, + gradient/edge loss; weights
                              spatial + 0.3 freq + 0.4 ssim + 0.2 edge
                              (avif.py:126-164)
  * `color_preservation_loss` — channel-weighted L1 (R .25 / G .5 / B .25)
                              + 0.5*(1-SSIM) (new_method.ipynb)
  * `hybrid_loss`           — MSE + 0.5*L1(Laplacian) (dct.ipynb cell 2)
  * `ssim`                  — matches pytorch_msssim's settings (11x11
                              gaussian window, sigma 1.5, K=(0.01,0.03),
                              valid padding, mean over batch)

All functions take NHWC in [-1,1] and compute in float32 (losses drive fp32
optimizer statistics even when the model computes in bf16).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=None)
def _gaussian_window(size: int = 11, sigma: float = 1.5) -> np.ndarray:
    g = np.exp(-((np.arange(size) - size // 2) ** 2) / (2 * sigma**2))
    g /= g.sum()
    return np.outer(g, g).astype(np.float32)


def _depthwise_filter(x: jnp.ndarray, kernel2d: jnp.ndarray) -> jnp.ndarray:
    """Valid-padding depthwise 2-D filter over NHWC.

    precision=HIGHEST is load-bearing: TPU convs default to bf16 multiplies,
    and SSIM's variance terms E[a^2]-mu^2 cancel catastrophically for
    high-PSNR pairs — observed SSIM values of 1.3-1.5 (>1 is impossible) on
    real-chip 128^2 evals until the window convolutions ran in true f32.
    CPU runs mask the bug (CPU convs are f32 regardless)."""
    c = x.shape[-1]
    k = jnp.broadcast_to(kernel2d[:, :, None, None], (*kernel2d.shape, 1, c))
    return jax.lax.conv_general_dilated(
        x, k, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
        precision=jax.lax.Precision.HIGHEST,
    )


def ssim(
    a: jnp.ndarray,
    b: jnp.ndarray,
    data_range: float = 1.0,
    size_average: bool = True,
) -> jnp.ndarray:
    """SSIM with pytorch_msssim-compatible settings. Inputs in [0, data_range]."""
    a = a.astype(jnp.float32)
    b = b.astype(jnp.float32)
    win = jnp.asarray(_gaussian_window())
    k1, k2 = 0.01, 0.03
    c1, c2 = (k1 * data_range) ** 2, (k2 * data_range) ** 2

    mu_a = _depthwise_filter(a, win)
    mu_b = _depthwise_filter(b, win)
    mu_aa, mu_bb, mu_ab = mu_a * mu_a, mu_b * mu_b, mu_a * mu_b
    sigma_aa = _depthwise_filter(a * a, win) - mu_aa
    sigma_bb = _depthwise_filter(b * b, win) - mu_bb
    sigma_ab = _depthwise_filter(a * b, win) - mu_ab

    cs = (2 * sigma_ab + c2) / (sigma_aa + sigma_bb + c2)
    ssim_map = ((2 * mu_ab + c1) / (mu_aa + mu_bb + c1)) * cs
    if size_average:
        return jnp.mean(ssim_map)
    return jnp.mean(ssim_map, axis=(1, 2, 3))


def _mse(a, b):
    return jnp.mean((a - b) ** 2)


def frequency_aware_loss(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    pred = pred.astype(jnp.float32)
    target = target.astype(jnp.float32)
    spatial = _mse(pred, target)

    p01 = pred * 0.5 + 0.5
    t01 = target * 0.5 + 0.5

    # per-channel rfft2 over (H, W); channels last here vs. reference's NCHW
    pf = jnp.fft.rfft2(jnp.moveaxis(p01, -1, 1), axes=(-2, -1))
    tf = jnp.fft.rfft2(jnp.moveaxis(t01, -1, 1), axes=(-2, -1))
    freq = 0.0
    for c in range(3):
        freq += _mse(jnp.abs(pf[:, c]), jnp.abs(tf[:, c]))
        freq += 0.5 * _mse(jnp.angle(pf[:, c]), jnp.angle(tf[:, c]))

    ssim_loss = 1.0 - ssim(p01, t01, data_range=1.0)
    return spatial + 0.5 * freq + 0.3 * ssim_loss


def avif_frequency_aware_loss(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    pred = pred.astype(jnp.float32)
    target = target.astype(jnp.float32)
    spatial = _mse(pred, target)

    p01 = pred * 0.5 + 0.5
    t01 = target * 0.5 + 0.5

    def grad_loss(x, y):
        # NHWC spatial gradients (avif.py:136-142)
        gx_h = jnp.abs(x[:, :-1] - x[:, 1:])
        gx_w = jnp.abs(x[:, :, :-1] - x[:, :, 1:])
        gy_h = jnp.abs(y[:, :-1] - y[:, 1:])
        gy_w = jnp.abs(y[:, :, :-1] - y[:, :, 1:])
        return _mse(gx_h, gy_h) + _mse(gx_w, gy_w)

    edge = grad_loss(p01, t01)

    pf = jnp.fft.fft2(jnp.moveaxis(p01, -1, 1), axes=(-2, -1))
    tf = jnp.fft.fft2(jnp.moveaxis(t01, -1, 1), axes=(-2, -1))
    freq = 0.0
    for c in range(3):
        freq += _mse(jnp.abs(pf[:, c]), jnp.abs(tf[:, c]))
        freq += 0.3 * _mse(jnp.angle(pf[:, c]), jnp.angle(tf[:, c]))

    ssim_loss = 1.0 - ssim(p01, t01, data_range=1.0)
    return spatial + 0.3 * freq + 0.4 * ssim_loss + 0.2 * edge


def color_preservation_loss(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    p01 = jnp.clip(pred.astype(jnp.float32) * 0.5 + 0.5, 0, 1)
    t01 = jnp.clip(target.astype(jnp.float32) * 0.5 + 0.5, 0, 1)
    l1 = lambda a, b: jnp.mean(jnp.abs(a - b))
    color = (
        0.25 * l1(p01[..., 0], t01[..., 0])
        + 0.5 * l1(p01[..., 1], t01[..., 1])
        + 0.25 * l1(p01[..., 2], t01[..., 2])
    )
    return color + 0.5 * (1.0 - ssim(p01, t01, data_range=1.0))


_LAPLACIAN = np.array([[0, 1, 0], [1, -4, 1], [0, 1, 0]], dtype=np.float32)


def hybrid_loss(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """MSE + 0.5 * L1 of Laplacian responses (dct.ipynb HybridLoss)."""
    pred = pred.astype(jnp.float32)
    target = target.astype(jnp.float32)
    lp = _depthwise_filter(pred, jnp.asarray(_LAPLACIAN))
    lt = _depthwise_filter(target, jnp.asarray(_LAPLACIAN))
    return _mse(pred, target) + 0.5 * jnp.mean(jnp.abs(lp - lt))


def huber_loss(pred: jnp.ndarray, target: jnp.ndarray, delta: float = 1.0) -> jnp.ndarray:
    d = jnp.abs(pred.astype(jnp.float32) - target.astype(jnp.float32))
    return jnp.mean(jnp.where(d <= delta, 0.5 * d * d, delta * (d - 0.5 * delta)))


_LOSSES = {
    "frequency_aware": frequency_aware_loss,
    "avif_frequency_aware": avif_frequency_aware_loss,
    "color_preservation": color_preservation_loss,
    "hybrid": hybrid_loss,
    "huber": huber_loss,
}


def loss_for_preset(kind: str):
    return _LOSSES[kind]
