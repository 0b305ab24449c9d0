"""LPIPS perceptual distance (canonical when weights exist, proxy otherwise).

The reference uses lpips.LPIPS(net='alex') (webp_training.py:546). The
canonical metric needs pretrained AlexNet conv weights + the LPIPS learned
linear calibration, which a zero-egress environment cannot download. This
module implements the LPIPS *computation* (deep features -> channel-unit-
normalize -> squared diff -> linear calibration -> spatial average -> layer
sum) over two backbones:

  * **canonical**: the exact torchvision-AlexNet feature topology
    (conv11/4 - pool3/2 - conv5 - pool3/2 - conv3 x3, ReLU taps after every
    conv) in pure jnp, loaded from a single npz produced by
    `scripts/import_metric_weights.py` from the torch checkpoints. Includes
    the lpips package's input scaling layer. Name: `lpips_alex`.
  * **proxy**: a fixed-seed random conv pyramid — "perceptual distance with
    random features", a known-reasonable baseline (random nets are baselines
    in the LPIPS paper itself); clearly labelled `lpips_proxy`.

The npz is auto-probed at `$DDPM_IR_LPIPS_WEIGHTS`, then
`<repo>/weights/lpips_alex.npz` — dropping the file there upgrades every
eval (the harness records which backbone produced its LPIPS column as
`lpips_kind` in metrics_summary.json).
"""

from __future__ import annotations

import os
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

# lpips.ScalingLayer constants (input in [-1,1] is shifted/scaled before
# entering AlexNet; values from the LPIPS reference implementation).
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


def _default_weights_path() -> Optional[str]:
    env = os.environ.get("DDPM_IR_LPIPS_WEIGHTS")
    if env and os.path.exists(env):
        return env
    here = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    cand = os.path.join(here, "weights", "lpips_alex.npz")
    return cand if os.path.exists(cand) else None


def _normalize_channels(f: jnp.ndarray, eps: float = 1e-10) -> jnp.ndarray:
    norm = jnp.sqrt(jnp.sum(f * f, axis=-1, keepdims=True))
    return f / (norm + eps)


def _conv(x, w, b, stride, pad):
    out = jax.lax.conv_general_dilated(
        x, w, (stride, stride), [(pad, pad), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return out if b is None else out + b[None, None, None, :]


def _maxpool3x3s2(x):
    # torch MaxPool2d(kernel_size=3, stride=2), no padding, floor mode
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1), "VALID"
    )


class LPIPS:
    """Perceptual distance d(a, b) for NHWC images in [-1, 1].

    `weights_path`: npz with conv{0..4}_w [HWIO] / conv{0..4}_b [O] (AlexNet
    features) and lin{0..4} [C] (LPIPS linear calibration). When absent the
    fixed-seed random backbone is used. `linear_weights_path` (legacy) applies
    a linear calibration on top of the random backbone.
    """

    def __init__(
        self,
        seed: int = 7,
        linear_weights_path: Optional[str] = None,
        weights_path: Optional[str] = "auto",
    ):
        if weights_path == "auto":
            weights_path = _default_weights_path()
        if weights_path:
            self._init_alex(weights_path)
            return

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

    # --- canonical AlexNet backbone ---

    def _init_alex(self, weights_path: str) -> None:
        data = np.load(weights_path)
        ws = [jnp.asarray(data[f"conv{i}_w"], jnp.float32) for i in range(5)]
        bs = [jnp.asarray(data[f"conv{i}_b"], jnp.float32) for i in range(5)]
        lin = [jnp.asarray(data[f"lin{i}"], jnp.float32) for i in range(5)]
        self.name = "lpips_alex"
        shift = jnp.asarray(_SHIFT)
        scale = jnp.asarray(_SCALE)

        def features(x):
            # torchvision AlexNet .features with ReLU taps (LPIPS slices):
            # conv(11,s4,p2) R | pool | conv(5,s1,p2) R | pool | conv(3) R
            # | conv(3) R | conv(3) R
            h = _conv(x, ws[0], bs[0], 4, 2)
            f0 = jax.nn.relu(h)
            h = _maxpool3x3s2(f0)
            f1 = jax.nn.relu(_conv(h, ws[1], bs[1], 1, 2))
            h = _maxpool3x3s2(f1)
            f2 = jax.nn.relu(_conv(h, ws[2], bs[2], 1, 1))
            f3 = jax.nn.relu(_conv(f2, ws[3], bs[3], 1, 1))
            f4 = jax.nn.relu(_conv(f3, ws[4], bs[4], 1, 1))
            return [f0, f1, f2, f3, f4]

        @jax.jit
        def _distance(a, b):
            a = (a - shift[None, None, None, :]) / scale[None, None, None, :]
            b = (b - shift[None, None, None, :]) / scale[None, None, None, :]
            total = 0.0
            for fa, fb, li in zip(features(a), features(b), lin):
                da = _normalize_channels(fa) - _normalize_channels(fb)
                d = (da * da) * li[None, None, None, :]
                total = total + jnp.sum(d, axis=-1).mean(axis=(1, 2))
            return total

        self._distance = _distance

    def __call__(self, a, b) -> jnp.ndarray:
        """Per-sample distances [B]; inputs NHWC in [-1,1]."""
        return self._distance(jnp.asarray(a, jnp.float32), jnp.asarray(b, jnp.float32))
