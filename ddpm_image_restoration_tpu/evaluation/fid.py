"""Fréchet distance machinery with pluggable feature extractors.

The reference carries THREE independent FID implementations (SURVEY.md C28-30):
pytorch_fid over PNG directories (webp_inference.py:744-765), cleanfid
(`svd imagenet.ipynb` cell 2), and a hand-rolled InceptionV3 + scipy sqrtm
(`svd imagenet.ipynb` cell 4). This module provides the statistics machinery
once (batched on device, sqrtm on host via scipy) and pluggable features:

  * `InceptionFeatureExtractor` — torchvision InceptionV3 pool3 features, used
    when pretrained weights are available on disk (zero-egress environments
    can't download them; probed at runtime).
  * `RandomConvFeatureExtractor` — a fixed-seed random conv net in jnp. A
    Fréchet distance over random features ("FD_rand") is a deterministic,
    reproducible distribution distance — clearly labelled as NOT the canonical
    FID, but monotone in the same degradations (see tests/test_metrics.py).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def compute_statistics(features: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """features [N, D] -> (mean [D], covariance [D, D])."""
    feats = np.asarray(features, np.float64)
    mu = feats.mean(axis=0)
    sigma = np.cov(feats, rowvar=False)
    return mu, np.atleast_2d(sigma)


def frechet_distance(mu1, sigma1, mu2, sigma2, eps: float = 1e-6) -> float:
    """Standard FID formula: |mu1-mu2|^2 + Tr(s1 + s2 - 2*sqrtm(s1 s2))."""
    from scipy import linalg

    def _sqrtm(a):
        out = linalg.sqrtm(a)  # scipy >=1.17 returns the array directly
        return out[0] if isinstance(out, tuple) else out

    diff = mu1 - mu2
    covmean = _sqrtm(sigma1 @ sigma2)
    if not np.isfinite(covmean).all():
        offset = np.eye(sigma1.shape[0]) * eps
        covmean = _sqrtm((sigma1 + offset) @ (sigma2 + offset))
    if np.iscomplexobj(covmean):
        covmean = covmean.real
    return float(diff @ diff + np.trace(sigma1) + np.trace(sigma2) - 2 * np.trace(covmean))


class RandomConvFeatureExtractor:
    """Fixed-seed 4-layer strided conv net -> global-pooled features [N, dim].

    Deterministic across processes (seeded key), jitted, runs on device.
    """

    def __init__(self, dim: int = 192, seed: int = 0):
        self.dim = dim
        key = jax.random.PRNGKey(seed)
        widths = [24, 48, 96, dim]
        self.kernels = []
        in_c = 3
        for w in widths:
            key, sub = jax.random.split(key)
            k = jax.random.normal(sub, (3, 3, in_c, w), jnp.float32)
            k = k / np.sqrt(9 * in_c)
            self.kernels.append(k)
            in_c = w

        @jax.jit
        def _extract(x01):
            h = x01 * 2.0 - 1.0
            for k in self.kernels:
                h = jax.lax.conv_general_dilated(
                    h, k, (2, 2), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
                )
                h = jax.nn.leaky_relu(h, 0.2)
            return jnp.concatenate([h.mean(axis=(1, 2)), h.max(axis=(1, 2))], -1)

        self._extract = _extract
        self.name = "random_conv"

    def __call__(self, images01: np.ndarray, batch: int = 64) -> np.ndarray:
        """images01: [N,H,W,3] in [0,1] -> [N, 2*dim] features."""
        outs = []
        for i in range(0, len(images01), batch):
            outs.append(np.asarray(self._extract(jnp.asarray(images01[i : i + batch]))))
        return np.concatenate(outs)


class InceptionFeatureExtractor:
    """torchvision InceptionV3 pool3 features (the canonical FID features).

    Only usable when the pretrained weights are already cached on disk —
    this environment has no network egress. Probe with `available()`.
    """

    def __init__(self):
        import torch
        import torchvision  # noqa: F401  (raises if absent)

        self._torch = torch
        from torchvision.models import inception_v3

        net = inception_v3(weights="DEFAULT")
        net.fc = torch.nn.Identity()
        net.eval()
        self.net = net
        self.name = "inception_v3"

    @staticmethod
    def available() -> bool:
        try:
            import torchvision  # noqa: F401
        except ImportError:
            return False
        try:
            InceptionFeatureExtractor()
            return True
        except Exception:
            return False

    def __call__(self, images01: np.ndarray, batch: int = 32) -> np.ndarray:
        torch = self._torch
        outs = []
        with torch.no_grad():
            for i in range(0, len(images01), batch):
                x = torch.from_numpy(
                    images01[i : i + batch].transpose(0, 3, 1, 2)
                ).float()
                x = torch.nn.functional.interpolate(
                    x, size=(299, 299), mode="bilinear", align_corners=False
                )
                x = (x - 0.5) / 0.5
                outs.append(self.net(x).numpy())
        return np.concatenate(outs)


def default_feature_extractor():
    if InceptionFeatureExtractor.available():  # pragma: no cover - needs weights
        return InceptionFeatureExtractor()
    return RandomConvFeatureExtractor()


def fid_between(
    images_a01: np.ndarray,
    images_b01: np.ndarray,
    extractor=None,
) -> float:
    """Fréchet distance between two image sets ([N,H,W,3] in [0,1])."""
    extractor = extractor or default_feature_extractor()
    fa = extractor(images_a01)
    fb = extractor(images_b01)
    return frechet_distance(*compute_statistics(fa), *compute_statistics(fb))
