"""Quality <-> diffusion-timestep maps and the training quality curriculum.

Reference semantics reproduced exactly:
  * per-sample training quality from timestep:
      q = clamp(min_q + (max_q - min_q) * (1 - t/steps), 0, 100)
    (webp_training.py:503, avif.py:555)
  * restoration start step from quality:
      init_t = clamp((100 - q)/100 * steps, lo, hi)
    with (lo,hi)=(20,80) for WebP/JPEG (webp_training.py:561-562) and
    (15,75) for AVIF (avif.py:613-614).
  * quality-range curriculum: P(high) = 0.3 + 0.4*min(1, epoch/100), then
    P(mid)=0.5 of the remainder, else low (webp_training.py:487-496).
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

from ddpm_image_restoration_tpu.config import CodecPreset


def quality_for_timestep(
    t: np.ndarray, steps: int, quality_range: Tuple[int, int]
) -> np.ndarray:
    """Per-sample quality given integer timesteps t in [1, steps)."""
    min_q, max_q = quality_range
    q = min_q + (max_q - min_q) * (1.0 - np.asarray(t, np.float32) / steps)
    return np.clip(q, 0, 100).astype(np.int32)


def init_timestep_for_quality(quality: int, steps: int, preset: CodecPreset) -> int:
    lo, hi = preset.init_t_clamp
    t = int((100 - quality) / 100.0 * steps)
    return int(np.clip(t, lo, hi))


def sample_quality_range(
    rng: np.random.Generator, epoch: int, preset: CodecPreset
) -> Tuple[int, int]:
    """Draw this batch's quality range under the curriculum."""
    progress = min(1.0, epoch / 100.0)
    if rng.random() < 0.3 + 0.4 * progress:
        return (70, 100)
    if rng.random() < 0.5:
        return (40, 70)
    return (preset.quality_min, 40)   # WebP's low range starts at 0 (webp_training.py:496)


def _expected_jpeg_tables(quality: int) -> Tuple[np.ndarray, np.ndarray]:
    """The exact (luma, chroma) quantization tables libjpeg writes at
    `quality` with baseline clamping — jpeg_set_quality's scaling of the
    Annex K base tables."""
    from ddpm_image_restoration_tpu.codecs.surrogate import _JPEG_CHROMA, _JPEG_LUMA

    scale = 5000.0 / quality if quality < 50 else 200.0 - 2.0 * quality
    def scaled(base):
        return np.clip(np.floor((base * scale + 50.0) / 100.0), 1, 255)
    return scaled(_JPEG_LUMA), scaled(_JPEG_CHROMA)


def estimate_jpeg_quality(image) -> int | None:
    """Recover the encoder quality setting of a JPEG from its quantization
    tables (a capability the reference lacks: every harness there takes the
    quality as ground-truth input).

    Accepts a path or an open PIL image. Returns the q in [1, 100] whose
    libjpeg-standard tables are closest (L1 over *sorted* entries, making the
    comparison independent of zigzag-vs-natural coefficient order, which
    varies across Pillow versions), or None when the file is not a JPEG /
    carries no quantization tables (non-standard encoders still resolve to
    the nearest standard quality).
    """
    from PIL import Image

    im = image
    if not hasattr(image, "quantization"):
        try:
            im = Image.open(image)
        except Exception:
            return None
    tables = getattr(im, "quantization", None)
    if not tables:
        return None
    observed = [
        np.sort(np.asarray(tables[k], np.float32)) for k in sorted(tables)[:2]
    ]
    best_q, best_err = None, np.inf
    for q in range(1, 101):
        expected = _expected_jpeg_tables(q)[: len(observed)]
        err = sum(
            float(np.abs(np.sort(e.ravel()) - o).sum())
            for e, o in zip(expected, observed)
        )
        if err < best_err:
            best_q, best_err = q, err
    return best_q
