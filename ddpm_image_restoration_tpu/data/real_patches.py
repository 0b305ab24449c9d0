"""Real photographic patches harvested from library-bundled images.

The reference's published tables are measured on ImageNet-val 64x64
(/root/reference/webp_training.py:54-71); this environment has no ImageNet on
disk, so round-1 quality runs used procedural synthetic images only. This
module closes part of that gap with the only *real photographs* guaranteed to
exist here: sample images shipped inside baked-in Python packages
(matplotlib's grace_hopper.jpg, scikit-learn's china.jpg / flower.jpg).

Tiling each source into non-overlapping ``size``x``size`` crops at several
downscale factors yields a few hundred genuine natural-image patches —
photographic textures, edges, depth-of-field blur, real JPEG provenance (like
ImageNet itself) — which is enough for a held-out *evaluation* set. Training
should stay on the synthetic generators (or a real --data-dir): ~250 patches
from three photographs would overfit, and keeping evaluation disjoint from
training data makes the quality claim strictly stronger ("trained on
procedural images, evaluated on real photographs").

Determinism: sources are a fixed, sorted list; patch order is (source, scale,
row, col); the train/eval split and any truncation use a seeded permutation.
"""

from __future__ import annotations

import os
from typing import List, Optional, Sequence

import numpy as np
from PIL import Image

_SPLITS = ("all", "train", "eval")


def bundled_source_paths() -> List[str]:
    """Absolute paths of real photographs shipped with baked-in packages.

    Only high-resolution photographic sources are used (no logos, sprites, or
    screenshots). Missing packages are skipped, so the list is safe to call in
    any environment; it is sorted for determinism.
    """
    paths: List[str] = []
    try:
        import matplotlib

        p = os.path.join(os.path.dirname(matplotlib.__file__),
                         "mpl-data", "sample_data", "grace_hopper.jpg")
        if os.path.exists(p):
            paths.append(p)
    except ImportError:  # pragma: no cover - matplotlib is baked in
        pass
    try:
        import sklearn.datasets

        d = os.path.join(os.path.dirname(sklearn.datasets.__file__), "images")
        for f in ("china.jpg", "flower.jpg"):
            p = os.path.join(d, f)
            if os.path.exists(p):
                paths.append(p)
    except ImportError:  # pragma: no cover
        pass
    return sorted(paths)


def _harvest(path: str, size: int, scales: Sequence[int],
             min_std: float) -> List[np.ndarray]:
    """Non-overlapping size^2 uint8 crops of `path` at each downscale factor.

    Downscaling uses PIL BOX (area averaging — clean antialiasing), the same
    family of resampling the reference's Resize(64) applies to full ImageNet
    frames; near-constant patches (grayscale std below `min_std` in [0,1])
    are dropped so sky/blur tiles don't dominate the set.
    """
    img = Image.open(path).convert("RGB")
    out: List[np.ndarray] = []
    for f in scales:
        w, h = img.size[0] // f, img.size[1] // f
        if w < size or h < size:
            continue
        arr = np.asarray(img.resize((w, h), Image.BOX), dtype=np.uint8)
        for y in range(0, h - size + 1, size):
            for x in range(0, w - size + 1, size):
                patch = arr[y:y + size, x:x + size]
                gray = patch.astype(np.float32).mean(axis=-1) / 255.0
                if float(gray.std()) >= min_std:
                    out.append(patch)
    return out


class RealPatchDataset:
    """[-1,1] float32 NHWC patches from bundled real photographs.

    Args:
      n: number of patches (0 = all available after the split).
      image_size: patch side in pixels.
      seed: seeds the permutation used for the train/eval split and for
        which patches a truncated set keeps.
      split: 'all', 'train', or 'eval' — 'eval' holds out `eval_frac` of the
        shuffled patches, disjoint from 'train' at the same seed, so real
        patches can feed both sides of a run without leakage.
      scales: downscale factors applied to each source before tiling.
      min_std: near-constant patch rejection threshold.
      extra_sources: additional image files to harvest alongside the bundled
        ones (e.g. user-provided photographs).
    """

    def __init__(self, n: int = 0, image_size: int = 64, seed: int = 99,
                 split: str = "all", eval_frac: float = 0.25,
                 scales: Sequence[int] = (1, 2, 4), min_std: float = 0.03,
                 extra_sources: Optional[Sequence[str]] = None):
        if split not in _SPLITS:
            raise ValueError(f"split must be one of {_SPLITS}, got {split!r}")
        sources = bundled_source_paths() + sorted(extra_sources or [])
        if not sources:
            raise RuntimeError(
                "no bundled real-image sources found (matplotlib/sklearn "
                "sample images missing) and no extra_sources given")
        patches: List[np.ndarray] = []
        for p in sources:
            patches.extend(_harvest(p, image_size, scales, min_std))
        if not patches:
            raise RuntimeError(
                f"no {image_size}^2 patches survived harvesting from "
                f"{len(sources)} sources")
        order = np.random.default_rng(seed).permutation(len(patches))
        n_eval = max(1, int(round(len(patches) * eval_frac)))
        if split == "eval":
            order = order[:n_eval]
        elif split == "train":
            order = order[n_eval:]
        if n:
            order = order[:n]
        self.image_size = image_size
        self.split = split
        self._data = np.stack([patches[int(i)] for i in order])  # uint8 NHWC

    def __len__(self) -> int:
        return len(self._data)

    def __getitem__(self, idx: int) -> np.ndarray:
        return self._data[idx].astype(np.float32) / 255.0 * 2.0 - 1.0


class ConcatDataset:
    """Concatenation of datasets with the [-1,1] NHWC __getitem__ protocol."""

    def __init__(self, *datasets):
        if not datasets:
            raise ValueError("need at least one dataset")
        self.datasets = datasets
        sizes = {getattr(d, "image_size", None) for d in datasets}
        sizes.discard(None)
        if len(sizes) > 1:
            raise ValueError(f"mismatched image sizes: {sorted(sizes)}")
        self._offsets = np.cumsum([len(d) for d in datasets])

    def __len__(self) -> int:
        return int(self._offsets[-1])

    def __getitem__(self, idx: int) -> np.ndarray:
        if idx < 0:
            idx += len(self)
        if idx < 0 or idx >= len(self):
            raise IndexError(f"index {idx - len(self) if idx < 0 else idx} "
                             f"out of range for {len(self)} items")
        d = int(np.searchsorted(self._offsets, idx, side="right"))
        prev = 0 if d == 0 else int(self._offsets[d - 1])
        return self.datasets[d][idx - prev]
