"""Real photographic patches harvested from library-bundled images.

The reference's published tables are measured on ImageNet-val 64x64
(/root/reference/webp_training.py:54-71); this environment has no ImageNet on
disk, so early quality runs used procedural synthetic images only. This module
closes part of that gap with the only *real photographs* guaranteed to exist
here: sample images shipped inside baked-in Python packages. The round-4 audit
of every installed package found exactly four natural photographs (skimage,
scipy.datasets, torchvision and the PIL test suite are NOT installed, and the
remaining bundled JPEG/PNGs are sprites, logos, plots, screenshots or
false-color frames):

  * matplotlib  grace_hopper.jpg   600x800  (portrait, flag, uniform detail)
  * sklearn     china.jpg          640x427  (temple: edges, foliage, sky)
  * sklearn     flower.jpg         640x427  (macro: bokeh, saturated color)
  * pygame docs camera_rgb.jpg     320x240  (webcam: brick wall, tree)

Train/eval split is BY IMAGE REGION, not by patch: each photo is cut at
``(1 - eval_frac)`` of its width, the left region feeds 'train' and the right
region feeds 'eval', and each region is tiled independently at every scale.
This guarantees the two splits share no source pixels at ANY scale — the
older patch-level split kept patch pixel sets disjoint per scale but let a
scale-1 eval patch's content reappear inside a scale-2 train patch, a
cross-scale leak that would taint "trained on X, held out Y" claims.

The corpus is small (four photographs; report ``len(dataset)`` next to every
number derived from it). For *training*, ``augment=True`` expands each patch
through the 8-element dihedral group deterministically (index -> (patch,
transform)); evaluation stays unaugmented and disjoint.

Determinism: sources are a fixed, sorted list; patch order is (source, scale,
row, col); within-split ordering and any truncation use a seeded permutation.
"""

from __future__ import annotations

import os
from typing import List, Optional, Sequence, Tuple

import numpy as np
from PIL import Image

_SPLITS = ("all", "train", "eval")


def bundled_source_paths() -> List[str]:
    """Absolute paths of real photographs shipped with baked-in packages.

    Only natural photographic sources are used (no logos, sprites, plots,
    screenshots, or false-color frames — the round-4 audit viewed every
    bundled raster in site-packages and kept exactly these). Missing packages
    are skipped, so the list is safe to call in any environment; it is sorted
    for determinism.
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
    try:
        os.environ.setdefault("PYGAME_HIDE_SUPPORT_PROMPT", "1")
        import pygame

        # The one natural photo in pygame's docs: the camera-module example
        # frame (brick wall + tree). Its siblings (camera_hsv/yuv/mask/...)
        # are color-space transforms or binary masks of other frames — not
        # natural images — and are deliberately excluded.
        p = os.path.join(os.path.dirname(pygame.__file__), "docs",
                         "generated", "_images", "camera_rgb.jpg")
        if os.path.exists(p):
            paths.append(p)
    except ImportError:  # pragma: no cover
        pass
    return sorted(paths)


def _harvest_array(arr_full: np.ndarray, size: int, scales: Sequence[int],
                   min_std: float) -> List[np.ndarray]:
    """Non-overlapping size^2 uint8 crops of an RGB array per downscale factor.

    Downscaling uses PIL BOX (area averaging — clean antialiasing), the same
    family of resampling the reference's Resize(64) applies to full ImageNet
    frames; near-constant patches (grayscale std below `min_std` in [0,1])
    are dropped so sky/blur tiles don't dominate the set.
    """
    img = Image.fromarray(arr_full)
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


def _harvest_split(path: str, size: int, scales: Sequence[int],
                   min_std: float, eval_frac: float,
                   ) -> Tuple[List[np.ndarray], List[np.ndarray]]:
    """(train_patches, eval_patches) for one photo under the region split.

    The photo is cut at ``round(width * (1 - eval_frac))``; each side is
    harvested independently at every scale, so no source pixel can appear in
    both splits at any scale.
    """
    arr = np.asarray(Image.open(path).convert("RGB"), dtype=np.uint8)
    cut = int(round(arr.shape[1] * (1.0 - eval_frac)))
    train = _harvest_array(arr[:, :cut], size, scales, min_std)
    ev = _harvest_array(arr[:, cut:], size, scales, min_std)
    return train, ev


def _dihedral(patch: np.ndarray, k: int) -> np.ndarray:
    """k-th element (0-7) of the dihedral group: rot90^(k%4) o flip^(k//4)."""
    if k >= 4:
        patch = patch[:, ::-1]
    return np.ascontiguousarray(np.rot90(patch, k % 4))


class RealPatchDataset:
    """[-1,1] float32 NHWC patches from bundled real photographs.

    Args:
      n: number of distinct patches (0 = all available in the split).
      image_size: patch side in pixels.
      seed: seeds the within-split shuffle (and therefore which patches a
        truncated set keeps). The train/eval boundary itself is geometric
        (region split) and does not depend on the seed.
      split: 'all', 'train', or 'eval' — each photo's right `eval_frac` of
        width is the eval region; 'all' is the concatenation of both splits,
        so len(all) == len(train) + len(eval) at matching settings.
      eval_frac: width fraction of each source held out for 'eval'.
      scales: downscale factors applied to each region before tiling.
      min_std: near-constant patch rejection threshold.
      augment: expand each patch through the 8 dihedral transforms
        (len becomes 8x; index maps deterministically to (patch, transform)).
        Intended for training only — never enable for a held-out eval.
      extra_sources: additional image files to harvest alongside the bundled
        ones (e.g. user-provided photographs); they get the same region split.
    """

    def __init__(self, n: int = 0, image_size: int = 64, seed: int = 99,
                 split: str = "all", eval_frac: float = 0.3,
                 scales: Sequence[int] = (1, 2, 4), min_std: float = 0.03,
                 augment: bool = False,
                 extra_sources: Optional[Sequence[str]] = None):
        if split not in _SPLITS:
            raise ValueError(f"split must be one of {_SPLITS}, got {split!r}")
        sources = bundled_source_paths() + sorted(extra_sources or [])
        if not sources:
            raise RuntimeError(
                "no bundled real-image sources found (matplotlib/sklearn/"
                "pygame sample images missing) and no extra_sources given")
        train_p: List[np.ndarray] = []
        eval_p: List[np.ndarray] = []
        for p in sources:
            tr, ev = _harvest_split(p, image_size, scales, min_std, eval_frac)
            train_p.extend(tr)
            eval_p.extend(ev)
        patches = {"train": train_p, "eval": eval_p,
                   "all": train_p + eval_p}[split]
        if not patches:
            raise RuntimeError(
                f"no {image_size}^2 patches survived harvesting the {split!r} "
                f"regions of {len(sources)} sources")
        order = np.random.default_rng(seed).permutation(len(patches))
        if n:
            order = order[:n]
        self.image_size = image_size
        self.split = split
        self.augment = bool(augment)
        self._data = np.stack([patches[int(i)] for i in order])  # uint8 NHWC

    def __len__(self) -> int:
        return len(self._data) * (8 if self.augment else 1)

    def __getitem__(self, idx: int) -> np.ndarray:
        if self.augment:
            patch = _dihedral(self._data[idx // 8], idx % 8)
        else:
            patch = self._data[idx]
        return patch.astype(np.float32) / 255.0 * 2.0 - 1.0


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
