"""Regenerate the WebP quality -> y_ac_qi calibration table in
codecs/estimate.py: encode dead-leaves (natural-image-statistics) images at
each quality with PIL/libwebp and record the median parsed quantizer index."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), ".."))  # run without install
del _os, _sys


import io

import numpy as np
from PIL import Image

from ddpm_image_restoration_tpu.codecs.estimate import parse_webp_y_ac_qi
from ddpm_image_restoration_tpu.data.dataset import SyntheticImageDataset


def main(n_images: int = 12, size: int = 128, seed: int = 3):
    ds = SyntheticImageDataset(n_images, size, seed=seed, kind="dead_leaves")
    imgs = [
        Image.fromarray(((ds[i] * 0.5 + 0.5) * 255).astype(np.uint8))
        for i in range(n_images)
    ]
    qualities = list(range(0, 101, 5))
    medians = []
    for q in qualities:
        qis = []
        for im in imgs:
            buf = io.BytesIO()
            im.save(buf, "WEBP", quality=q)
            qis.append(parse_webp_y_ac_qi(buf.getvalue()))
        medians.append(int(np.median(qis)))
        print(f"q={q:3d}  qi median={medians[-1]:3d}  spread={min(qis)}..{max(qis)}")
    print("\n_WEBP_CAL_QI = np.array(")
    print(f"    {medians},")
    print("    dtype=np.float32,\n)")


if __name__ == "__main__":
    main()
