"""Calibrate the on-device codec surrogates against the real codecs.

For each codec and quality level, finds the quant-table strength multiplier
m(q) that makes the surrogate's distortion (MSE vs clean) match the real
codec's on a calibration image set, by bisection (surrogate MSE is monotone
in m). Emits the `_CALIBRATION` lookup tables for codecs/surrogate.py.

Usage:
    JAX_PLATFORMS=cpu python scripts/calibrate_surrogate.py [--images DIR]
"""
from __future__ import annotations
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), ".."))  # run without install
del _os, _sys



import argparse

import numpy as np


def main():
    import jax

    # The axon TPU plugin self-selects even under JAX_PLATFORMS=cpu; force
    # the CPU backend in-process so calibration never contends for the chip.
    jax.config.update("jax_platforms", "cpu")

    ap = argparse.ArgumentParser()
    ap.add_argument("--images", default=None, help="flat image dir; default synthetic")
    ap.add_argument("--n", type=int, default=32)
    ap.add_argument("--size", type=int, default=64)
    ap.add_argument("--qualities", type=int, nargs="*",
                    default=[1, 5, 10, 20, 30, 50, 70, 85, 95, 100])
    args = ap.parse_args()

    import jax.numpy as jnp

    from ddpm_image_restoration_tpu.codecs.pil_codecs import compress_batch
    from ddpm_image_restoration_tpu.codecs import surrogate as sur
    from ddpm_image_restoration_tpu.data.dataset import (
        ImageFolderDataset,
        SyntheticImageDataset,
    )

    if args.images:
        ds = ImageFolderDataset(args.images, args.size)
    else:
        ds = SyntheticImageDataset(args.n, args.size, seed=7)
    x = np.stack([ds[i] for i in range(min(args.n, len(ds)))])
    xj = jnp.asarray(x)

    def surrogate_mse(codec, q, mult):
        out = sur._surrogate_raw(xj, jnp.float32(q), codec, True, jnp.float32(mult))
        return float(np.mean((np.asarray(out) - x) ** 2))

    print("_CALIBRATION = {")
    for codec in ["jpeg", "webp", "avif"]:
        qs, ms = [], []
        for q in args.qualities:
            real = compress_batch(x, codec, q)
            target = float(np.mean((real - x) ** 2))
            lo, hi = 0.02, 50.0
            for _ in range(24):  # bisection on monotone MSE(mult)
                mid = (lo * hi) ** 0.5
                if surrogate_mse(codec, q, mid) < target:
                    lo = mid
                else:
                    hi = mid
            m = (lo * hi) ** 0.5
            got = surrogate_mse(codec, q, m)
            qs.append(q)
            ms.append(round(m, 4))
            psnr = lambda e: -10 * np.log10(e + 1e-9)
            print(f"    # {codec} q={q}: real {psnr(target):.2f}dB "
                  f"sur {psnr(got):.2f}dB mult {m:.3f}")
        print(f'    "{codec}": ({qs}, {ms}),')
    print("}")


if __name__ == "__main__":
    main()
