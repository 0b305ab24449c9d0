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

    def surrogate_out(codec, q, mult, s, t):
        return np.asarray(sur._surrogate_raw(
            xj, jnp.float32(q), codec, True, jnp.float32(mult),
            jnp.float32(s), jnp.float32(t)))

    def surrogate_mse(codec, q, mult, s, t):
        return float(np.mean((surrogate_out(codec, q, mult, s, t) - x) ** 2))

    psnr = lambda e: -10 * np.log10(e + 1e-9)

    def fit_mult(codec, q, target, s, t):
        """Bisection on monotone distortion MSE(mult) at fixed deblock."""
        lo, hi = 0.02, 50.0
        for _ in range(24):
            mid = (lo * hi) ** 0.5
            if surrogate_mse(codec, q, mid, s, t) < target:
                lo = mid
            else:
                hi = mid
        return (lo * hi) ** 0.5

    # Two coupled fits per (codec, quality):
    #   mult   — matches the surrogate's DISTORTION (MSE vs clean) to the
    #            real codec's, anchoring degradation severity;
    #   (s, T) — the in-loop deblocking strength and edge threshold, chosen
    #            jointly to minimize the surrogate's DIRECT error against
    #            the real codec output (the loop filter barely moves
    #            distortion but changes where the error lives — exactly what
    #            the solver's consistency step feels). Coordinate descent,
    #            2 rounds; JPEG is pinned s=0 (no in-loop filter).
    S_GRID = [0.0, 0.15, 0.3, 0.45, 0.6, 0.8, 1.0]
    T_GRID = [4.0, 6.0, 8.0, 12.0, 16.0, 24.0, 32.0]
    cal, dbl = {}, {}
    for codec in ["jpeg", "webp", "avif"]:
        qs, ms, ss, ts = [], [], [], []
        for q in args.qualities:
            real = compress_batch(x, codec, q)
            target = float(np.mean((real - x) ** 2))
            s, t = 0.0, 8.0
            m = fit_mult(codec, q, target, s, t)
            base_direct = float(np.mean(
                (surrogate_out(codec, q, m, 0.0, t) - real) ** 2))
            if codec != "jpeg":
                for _ in range(2):
                    best = min(
                        ((float(np.mean(
                            (surrogate_out(codec, q, m, cs, ct) - real) ** 2)),
                          cs, ct)
                         for cs in S_GRID for ct in T_GRID),
                    )
                    _, s, t = best
                    m = fit_mult(codec, q, target, s, t)
            got = surrogate_mse(codec, q, m, s, t)
            final_direct = float(np.mean(
                (surrogate_out(codec, q, m, s, t) - real) ** 2))
            qs.append(q)
            ms.append(round(m, 4))
            ss.append(round(s, 3))
            ts.append(round(t, 1))
            print(f"    # {codec} q={q}: real {psnr(target):.2f}dB "
                  f"sur {psnr(got):.2f}dB mult {m:.3f} deblock s={s:.2f} "
                  f"T={t:.0f} sur-vs-real "
                  f"{psnr(base_direct):.2f}->{psnr(final_direct):.2f}dB")
        cal[codec] = (qs, ms)
        dbl[codec] = (qs, ss, ts)
    print("_CALIBRATION = {")
    for codec, (qs, ms) in cal.items():
        print(f'    "{codec}": ({qs}, {ms}),')
    print("}")
    print("_DEBLOCK = {")
    for codec, (qs, ss, ts) in dbl.items():
        print(f'    "{codec}": ({qs}, {ss}, {ts}),')
    print("}")


if __name__ == "__main__":
    main()
