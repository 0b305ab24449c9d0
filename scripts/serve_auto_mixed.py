#!/usr/bin/env python
"""End-to-end `--codec auto --quality auto` serve exercise on real mixed files.

Builds a watch directory of REAL photographic patches (data/real_patches.py,
eval split) compressed as a mixed pile of JPEG / WebP / AVIF at assorted
qualities, runs the directory-watching service once against the unified
'all' checkpoint (artifacts/r2_all), and reports per-file restored-vs-
original PSNR next to the compressed-vs-original PSNR.

This is VERDICT #7's second half: the unified checkpoint + bitstream codec
detection + per-file quality estimation exercised on disk files the way a
user of the reference would (reference has no serving layer at all — its
closest workflow is webp_inference.py:604's per-image loop).
"""
from __future__ import annotations
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), ".."))  # run without install
del _os, _sys


import argparse
import os
from pathlib import Path

import numpy as np
from PIL import Image


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = float(np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2))
    return -10.0 * np.log10(mse + 1e-12) + 20.0 * np.log10(255.0)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="results/r2_parity/serve_auto")
    ap.add_argument("--checkpoint-dir", default="artifacts/r2_all")
    ap.add_argument("--params-npz", default=None,
                    help="release-weight npz (artifacts_release/*.npz); "
                         "takes precedence over --checkpoint-dir so the "
                         "exercise survives artifacts/ being wiped")
    ap.add_argument("--n", type=int, default=12)
    ap.add_argument("--smoke", action="store_true",
                    help="CPU smoke mode: random-init narrow model (plumbing "
                         "check only; PSNR deltas will be negative)")
    args = ap.parse_args()

    from ddpm_image_restoration_tpu.data import RealPatchDataset

    out = Path(args.out)
    watch = out / "watch"
    restored_dir = out / "restored"
    clean_dir = out / "clean"
    for d in (watch, restored_dir, clean_dir):
        d.mkdir(parents=True, exist_ok=True)

    ds = RealPatchDataset(args.n, image_size=64, split="eval")
    plan = [("jpeg", ".jpg", 15), ("webp", ".webp", 30), ("avif", ".avif", 50),
            ("jpeg", ".jpg", 70), ("webp", ".webp", 10), ("avif", ".avif", 85)]
    names = []
    for i in range(len(ds)):
        arr = ((ds[i] + 1.0) * 127.5).clip(0, 255).astype(np.uint8)
        img = Image.fromarray(arr)
        codec, ext, q = plan[i % len(plan)]
        name = f"patch{i:02d}_{codec}_q{q}"
        img.save(clean_dir / f"{name}.png")
        save_kwargs = {"quality": q}
        if codec == "avif":
            try:
                import pillow_avif  # noqa: F401
            except ImportError:
                pass
        try:
            img.save(watch / f"{name}{ext}", **save_kwargs)
        except Exception as e:  # AVIF plugin may be absent -> skip those
            print(f"skip {name}: {e}")
            continue
        names.append(name)
    print(f"{len(names)} mixed compressed files in {watch}")

    from ddpm_image_restoration_tpu.cli.serve import main as serve_main

    serve_argv = [
        "--watch", str(watch), "--output-dir", str(restored_dir),
        "--codec", "auto", "--model-codec", "all", "--quality", "auto",
        "--attn-max-res", "32", "--solver", "auto",
        "--batch-size", "4", "--once",
    ]
    if args.smoke:
        serve_argv += ["--random-init", "--width-scale", "8",
                       "--platform", "cpu", "--steps", "8"]
    elif args.params_npz:
        serve_argv += ["--params-npz", args.params_npz]
    else:
        serve_argv += ["--checkpoint-dir", args.checkpoint_dir, "--use-ema"]
    serve_main(serve_argv)

    rows = []
    for name in names:
        clean = np.asarray(Image.open(clean_dir / f"{name}.png").convert("RGB"))
        rest_path = restored_dir / f"{name}_restored.png"
        if not rest_path.exists():
            print(f"MISSING restored output for {name}")
            continue
        rest = np.asarray(Image.open(rest_path).convert("RGB"))
        comp_file = next(watch.glob(f"{name}.*"), None) or next(
            (watch / "done").glob(f"{name}.*"), None)
        comp = np.asarray(Image.open(comp_file).convert("RGB")) if comp_file else None
        p_rest = psnr(clean, rest)
        p_comp = psnr(clean, comp) if comp is not None else float("nan")
        rows.append((name, p_comp, p_rest))
    print(f"\n{'file':28s} {'comp PSNR':>10s} {'rest PSNR':>10s} {'delta':>8s}")
    deltas = []
    for name, pc, pr in rows:
        print(f"{name:28s} {pc:10.2f} {pr:10.2f} {pr - pc:+8.2f}")
        deltas.append(pr - pc)
    if deltas:
        print(f"\nmean delta {np.mean(deltas):+.2f} dB over {len(deltas)} files "
              f"(positive = the unified auto-dispatch service improved the file)")


if __name__ == "__main__":
    main()
