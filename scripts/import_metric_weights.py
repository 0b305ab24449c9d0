#!/usr/bin/env python
r"""One-command proxy -> canonical metric upgrade (VERDICT.md round-1 #10).

This environment has zero egress, so the canonical LPIPS (AlexNet,
webp_training.py:546) and FID (InceptionV3, webp_inference.py:744-765)
weights cannot be downloaded. When the files appear (copied in by any
means), this script converts/installs them so every eval upgrades
automatically:

  python scripts/import_metric_weights.py \
      --alexnet  alexnet-owt-7be5be79.pth \      # torchvision AlexNet
      --lpips-lin alex.pth \                      # lpips/weights/v0.1/alex.pth
      --inception inception_v3_google-*.pth       # torchvision InceptionV3

* --alexnet + --lpips-lin  -> writes weights/lpips_alex.npz (pure-jnp
  canonical LPIPS backbone + calibration; evaluation/lpips.py auto-probes
  this path and reports lpips_kind="lpips_alex" in metrics_summary.json).
* --inception              -> copies the checkpoint into the torch hub cache
  so evaluation/fid.py's InceptionFeatureExtractor.available() turns true
  and FID switches from the random_conv Frechet proxy to canonical FID.

With no arguments: probes all known cache locations and reports exactly
which files are present/missing and what each drop enables.
"""


from __future__ import annotations

import argparse
import glob
import os
import shutil
import sys

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.abspath(__file__)), ".."))  # run without install

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
HUB_DIR = os.path.expanduser("~/.cache/torch/hub/checkpoints")
LPIPS_NPZ = os.path.join(REPO, "weights", "lpips_alex.npz")

# LPIPS taps the 5 conv layers of torchvision AlexNet .features
_ALEX_CONV_KEYS = ["features.0", "features.3", "features.6", "features.8", "features.10"]


def _state_dict(path):
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    return sd.get("state_dict", sd) if isinstance(sd, dict) else sd


def convert_lpips(alexnet_pth: str, lin_pth: str, out: str = LPIPS_NPZ) -> str:
    sd = _state_dict(alexnet_pth)
    lin_sd = _state_dict(lin_pth)
    arrays = {}
    for i, k in enumerate(_ALEX_CONV_KEYS):
        w = np.asarray(sd[f"{k}.weight"], np.float32)  # OIHW
        arrays[f"conv{i}_w"] = w.transpose(2, 3, 1, 0)  # -> HWIO
        arrays[f"conv{i}_b"] = np.asarray(sd[f"{k}.bias"], np.float32)
    for i in range(5):
        # lpips stores NetLinLayer as lin{i}.model.1.weight [1, C, 1, 1]
        for key in (f"lin{i}.model.1.weight", f"lin{i}.weight", f"lin{i}"):
            if key in lin_sd:
                arrays[f"lin{i}"] = np.asarray(lin_sd[key], np.float32).reshape(-1)
                break
        else:
            raise KeyError(f"no lin{i} weight in {lin_pth} (keys: {list(lin_sd)[:8]})")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    np.savez(out, **arrays)
    return out


def install_inception(pth: str) -> str:
    os.makedirs(HUB_DIR, exist_ok=True)
    dst = os.path.join(HUB_DIR, os.path.basename(pth))
    shutil.copy2(pth, dst)
    return dst


def probe() -> int:
    print("canonical-metric weight probe:")
    ok = os.path.exists(LPIPS_NPZ)
    print(f"  LPIPS npz {LPIPS_NPZ}: {'PRESENT -> lpips_alex' if ok else 'missing -> lpips_proxy'}")
    hits = glob.glob(os.path.join(HUB_DIR, "inception_v3*.pth"))
    print(f"  InceptionV3 in {HUB_DIR}: "
          f"{hits[0] + ' -> canonical FID' if hits else 'missing -> random_conv Frechet proxy'}")
    alex = glob.glob(os.path.join(HUB_DIR, "alexnet*.pth"))
    if alex and not ok:
        print(f"  found {alex[0]}; rerun with --alexnet {alex[0]} --lpips-lin <lpips alex.pth>")
    return 0


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--alexnet", help="torchvision AlexNet .pth (alexnet-owt-*.pth)")
    ap.add_argument("--lpips-lin", help="lpips package linear weights (weights/v0.1/alex.pth)")
    ap.add_argument("--inception", help="torchvision InceptionV3 .pth to install")
    ap.add_argument("--out", default=LPIPS_NPZ, help="LPIPS npz output path")
    args = ap.parse_args(argv)

    if not (args.alexnet or args.inception):
        return probe()
    if bool(args.alexnet) != bool(args.lpips_lin):
        ap.error("--alexnet and --lpips-lin must be given together")
    if args.alexnet:
        out = convert_lpips(args.alexnet, args.lpips_lin, args.out)
        print(f"wrote {out}; evals now report lpips_kind=lpips_alex")
    if args.inception:
        dst = install_inception(args.inception)
        print(f"installed {dst}; evals now use canonical InceptionV3 FID")
    return 0


if __name__ == "__main__":
    sys.exit(main())
