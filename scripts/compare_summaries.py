#!/usr/bin/env python
"""Per-quality delta between two evaluate metrics_summary.json files.

Primary use: SURVEY hard-part 1 / VERDICT #4 — quantify the surrogate
consistency step against the bit-exact PIL codec (`host_loop`) on the same
trained checkpoint and eval set:

    python scripts/compare_summaries.py \
        results/r2_parity/webp_prod/metrics_summary.json \
        results/r2_parity/webp_hostloop/metrics_summary.json \
        --labels surrogate host_loop

Reference semantics are the real codec (webp_training.py:452); the
acceptance bar is |restored-PSNR delta| <= 0.1 dB at every quality
(SURVEY.md section 7 hard part 1). Exits non-zero if the bar is missed so
queues can flag it.
"""
from __future__ import annotations
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), ".."))  # run without install
del _os, _sys


import argparse
import json
import sys


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("a")
    ap.add_argument("b")
    ap.add_argument("--labels", nargs=2, default=["A", "B"])
    ap.add_argument("--bar", type=float, default=0.1,
                    help="max |restored PSNR delta| in dB (0 = report only)")
    args = ap.parse_args()

    a = json.load(open(args.a))
    b = json.load(open(args.b))
    la, lb = args.labels
    print(f"| Q | {la} PSNR | {lb} PSNR | ΔPSNR (dB) | {la} SSIM | {lb} SSIM | ΔSSIM |")
    print("|---|---|---|---|---|---|---|")
    worst = 0.0
    compared = 0
    for q in sorted(a["results"], key=int):
        if q not in b["results"]:
            continue
        compared += 1
        ra, rb = a["results"][q], b["results"][q]
        dp = rb["restored_psnr"] - ra["restored_psnr"]
        ds = rb["restored_ssim"] - ra["restored_ssim"]
        worst = max(worst, abs(dp))
        print(f"| {q} | {ra['restored_psnr']:.2f} | {rb['restored_psnr']:.2f} "
              f"| {dp:+.3f} | {ra['restored_ssim']:.4f} | {rb['restored_ssim']:.4f} "
              f"| {ds:+.4f} |")
    if compared == 0:
        # No shared quality keys (e.g. different --qualities grids): a
        # "worst = 0.0" pass here would be vacuous — fail loudly instead.
        print("\nERROR: the two summaries share no quality keys; nothing "
              "was compared", file=sys.stderr)
        return 2
    print(f"\nworst |ΔPSNR| = {worst:.3f} dB over {compared} qualities "
          f"({'within' if worst <= args.bar else 'EXCEEDS'} the {args.bar} dB bar)")
    return 0 if (args.bar == 0 or worst <= args.bar) else 1


if __name__ == "__main__":
    sys.exit(main())
