#!/usr/bin/env python
"""Emit the docs/PARITY.md stride-1 surrogate-vs-host_loop table from the
round-4 queue's matched runs.

Reads results/<dir>/{codec}_sg_s1 and {codec}_hl_s1 metrics_summary.json
pairs (same checkpoint, same eval images, same q grid, stride 1;
`scripts/onchip_queue_r4.sh` jobs 4) and prints the markdown rows for the
"Matched config: stride 1" table plus a per-codec pass/fail against the
SURVEY section-7 <= 0.1 dB bar, so the doc can be filled by copy-paste the
moment the queue lands instead of hand-transcribing six JSON files.

Usage:
    python scripts/fill_parity_s1.py results/r4
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.abspath(__file__)), ".."))  # run without install


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("root", help="results dir holding <codec>_{sg,hl}_<suffix>/")
    ap.add_argument("--bar", type=float, default=0.1)
    ap.add_argument("--suffix", default="s1",
                    help="run-name suffix: s1 (stride-1 grid) or s5 "
                         "(stride-5 matched-config re-measure)")
    args = ap.parse_args(argv)

    sfx = args.suffix
    print(f"| codec | q | surrogate {sfx} (dB) | host_loop {sfx} (dB) | delta | ≤0.1 dB? |")
    print("|---|---|---|---|---|---|")
    missing, verdicts = [], []
    for codec in ("jpeg", "webp", "avif"):
        pair = {}
        for kind in ("sg", "hl"):
            p = os.path.join(args.root, f"{codec}_{kind}_{sfx}",
                             "metrics_summary.json")
            if not os.path.exists(p):
                missing.append(p)  # keep scanning: report ALL missing files
                continue
            with open(p) as f:
                pair[kind] = json.load(f)
        if len(pair) < 2:
            continue
        worst = 0.0
        for q in sorted(pair["sg"]["results"], key=int):
            if q not in pair["hl"]["results"]:
                continue
            sg = pair["sg"]["results"][q]["restored_psnr"]
            hl = pair["hl"]["results"][q]["restored_psnr"]
            d = hl - sg
            worst = max(worst, abs(d))
            print(f"| {codec} | {q} | {sg:.2f} | {hl:.2f} | {d:+.3f} | "
                  f"{'yes' if abs(d) <= args.bar else 'NO'} |")
        verdicts.append(
            f"{codec}: worst |Δ| = {worst:.3f} dB -> "
            f"{'pass' if worst <= args.bar else 'FAIL'}")
    print()
    for v in verdicts:
        print(v)
    if missing:
        print("\nmissing summaries (jobs not landed yet):", file=sys.stderr)
        for p in missing:
            print(f"  {p}", file=sys.stderr)
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
