#!/usr/bin/env python
"""Assemble docs/PARITY.md stride-1 rows from per-quality cell dirs.

Round-5 final sessions run each (codec, mode, quality) stride-1 cell as
its own evaluate invocation (results/r5/<codec>_{sg,hl}_s1_q<q>/) so a
timeout never forces a landed quality to re-run on the 1-core host. This
merges those summaries (plus any multi-quality *_{sg,hl}_s1* dirs from
earlier queues) into the markdown table, pairing modes per quality and
scoring the SURVEY section-7 <= 0.1 dB bar.

Usage: python scripts/parity_cells_table.py results/r5 [--bar 0.1]
"""
from __future__ import annotations

import argparse
import glob
import json
import os


def collect(root: str) -> dict:
    cells: dict = {}  # (codec, mode, q) -> restored_psnr
    for d in glob.glob(os.path.join(root, "*_s1*")):
        if not os.path.isdir(d):
            continue
        f = os.path.join(d, "metrics_summary.json")
        if not os.path.exists(f):
            continue
        s = json.load(open(f))
        codec, mode = s.get("codec"), s.get("consistency_mode")
        if s.get("stride") != 1 or mode not in ("surrogate", "host_loop"):
            continue
        for q, row in s.get("results", {}).items():
            key = (codec, mode, int(q))
            # prefer complete summaries over partial ones for dup cells
            if key in cells and s.get("partial"):
                continue
            cells[key] = row["restored_psnr"]
    return cells


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("root")
    ap.add_argument("--bar", type=float, default=0.1)
    args = ap.parse_args(argv)
    cells = collect(args.root)
    print("| codec | q | surrogate s1 (dB) | host_loop s1 (dB) | delta (host-sur) | <=0.1 dB? |")
    print("|---|---|---|---|---|---|")
    qs = sorted({k[2] for k in cells})
    for codec in ("jpeg", "webp", "avif"):
        for q in qs:
            sg = cells.get((codec, "surrogate", q))
            hl = cells.get((codec, "host_loop", q))
            if sg is None and hl is None:
                continue
            if sg is None or hl is None:
                have = "surrogate" if sg is not None else "host_loop"
                print(f"| {codec} | {q} | {sg or '—'} | {hl or '—'} | "
                      f"unpaired ({have} only) | — |")
                continue
            d = hl - sg
            verdict = "**pass**" if abs(d) <= args.bar else "no"
            print(f"| {codec} | {q} | {sg:.2f} | {hl:.2f} | {d:+.2f} | {verdict} |")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
