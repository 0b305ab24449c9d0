#!/usr/bin/env python
"""Flatten a set of eval summaries into one markdown ablation table.

Each row is one (run, quality): the solver-config overrides recorded by
evaluation/harness.py (eta / eta_b / init_t / phase_threshold / stride /
encoder-reuse) next to the compressed->restored PSNR/SSIM deltas, so a
controlled experiment (one variable changed per run, same images/keys)
reads as a single table. Used for the round-3 AVIF q1/q90 regression
experiments (results/r3/ab_*) and the WebP solver-policy sweep
(results/r3/ex_*).

Usage:
    python scripts/ablation_report.py results/r3/avif_ref results/r3/ab_* \
        [--out results/r3/ABLATION.md]
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def describe(summary: dict) -> str:
    """Compact config label from the recorded solver fields."""
    bits = []
    if summary.get("solver") == "auto":
        bits.append("auto")
    elif summary.get("max_evals"):
        bits.append(f"me{summary['max_evals']}")
    else:
        bits.append(f"s{summary.get('stride')}")
    if summary.get("encoder_reuse", 1) > 1:
        bits.append(f"enc{summary['encoder_reuse']}")
    if summary.get("eta") is not None:
        bits.append(f"eta{summary['eta']:g}")
    if summary.get("eta_b") is not None:
        bits.append(f"etab{summary['eta_b']:g}")
    if summary.get("init_t_override"):
        bits.append(f"it{summary['init_t_override']}")
    if summary.get("phase_threshold") is not None:
        bits.append(f"ph{summary['phase_threshold']}")
    if not summary.get("final_exact", True):
        bits.append("nofinal")
    if summary.get("consistency_mode") != "surrogate":
        bits.append(summary.get("consistency_mode", "?"))
    return " ".join(bits)


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("runs", nargs="+", help="eval output dirs (or summary JSONs)")
    ap.add_argument("--out", default=None, help="also write the table here")
    args = ap.parse_args(argv)

    lines = [
        "| run | config | Q | comp PSNR | rest PSNR | ΔPSNR | ΔSSIM | img/s |",
        "|---|---|---|---|---|---|---|---|",
    ]
    for run in args.runs:
        path = run if run.endswith(".json") else os.path.join(
            run, "metrics_summary.json")
        if not os.path.exists(path):
            print(f"skip {run}: no summary", file=sys.stderr)
            continue
        with open(path) as f:
            s = json.load(f)
        label = describe(s)
        name = os.path.basename(run.rstrip("/")).removesuffix(
            "metrics_summary.json")
        for q, r in sorted(s["results"].items(), key=lambda kv: int(kv[0])):
            dp = r["restored_psnr"] - r["compressed_psnr"]
            ds = r["restored_ssim"] - r["compressed_ssim"]
            lines.append(
                f"| {name} | {label} | {q} | {r['compressed_psnr']:.2f} "
                f"| {r['restored_psnr']:.2f} | {dp:+.3f} | {ds:+.4f} "
                f"| {r.get('images_per_sec', 0):.1f} |"
            )
    table = "\n".join(lines)
    print(table)
    if args.out:
        with open(args.out, "w") as f:
            f.write(table + "\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
