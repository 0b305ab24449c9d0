#!/usr/bin/env python
"""Side-by-side parity table: our eval summaries vs the reference's published numbers.

Reads the `metrics_summary*.json` files produced by
`ddpm_image_restoration_tpu.cli.evaluate` (one per codec/config) and emits a
BASELINE.md-format markdown table comparing our compressed->restored deltas
against the reference's published ImageNet-val tables
(/root/reference/README.md:15-21, produced by
/root/reference/webp_inference.py:604-858 and avif_inference.py:462-716;
values transcribed in SURVEY.md section 6 / BASELINE.md).

Usage:
    python scripts/parity_table.py results/r2_parity --out results/r2_parity/PARITY_TABLE.md
"""
from __future__ import annotations
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), ".."))  # run without install
del _os, _sys


import argparse
import json
from pathlib import Path

# Reference published deltas (restored - compressed), ImageNet-val 64x64.
# BASELINE.md / SURVEY.md section 6. JPEG's table publishes gains only (50 samples).
REFERENCE = {
    # q: (dPSNR, dSSIM, dLPIPS, dFID) — all "positive = improvement" as the
    # reference's tables report them (FID = compressed minus restored FID).
    "webp": {
        0: (+0.16, +0.0064, +0.0108, +15.52),
        5: (+0.45, +0.0095, +0.0096, +8.58),
        10: (+0.53, +0.0103, +0.0087, +6.48),
        30: (+0.70, +0.0105, +0.0066, +3.21),
        50: (+0.79, +0.0097, +0.0051, +2.06),
        70: (+0.77, +0.0077, +0.0038, +1.43),
        90: (+0.43, +0.0020, +0.0007, -0.01),
    },
    "jpeg": {
        10: (+0.44, +0.0215, +0.0049, +15.81),
        20: (+0.59, +0.0209, +0.0034, +14.84),
        30: (+0.66, +0.0182, +0.0005, +18.58),
        50: (+0.78, +0.0153, -0.0010, +18.60),
    },
    "avif": {
        1: (+0.05, +0.0048, +0.0157, +10.39),
        10: (+0.13, +0.0072, +0.0145, +13.36),
        20: (+0.25, +0.0090, +0.0114, +8.77),
        30: (+0.40, +0.0092, +0.0087, +4.65),
        50: (+0.57, +0.0071, +0.0035, +1.74),
        70: (+0.58, +0.0042, +0.0011, +0.69),
        90: (+0.43, +0.0023, +0.0004, +0.20),
    },
}


def load_summary(path: Path):
    with open(path) as f:
        return json.load(f)


def fmt_delta(v, digits=2, plus=True):
    if v is None:
        return "—"
    s = f"{v:+.{digits}f}" if plus else f"{v:.{digits}f}"
    return s


def table_for(codec: str, summary: dict, label: str) -> list[str]:
    ref = REFERENCE.get(codec, {})
    solver = ""
    if summary.get("solver") == "auto":
        solver = ", solver=auto (per-quality production policy)"
    elif summary.get("max_evals"):
        solver = f", max-evals {summary['max_evals']}"
    elif summary.get("stride") is not None:
        solver = f", stride {summary['stride']}"
    if summary.get("solver") != "auto" and summary.get("encoder_reuse", 1) > 1:
        solver += f", enc-reuse {summary['encoder_reuse']}"
    results = summary["results"]
    # FID columns join the reference-comparison table ONLY when ours is the
    # same measurement (InceptionV3 features). A random_conv Fréchet distance
    # next to a published Inception FID invites reading 0.33→0.07 against
    # 113→97 (VERDICT round 3 weak #7) — proxy numbers go to their own
    # trend table below instead.
    fid_rows = {q: m for q, m in results.items()
                if m.get("compressed_fid") is not None
                and m.get("restored_fid") is not None}
    fid_kinds = {m.get("fid_kind", "?") for m in fid_rows.values()}
    canonical_fid = bool(fid_rows) and fid_kinds == {"inception_v3"}
    fid_head = " ours ΔFID | ref ΔFID |" if canonical_fid else ""
    lines = [
        f"### {codec.upper()} — {label} "
        f"(n={summary.get('num_images', '?')} images, steps={summary.get('steps')}"
        f"{solver}, consistency={summary.get('consistency_mode')})",
        "",
        "| Q | ours PSNR comp→rest (Δ ± 95% CI) | ref ΔPSNR | ours ΔSSIM "
        f"| ref ΔSSIM | ours ΔLPIPS† | ref ΔLPIPS |{fid_head}",
        "|---|---|---|---|---|---|---|" + ("---|---|" if canonical_fid else ""),
    ]
    for q_str, m in sorted(results.items(), key=lambda kv: int(kv[0])):
        q = int(q_str)
        dpsnr = m["restored_psnr"] - m["compressed_psnr"]
        ci = m.get("delta_psnr_ci95")
        ci_s = f" ± {ci:.2f}" if isinstance(ci, float) else ""
        dssim = m["restored_ssim"] - m["compressed_ssim"]
        # Reference tables report LPIPS *improvement* (compressed - restored).
        dlpips = m["compressed_lpips"] - m["restored_lpips"]
        r = ref.get(q)
        row = (
            f"| {q} | {m['compressed_psnr']:.2f}→{m['restored_psnr']:.2f} "
            f"({fmt_delta(dpsnr)}{ci_s}) | {fmt_delta(r[0]) if r else '—'} "
            f"| {fmt_delta(dssim, 4)} | {fmt_delta(r[1], 4) if r else '—'} "
            f"| {fmt_delta(dlpips, 4)} | {fmt_delta(r[2], 4) if r else '—'} |"
        )
        if canonical_fid:
            # reference convention: positive = restored closer to originals
            dfid = m["compressed_fid"] - m["restored_fid"]
            row += f" {fmt_delta(dfid)} | {fmt_delta(r[3]) if r else '—'} |"
        lines.append(row)
    lines.append("")
    if fid_rows and not canonical_fid:
        kind = "/".join(sorted(fid_kinds))
        lines += [
            f"Proxy Fréchet trend ({kind} features — NOT comparable to the "
            "reference's Inception FID; lower = restored set closer to the "
            "originals under the proxy features):",
            "",
            "| Q | proxy Fréchet comp→rest |",
            "|---|---|",
        ]
        for q_str, m in sorted(fid_rows.items(), key=lambda kv: int(kv[0])):
            lines.append(
                f"| {q_str} | {m['compressed_fid']:.4f}→"
                f"{m['restored_fid']:.4f} |"
            )
        lines.append("")
    return lines


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("root", type=Path, help="directory containing <codec>_*/metrics_summary*.json")
    ap.add_argument("--out", type=Path, default=None)
    args = ap.parse_args(argv)

    sections = [
        "# Quality parity — ours vs the reference's published tables",
        "",
        "Ours: full-width UNet (reference architecture scale), synthetic 64×64 training set,",
        "held-out synthetic eval (seed 99). Reference: ImageNet-val 64×64, 100 epochs",
        "(`/root/reference/README.md:15-21`). **Dataset gap**: no ImageNet data exists in",
        "this environment, so reference deltas are listed for scale, not strict parity —",
        "same metric definitions, same quality grids, different image distribution.",
        "† LPIPS columns: the reference uses AlexNet LPIPS; ours is the calibrated proxy",
        "unless canonical weights are present (`scripts/import_metric_weights.py`), so",
        "compare signs/trends, not magnitudes.",
        "‡ FID columns: positive = restoration moved the set closer to the originals.",
        "Ours is Fréchet distance over the configured feature extractor (proxy features",
        "unless InceptionV3 weights are imported; `fid_kind` in each summary says which)",
        "— like LPIPS, compare signs/trends vs the reference, not magnitudes.",
        "",
    ]
    found = 0
    for sub in sorted(args.root.iterdir()):
        if not sub.is_dir():
            continue
        for js in sorted(sub.glob("metrics_summary*.json")):
            summary = load_summary(js)
            codec = summary.get("codec", "?").lower()
            sections += table_for(codec, summary, sub.name)
            found += 1
    if not found:
        raise SystemExit(f"no metrics_summary*.json found under {args.root}")
    text = "\n".join(sections) + "\n"
    if args.out:
        args.out.write_text(text)
        print(f"wrote {args.out} ({found} summaries)")
    else:
        print(text)


if __name__ == "__main__":
    main()
