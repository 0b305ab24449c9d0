"""Reporting-script tests: parity table generation (proxy-FID separation,
CI columns) and the stride-1 fill helper."""

import json

import numpy as np
import pytest

import scripts.fill_parity_s1 as fps
import scripts.parity_table as pt


def _summary(codec="webp", fid_kind=None, ci=True):
    row = {
        "compressed_psnr": 30.0, "restored_psnr": 31.0,
        "compressed_ssim": 0.90, "restored_ssim": 0.95,
        "compressed_lpips": 0.02, "restored_lpips": 0.01,
        "compressed_l2": 0.05, "restored_l2": 0.04,
    }
    if ci:
        row["delta_psnr_ci95"] = 0.12
    if fid_kind:
        row.update(compressed_fid=0.33, restored_fid=0.07, fid_kind=fid_kind)
    return {
        "codec": codec, "num_images": 64, "steps": 100, "solver": "auto",
        "consistency_mode": "surrogate", "results": {"30": dict(row)},
    }


def test_parity_table_proxy_fid_separated():
    """random_conv Fréchet numbers must NOT appear beside the reference's
    published Inception FID column (VERDICT r3 weak #7)."""
    lines = pt.table_for("webp", _summary(fid_kind="random_conv"), "run")
    text = "\n".join(lines)
    assert "ref ΔFID" not in text
    assert "Proxy Fréchet trend" in text and "random_conv" in text
    assert "0.3300→0.0700" in text


def test_parity_table_canonical_fid_inline():
    lines = pt.table_for("webp", _summary(fid_kind="inception_v3"), "run")
    text = "\n".join(lines)
    assert "ref ΔFID" in text
    assert "Proxy Fréchet trend" not in text


def test_parity_table_ci_column():
    text = "\n".join(pt.table_for("webp", _summary(), "run"))
    assert "± 0.12" in text
    # CI-less summaries (older runs) still render
    text2 = "\n".join(pt.table_for("webp", _summary(ci=False), "run"))
    assert "±" not in text2.replace("Δ ± 95% CI", "")


def test_fill_parity_s1(tmp_path, capsys):
    """Pairs present -> table rows + per-codec verdicts; missing -> rc 1."""
    for codec, (sg, hl) in {"jpeg": (31.00, 31.02), "webp": (30.0, 30.5),
                            "avif": (33.0, 32.0)}.items():
        for kind, v in (("sg", sg), ("hl", hl)):
            d = tmp_path / f"{codec}_{kind}_s1"
            d.mkdir()
            s = _summary(codec)
            s["results"]["30"]["restored_psnr"] = v
            (d / "metrics_summary.json").write_text(json.dumps(s))
    rc = fps.main([str(tmp_path)])
    out = capsys.readouterr().out
    assert rc == 0
    assert "jpeg: worst |Δ| = 0.020 dB -> pass" in out
    assert "webp: worst |Δ| = 0.500 dB -> FAIL" in out
    assert "| avif | 30 | 33.00 | 32.00 | -1.000 | NO |" in out

    rc = fps.main([str(tmp_path / "empty")])
    assert rc == 1
