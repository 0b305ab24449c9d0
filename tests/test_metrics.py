"""Metric layer tests: PSNR/SSIM/L2 formulas, LPIPS proxy ordering, Fréchet
distance machinery, evaluation harness end-to-end."""

import json

import jax.numpy as jnp
import numpy as np
import pytest

from ddpm_image_restoration_tpu.evaluation.fid import (
    RandomConvFeatureExtractor,
    compute_statistics,
    fid_between,
    frechet_distance,
)
from ddpm_image_restoration_tpu.evaluation.lpips import LPIPS
from ddpm_image_restoration_tpu.evaluation.metrics import normalized_l2, psnr, ssim_metric


def test_psnr_known_value():
    a = jnp.zeros((1, 16, 16, 3))
    b = jnp.full((1, 16, 16, 3), 0.2)  # [-1,1] -> 0.1 difference in [0,1]
    # mse = 0.01 -> psnr = 20
    assert float(psnr(a, b)) == pytest.approx(20.0, abs=0.01)


def test_psnr_identical_capped_by_eps():
    a = jnp.zeros((1, 16, 16, 3))
    assert float(psnr(a, a)) == pytest.approx(80.0, abs=0.1)  # -10*log10(1e-8)


def test_l2_formula(rng):
    a = jnp.asarray(rng.normal(0, 0.3, (2, 8, 8, 3)).astype("f"))
    b = jnp.zeros_like(a)
    v = float(normalized_l2(a, b))
    a01 = np.clip(np.asarray(a) * 0.5 + 0.5, 0, 1)
    b01 = np.full_like(a01, 0.5)
    expected = np.linalg.norm((a01 - b01).ravel()) / np.sqrt(a01.size)
    assert v == pytest.approx(expected, rel=1e-5)


def test_lpips_ordering(rng, small_images):
    lp = LPIPS()
    x = jnp.asarray(small_images)
    near = jnp.clip(x + 0.02 * rng.standard_normal(x.shape).astype("f"), -1, 1)
    far = jnp.clip(x + 0.5 * rng.standard_normal(x.shape).astype("f"), -1, 1)
    d_self = np.asarray(lp(x, x))
    d_near = np.asarray(lp(x, near))
    d_far = np.asarray(lp(x, far))
    assert d_self.shape == (4,)
    assert np.all(d_self < 1e-6)
    assert np.all(d_near < d_far)


def test_frechet_distance_identity_and_shift(rng):
    f = rng.normal(size=(200, 8))
    mu, sig = compute_statistics(f)
    assert frechet_distance(mu, sig, mu, sig) == pytest.approx(0.0, abs=1e-6)
    mu2, sig2 = compute_statistics(f + 3.0)
    d = frechet_distance(mu, sig, mu2, sig2)
    assert d == pytest.approx(8 * 9.0, rel=0.05)  # |shift|^2 = D * 3^2


def test_fid_between_monotone_in_noise(rng):
    base = np.clip(
        0.5 + 0.2 * rng.normal(size=(48, 16, 16, 3)), 0, 1
    ).astype(np.float32)
    ex = RandomConvFeatureExtractor(dim=32)
    d_small = fid_between(np.clip(base + 0.05 * rng.normal(size=base.shape), 0, 1).astype("f"), base, ex)
    d_large = fid_between(np.clip(base + 0.4 * rng.normal(size=base.shape), 0, 1).astype("f"), base, ex)
    assert 0 < d_small < d_large


@pytest.mark.slow
def test_eval_harness_end_to_end(tmp_path):
    import jax

    from ddpm_image_restoration_tpu.config import EvalConfig
    from ddpm_image_restoration_tpu.data import SyntheticImageDataset
    from ddpm_image_restoration_tpu.evaluation.harness import (
        evaluate_restoration,
        format_comparative_table,
    )
    from ddpm_image_restoration_tpu.models import build_model
    from tests._tiny import MINI

    cfg = EvalConfig(
        codec="jpeg",
        model=MINI,
        steps=10,
        output_dir=str(tmp_path),
        qualities_override=(10, 50),
    )
    model = build_model("jpeg", MINI)
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)), jnp.zeros(1)
    )
    # 10 images at batch 4 => a final PARTIAL batch of 2, exercising the
    # pad-to-batch-size path (a second batch shape would mean a second
    # multi-minute XLA compile on the real chip)
    ds = SyntheticImageDataset(10, 16)
    images = np.stack([ds[i] for i in range(10)])
    summary = evaluate_restoration(
        cfg, model, params["params"], images, batch_size=4, verbose=False
    )
    assert set(summary["results"].keys()) == {"10", "50"}
    r10 = summary["results"]["10"]
    for k in ["compressed_psnr", "restored_psnr", "compressed_ssim", "restored_ssim",
              "compressed_lpips", "restored_lpips", "compressed_l2", "restored_l2",
              "compressed_fid", "restored_fid", "images_per_sec",
              "n", "delta_psnr", "delta_psnr_ci95", "delta_ssim_ci95"]:
        assert k in r10, k
    assert r10["n"] == 10  # padded lanes must NOT leak into the metrics
    assert np.isfinite(r10["delta_psnr_ci95"]) and r10["delta_psnr_ci95"] > 0
    assert abs(r10["delta_psnr"]
               - (r10["restored_psnr"] - r10["compressed_psnr"])) < 1e-6
    # compressed metrics reflect real degradation ordering
    assert summary["results"]["10"]["compressed_psnr"] < summary["results"]["50"]["compressed_psnr"]
    assert (tmp_path / "metrics_summary.json").exists()
    assert (tmp_path / "examples_q10.png").exists()
    assert (tmp_path / "metric_panels.png").exists()
    table = format_comparative_table(summary)
    assert "JPEG" in table and "PSNR" in table
    assert "n=10" in table and "±" in table  # n + paired CI on the PSNR delta
    json.loads((tmp_path / "metrics_summary.json").read_text())


@pytest.mark.slow
def test_eval_harness_solver_auto_uses_policy(tmp_path):
    """`solver='auto'` must apply the production policy per quality —
    including the round-3 deterministic eta — and record the effective
    solver config in the summary (the round-2 failure mode was a bench row
    and quality tables describing two different solver configs)."""
    import jax

    from ddpm_image_restoration_tpu.config import EvalConfig
    from ddpm_image_restoration_tpu.data import SyntheticImageDataset
    from ddpm_image_restoration_tpu.diffusion.policy import (
        production_solver_config,
    )
    from ddpm_image_restoration_tpu.evaluation.harness import (
        evaluate_restoration,
    )
    from ddpm_image_restoration_tpu.models import build_model
    from tests._tiny import MINI

    cfg = EvalConfig(
        codec="webp",
        model=MINI,
        steps=100,
        output_dir=str(tmp_path),
        qualities_override=(30, 90),
        compute_fid=False,
    )
    model = build_model("webp", MINI)
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)), jnp.zeros(1)
    )
    ds = SyntheticImageDataset(4, 16)
    images = np.stack([ds[i] for i in range(4)])
    summary = evaluate_restoration(
        cfg, model, params["params"], images, batch_size=4, verbose=False,
        solver="auto",
    )
    for q in (30, 90):
        row = summary["results"][str(q)]
        pc = production_solver_config(q)
        assert row["solver_encoder_reuse"] == pc["encoder_reuse"], q
        assert row["solver_eta"] == pc["eta"], q
        # budgeted stride: never more than max_evals evaluations
        n_evals = -(-row["solver_init_t"] // row["solver_stride"])
        assert n_evals <= pc["max_evals"], (q, n_evals)
    # init_t (and with it the derived stride) must shrink with quality
    assert (summary["results"]["30"]["solver_init_t"]
            > summary["results"]["90"]["solver_init_t"])


def test_lpips_alex_matches_torch(rng, tmp_path):
    """Canonical-LPIPS path: random AlexNet-shaped torch checkpoints pass
    through scripts/import_metric_weights.py and the jnp forward must match
    an independent torch recomputation of the LPIPS formula (topology,
    padding, floor-mode pooling, scaling layer, calibration)."""
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    import scripts.import_metric_weights as imw

    shapes = [(64, 3, 11, 11), (192, 64, 5, 5), (384, 192, 3, 3),
              (256, 384, 3, 3), (256, 256, 3, 3)]
    keys = imw._ALEX_CONV_KEYS
    g = torch.Generator().manual_seed(0)
    sd = {}
    for k, s in zip(keys, shapes):
        sd[f"{k}.weight"] = torch.randn(s, generator=g) * 0.05
        sd[f"{k}.bias"] = torch.randn(s[0], generator=g) * 0.01
    lin_sd = {f"lin{i}.model.1.weight":
              torch.rand((1, s[0], 1, 1), generator=g) for i, s in enumerate(shapes)}
    alex_pth, lin_pth = tmp_path / "alex.pth", tmp_path / "lin.pth"
    torch.save(sd, alex_pth)
    torch.save(lin_sd, lin_pth)
    npz = imw.convert_lpips(str(alex_pth), str(lin_pth), str(tmp_path / "w.npz"))

    lp = LPIPS(weights_path=npz)
    assert lp.name == "lpips_alex"
    a = rng.uniform(-1, 1, (2, 64, 64, 3)).astype("f")
    b = np.clip(a + 0.1 * rng.standard_normal(a.shape).astype("f"), -1, 1)
    got = np.asarray(lp(a, b))

    # independent torch recomputation
    from ddpm_image_restoration_tpu.evaluation.lpips import _SCALE, _SHIFT

    def feats(x):
        ws = [sd[f"{k}.weight"] for k in keys]
        bs = [sd[f"{k}.bias"] for k in keys]
        f0 = F.relu(F.conv2d(x, ws[0], bs[0], stride=4, padding=2))
        h = F.max_pool2d(f0, 3, 2)
        f1 = F.relu(F.conv2d(h, ws[1], bs[1], padding=2))
        h = F.max_pool2d(f1, 3, 2)
        f2 = F.relu(F.conv2d(h, ws[2], bs[2], padding=1))
        f3 = F.relu(F.conv2d(f2, ws[3], bs[3], padding=1))
        f4 = F.relu(F.conv2d(f3, ws[4], bs[4], padding=1))
        return [f0, f1, f2, f3, f4]

    def norm(f):
        return f / (f.pow(2).sum(1, keepdim=True).sqrt() + 1e-10)

    ta = (torch.from_numpy(a.transpose(0, 3, 1, 2))
          - torch.tensor(_SHIFT).view(1, 3, 1, 1)) / torch.tensor(_SCALE).view(1, 3, 1, 1)
    tb = (torch.from_numpy(b.transpose(0, 3, 1, 2))
          - torch.tensor(_SHIFT).view(1, 3, 1, 1)) / torch.tensor(_SCALE).view(1, 3, 1, 1)
    want = torch.zeros(2)
    for i, (fa, fb) in enumerate(zip(feats(ta), feats(tb))):
        d = (norm(fa) - norm(fb)).pow(2) * lin_sd[f"lin{i}.model.1.weight"]
        want = want + d.sum(1).mean((1, 2))
    np.testing.assert_allclose(got, want.numpy(), rtol=1e-4, atol=1e-6)


def test_import_metric_weights_probe(capsys):
    import scripts.import_metric_weights as imw

    assert imw.main([]) == 0
    out = capsys.readouterr().out
    assert "LPIPS npz" in out and "InceptionV3" in out


def test_lpips_canonical_import_path(tmp_path, monkeypatch):
    """End-to-end canonical-LPIPS plumbing WITHOUT the real pretrained
    weights (unobtainable here: zero egress and no torchvision): synthesize
    a torchvision-layout AlexNet state_dict + lpips linear weights, convert
    with scripts/import_metric_weights.convert_lpips, and check LPIPS picks
    the npz up via $DDPM_IR_LPIPS_WEIGHTS and reports name='lpips_alex'.
    Only the WEIGHTS are fake — every line of the canonical code path runs."""
    import sys

    import numpy as np
    import torch

    sys.path.insert(0, "scripts")
    try:
        from import_metric_weights import _ALEX_CONV_KEYS, convert_lpips
    finally:
        sys.path.pop(0)

    rng = np.random.default_rng(0)
    # torchvision AlexNet .features conv shapes (OIHW)
    shapes = [(64, 3, 11, 11), (192, 64, 5, 5), (384, 192, 3, 3),
              (256, 384, 3, 3), (256, 256, 3, 3)]
    sd = {}
    for k, s in zip(_ALEX_CONV_KEYS, shapes):
        sd[f"{k}.weight"] = torch.tensor(
            rng.normal(0, 0.05, s).astype(np.float32))
        sd[f"{k}.bias"] = torch.zeros(s[0])
    lin = {f"lin{i}.model.1.weight":
           torch.tensor(np.abs(rng.normal(0, 1, (1, s[0], 1, 1))
                               ).astype(np.float32))
           for i, s in enumerate(shapes)}
    alex_pth, lin_pth = tmp_path / "alex.pth", tmp_path / "lin.pth"
    torch.save(sd, alex_pth)
    torch.save(lin, lin_pth)

    out = convert_lpips(str(alex_pth), str(lin_pth),
                        out=str(tmp_path / "lpips_alex.npz"))

    from ddpm_image_restoration_tpu.evaluation.lpips import LPIPS

    monkeypatch.setenv("DDPM_IR_LPIPS_WEIGHTS", out)
    fn = LPIPS()
    assert fn.name == "lpips_alex"
    a = rng.uniform(-1, 1, (2, 32, 32, 3)).astype(np.float32)
    d_same = np.asarray(fn(a, a))
    d_diff = np.asarray(fn(a, np.clip(a + 0.5, -1, 1)))
    assert np.all(d_same < 1e-5)
    assert np.all(d_diff > d_same + 1e-4)
