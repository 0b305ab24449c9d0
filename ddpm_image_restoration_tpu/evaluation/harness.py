"""Evaluation harness: the framework's `test_*_restoration` equivalent.

Mirrors test_webp_restoration / test_avif_restoration / evaluate_jpeg_restoration
(webp_inference.py:604-952, avif_inference.py:462-810, `svd imagenet.ipynb`):
for every quality level, compress -> restore -> per-image PSNR/SSIM/LPIPS/L2
for both compressed and restored, FID compressed-vs-original and
restored-vs-original, a comparative table, 6-panel metric plots, example
restoration grids, and a metrics_summary.json.

TPU-native: restoration runs the jitted lax.scan sampler over batches (the
reference loops per image with batch 1); metrics are computed on device in
batches; only FID statistics and PNG dumps live on the host.
"""

from __future__ import annotations

import json
import os
import time
from collections import defaultdict
from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np

from ddpm_image_restoration_tpu.config import EvalConfig
from ddpm_image_restoration_tpu.codecs.pil_codecs import compress_batch
from ddpm_image_restoration_tpu.codecs.quality import init_timestep_for_quality
from ddpm_image_restoration_tpu.diffusion.ddrm import DDRMSampler
from ddpm_image_restoration_tpu.diffusion.ensemble import sample_ensemble
from ddpm_image_restoration_tpu.diffusion.losses import ssim
from ddpm_image_restoration_tpu.evaluation.fid import (
    compute_statistics,
    default_feature_extractor,
    frechet_distance,
)
from ddpm_image_restoration_tpu.evaluation.lpips import LPIPS
from ddpm_image_restoration_tpu.utils.viz import save_restoration_grid


def _to01(x):
    return np.clip(np.asarray(x, np.float32) * 0.5 + 0.5, 0, 1)


@jax.jit
def _per_image_metrics(pred, target):
    """Per-image PSNR / SSIM / normalized-L2 on [0,1]-rescaled pairs."""
    p = jnp.clip(pred.astype(jnp.float32) * 0.5 + 0.5, 0, 1)
    t = jnp.clip(target.astype(jnp.float32) * 0.5 + 0.5, 0, 1)
    mse = jnp.mean((p - t) ** 2, axis=(1, 2, 3))
    psnr = -10.0 * jnp.log10(mse + 1e-8)
    ssim_v = ssim(p, t, size_average=False)
    l2 = jnp.sqrt(jnp.sum((p - t) ** 2, axis=(1, 2, 3))) / np.sqrt(
        np.prod(pred.shape[1:])
    )
    return psnr, ssim_v, l2


def evaluate_restoration(
    cfg: EvalConfig,
    model,
    params,
    images: np.ndarray,
    batch_size: int = 8,
    save_examples: int = 4,
    verbose: bool = True,
    prediction: str = "direct",
    stride: int = 1,
    protect=None,
    protect_adaptive=None,
    encoder_reuse: int = 1,
    decoder_reuse_depth: int = 0,
    ensemble: int = 1,
    max_evals: int = 0,
    final_exact=None,
    eta=None,
    eta_b=None,
    init_t_override: int = 0,
    phase_threshold=None,
    solver: str = "manual",
    traced: bool = False,
) -> Dict:
    """Run the full evaluation over `images` [N,H,W,3] in [-1,1].

    Returns the metrics-summary dict (also written to metrics_summary.json).

    Ablation overrides (all default to the preset / quality-derived values):
    `eta`/`eta_b` replace the sampler noise/consistency weights
    (webp_training.py:457-463), `init_t_override` > 0 pins the solver start
    step for EVERY quality (normally init_t = clamp((100-q)/100*steps, ...)),
    and `phase_threshold` replaces the preset's phase-consistency quality
    gate (avif.py:518-520). Used by the controlled AVIF q1/q90 regression
    experiments (results/r3_ablation) — each override is recorded in the
    summary so no two runs can be confused.

    `solver='auto'` evaluates each quality with the production policy
    (diffusion/policy.py production_solver_config) instead of the fixed
    stride/encoder_reuse/max_evals arguments — the config a `--quality auto`
    serving deployment would actually run.

    `traced=True` (requires a budgeted solver: max_evals or solver='auto')
    runs the quality-traced fixed-budget program (ddrm.py _build_budget):
    every quality in the grid reuses ONE compiled executable instead of
    compiling one program per quality — the difference between 1 and
    len(eval_qualities) fresh XLA compiles per eval run. Used-step outputs
    match the untraced budgeted path to float-fusion tolerance.
    """
    preset = cfg.preset
    if phase_threshold is not None:
        import dataclasses

        preset = dataclasses.replace(
            preset, phase_quality_threshold=int(phase_threshold)
        )
    os.makedirs(cfg.output_dir, exist_ok=True)
    if cfg.max_images:
        images = images[: cfg.max_images]  # AVIF caps at 500 (avif_inference.py:509-512)

    # unified ('all') checkpoints: condition the model on the TARGET codec
    # while the sampler uses that codec's own preset/consistency
    codec_id = None
    if getattr(model.cfg, "codec_conditioning", False):
        from ddpm_image_restoration_tpu.config import codec_index

        codec_id = codec_index(preset.name)
    sampler = DDRMSampler(model, preset, cfg.consistency_mode,
                          prediction=prediction, codec_id=codec_id)
    lpips_fn = LPIPS()
    extractor = default_feature_extractor() if cfg.compute_fid else None
    wrapped = {"params": params} if "params" not in params else params

    # FID is computed from STREAMED per-batch features, never from the full
    # image sets in RAM (the reference's full test split at 128^2+ would not
    # fit): extract the originals' statistics once, then per quality only
    # [N, D] feature blocks accumulate.
    orig_stats = None
    if cfg.compute_fid:
        orig_feats = np.concatenate([
            extractor(_to01(images[i : i + batch_size]))
            for i in range(0, len(images), batch_size)
        ])
        orig_stats = compute_statistics(orig_feats)

    results: Dict[str, Dict[str, float]] = {}
    cfg_stride = int(stride)  # `stride` is re-derived per quality under max_evals
    key = jax.random.PRNGKey(0)

    for quality in cfg.eval_qualities:
        acc: Dict[str, List[float]] = defaultdict(list)
        init_t = init_t_override or init_timestep_for_quality(
            quality, cfg.steps, preset
        )
        q_max_evals, q_enc_reuse, q_eta = max_evals, encoder_reuse, eta
        q_protect = protect
        if solver == "auto":
            from ddpm_image_restoration_tpu.diffusion.policy import (
                production_solver_config,
            )

            pc = production_solver_config(quality, preset.name)
            q_max_evals = pc["max_evals"]
            q_enc_reuse = pc["encoder_reuse"]
            if eta is None:  # an explicit --eta still overrides the policy
                q_eta = pc.get("eta")
            if protect is None:  # explicit --protect overrides the policy
                q_protect = pc.get("protect")
        if q_max_evals:  # budgeted solver: stride derived per quality
            from ddpm_image_restoration_tpu.train.distill import student_stride

            stride = student_stride(init_t, q_max_evals)
        q_traced_budget = 0
        if traced:
            if not q_max_evals:
                raise ValueError(
                    "traced=True needs a fixed eval budget: pass max_evals "
                    "or solver='auto'"
                )
            q_traced_budget = int(q_max_evals)
        comp_all, rest_all = [], []
        t_start = time.time()
        n_restored = 0

        for i in range(0, len(images), batch_size):
            x0 = images[i : i + batch_size]
            y = compress_batch(x0, preset.name, quality)
            # Pad a final partial batch up to batch_size (repeating the last
            # image) so the sampler sees ONE batch shape: a second shape
            # would be a second full XLA compile — ~25 min through the
            # tunnel for the traced program, for 6 leftover images.
            n_valid = len(x0)
            if n_valid < batch_size:
                pad = np.repeat(y[-1:], batch_size - n_valid, axis=0)
                y_in = np.concatenate([y, pad])
            else:
                y_in = y
            key, sub = jax.random.split(key)
            restored = np.asarray(
                sample_ensemble(sampler, wrapped, jnp.asarray(y_in), quality,
                                init_t,
                                n_transforms=ensemble, key=sub,
                                stride=stride, protect=q_protect,
                                protect_adaptive=protect_adaptive,
                                encoder_reuse=q_enc_reuse,
                                decoder_reuse_depth=decoder_reuse_depth,
                                final_exact=final_exact,
                                traced_budget=q_traced_budget,
                                eta=q_eta, eta_b=eta_b)
            )[:n_valid]
            n_restored += n_valid

            for tag, img in (("compressed", y), ("restored", restored)):
                p, s, l2 = _per_image_metrics(jnp.asarray(img), jnp.asarray(x0))
                acc[f"{tag}_psnr"] += list(np.asarray(p))
                acc[f"{tag}_ssim"] += list(np.asarray(s))
                acc[f"{tag}_l2"] += list(np.asarray(l2))
                acc[f"{tag}_lpips"] += list(np.asarray(lpips_fn(img, x0)))

            if cfg.compute_fid:
                comp_all.append(extractor(_to01(y)))
                rest_all.append(extractor(_to01(restored)))

            if i == 0 and save_examples:
                save_restoration_grid(
                    os.path.join(cfg.output_dir, f"examples_q{quality}.png"),
                    x0[:save_examples],
                    y[:save_examples],
                    restored[:save_examples],
                    quality=quality,
                )

        row = {k: float(np.mean(v)) for k, v in acc.items()}
        # 95% CIs on the per-image restoration DELTAS (paired, so the
        # image-difficulty variance cancels): the honesty bar for any
        # "beats the reference by X dB" claim (VERDICT round 3 #8).
        row["n"] = len(acc["restored_psnr"])
        for m in ("psnr", "ssim"):
            d = np.asarray(acc[f"restored_{m}"]) - np.asarray(acc[f"compressed_{m}"])
            row[f"delta_{m}"] = float(d.mean())
            row[f"delta_{m}_ci95"] = (
                float(1.96 * d.std(ddof=1) / np.sqrt(len(d)))
                if len(d) > 1 else float("nan")
            )
        if cfg.compute_fid:
            row["compressed_fid"] = frechet_distance(
                *compute_statistics(np.concatenate(comp_all)), *orig_stats
            )
            row["restored_fid"] = frechet_distance(
                *compute_statistics(np.concatenate(rest_all)), *orig_stats
            )
            row["fid_kind"] = extractor.name
        row["images_per_sec"] = n_restored / (time.time() - t_start)
        # per-quality solver config (varies under solver='auto' / max_evals)
        row["solver_stride"] = int(stride)
        row["solver_encoder_reuse"] = int(q_enc_reuse)
        row["solver_init_t"] = int(init_t)
        row["solver_eta"] = None if q_eta is None else float(q_eta)
        row["solver_protect"] = (None if q_protect is None
                                 else [float(v) for v in q_protect])
        row["solver_protect_adaptive"] = (
            None if protect_adaptive is None
            else [list(map(float, k)) for k in protect_adaptive]
            if isinstance(protect_adaptive, tuple)
            else float(protect_adaptive))
        results[str(quality)] = row
        # Checkpoint the summary after EVERY quality (atomic rename): a
        # timed-out run then salvages its completed rows with n/CIs intact
        # instead of leaving only the streaming log lines (round-5 lesson:
        # jpeg n=256 lost 2 finished qualities to a queue timeout).
        _write_summary(cfg, preset, images, cfg_stride, max_evals,
                       encoder_reuse, solver, traced, final_exact, eta, eta_b,
                       init_t_override, phase_threshold, lpips_fn, results,
                       partial=True)
        if verbose:
            print(
                f"q={quality:3d}: PSNR {row['compressed_psnr']:.2f}->{row['restored_psnr']:.2f} "
                f"SSIM {row['compressed_ssim']:.4f}->{row['restored_ssim']:.4f} "
                f"({row['images_per_sec']:.2f} img/s)"
            )

    summary = _write_summary(cfg, preset, images, cfg_stride, max_evals,
                             encoder_reuse, solver, traced, final_exact, eta,
                             eta_b, init_t_override, phase_threshold, lpips_fn,
                             results, partial=False)
    if verbose:
        print(format_comparative_table(summary))
    plot_metric_panels(summary, os.path.join(cfg.output_dir, "metric_panels.png"))
    return summary


def _write_summary(cfg, preset, images, cfg_stride, max_evals, encoder_reuse,
                   solver, traced, final_exact, eta, eta_b, init_t_override,
                   phase_threshold, lpips_fn, results, partial):
    """Assemble and atomically write metrics_summary.json. `partial=True`
    marks an in-progress checkpoint (quality loop not finished) so table
    consumers can label salvage rows; the final write clears the flag."""
    summary = {
        "codec": preset.name,
        "num_images": int(len(images)),
        "steps": cfg.steps,
        # solver config, so downstream tables (scripts/parity_table.py) can
        # label runs without relying on directory naming conventions
        "stride": cfg_stride,
        "max_evals": int(max_evals),
        "encoder_reuse": int(encoder_reuse),
        "solver": solver,
        "traced": bool(traced),
        "consistency_mode": cfg.consistency_mode,
        "final_exact": bool(final_exact if final_exact is not None
                            else cfg.consistency_mode == "surrogate"),
        # ablation overrides (None/0 = preset defaults) — see docstring
        "eta": None if eta is None else float(eta),
        "eta_b": None if eta_b is None else float(eta_b),
        "init_t_override": int(init_t_override),
        "phase_threshold": (None if phase_threshold is None
                            else int(phase_threshold)),
        "lpips_kind": lpips_fn.name,
        "results": results,
    }
    if partial:
        summary["partial"] = True
    path = os.path.join(cfg.output_dir, "metrics_summary.json")
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(summary, f, indent=2)
    os.replace(tmp, path)
    return summary


def format_comparative_table(summary: Dict) -> str:
    """Comparative table like display_comparative_results
    (webp_inference.py:799-858): compressed -> restored with deltas, plus n
    and a paired 95% CI on the PSNR delta when available."""
    lines = [
        f"=== {summary['codec'].upper()} restoration "
        f"(n={summary['num_images']} images) ===",
        f"{'Q':>4} | {'PSNR (dB)':>30} | {'SSIM':>22} | {'LPIPS':>22} | {'L2':>20}",
    ]
    for q, r in summary["results"].items():
        def fmt(name, digits=4, ci=False):
            c, s = r[f"compressed_{name}"], r[f"restored_{name}"]
            cell = f"{c:.{digits}f}->{s:.{digits}f} ({s - c:+.{digits}f}"
            ci_v = r.get(f"delta_{name}_ci95")
            if ci and ci_v is not None and np.isfinite(ci_v):
                cell += f"±{ci_v:.{digits}f}"
            return cell + ")"

        lines.append(
            f"{q:>4} | {fmt('psnr', 2, ci=True):>30} | {fmt('ssim'):>22} | "
            f"{fmt('lpips'):>22} | {fmt('l2'):>20}"
        )
        if "restored_fid" in r:
            lines[-1] += (
                f" | FID({r.get('fid_kind','?')}) "
                f"{r['compressed_fid']:.2f}->{r['restored_fid']:.2f}"
            )
    return "\n".join(lines)


def plot_metric_panels(summary: Dict, path: str):
    """6-panel metric-vs-quality plots (webp_inference.py:860-952)."""
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except ImportError:
        return
    qs = [int(q) for q in summary["results"]]
    metrics = ["psnr", "ssim", "lpips", "l2"]
    if any("restored_fid" in r for r in summary["results"].values()):
        metrics.append("fid")
    fig, axes = plt.subplots(2, 3, figsize=(16, 9))
    for ax, m in zip(axes.flat, metrics):
        for tag, style in (("compressed", "o--"), ("restored", "s-")):
            key = f"{tag}_{m}"
            vals = [summary["results"][str(q)].get(key) for q in qs]
            if all(v is not None for v in vals):
                ax.plot(qs, vals, style, label=tag)
        ax.set_title(m.upper())
        ax.set_xlabel("quality")
        ax.grid(alpha=0.3)
        ax.legend()
    for ax in axes.flat[len(metrics):]:
        ax.axis("off")
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    fig.tight_layout()
    fig.savefig(path, dpi=110)
    plt.close(fig)
