#!/usr/bin/env python
"""Measure the restoration rewrite's statistics on REAL patches (round 5).

Motivation: the residual trust region at beta=2.0 changed NOTHING on the
real split (webp_real_pa_r5 == webp_real_auto_r5) — the q90 damage is a
low-amplitude rewrite BELOW the 2*D(q) radius. Before tuning beta, this
probe characterizes the rewrite r = restored - y per quality:

  * local 8x8 RMS of r, quantiles, vs the calibrated damage D(q);
  * corr(r, highpass(y)) per window — the grain-smoothing signature is a
    strongly NEGATIVE correlation (the model subtracting the image's own
    high-frequency content), while legitimate deblocking adds HF that is
    uncorrelated-to-positively-correlated with highpass(y);
  * per-image dPSNR with and without candidate gates, so a gate can be
    picked from measurement instead of sweeping evals on the chip.

CPU backend, release npz, production solver (budget 14). n=16 real eval
patches, q in {10, 50, 90}: ~10 min under contention.
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.abspath(__file__)), ".."))


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=16)
    ap.add_argument("--npz", default="artifacts_release/webp_real_r5.npz")
    ap.add_argument("--qualities", type=int, nargs="+", default=[10, 50, 90])
    args = ap.parse_args(argv)

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/ddpm_ir_jax_cache")
    import jax.numpy as jnp
    import numpy as np

    from ddpm_image_restoration_tpu.codecs.pil_codecs import compress_batch
    from ddpm_image_restoration_tpu.codecs.quality import (
        init_timestep_for_quality,
    )
    from ddpm_image_restoration_tpu.config import ModelConfig, get_preset
    from ddpm_image_restoration_tpu.data.real_patches import RealPatchDataset
    from ddpm_image_restoration_tpu.diffusion.ddrm import (
        _DAMAGE_Q,
        _DAMAGE_RMS,
        DDRMSampler,
    )
    from ddpm_image_restoration_tpu.diffusion.policy import (
        production_solver_config,
    )
    from ddpm_image_restoration_tpu.models.unet import build_model
    from ddpm_image_restoration_tpu.train.checkpoint import load_release_params
    from ddpm_image_restoration_tpu.train.distill import student_stride

    def psnr_rows(a, b):
        mse = (((np.asarray(a, np.float64) - np.asarray(b, np.float64)) / 2)
               ** 2).mean(axis=(1, 2, 3))
        return -10 * np.log10(mse + 1e-8)

    rp = RealPatchDataset(split="eval")
    x0 = np.stack([rp[i] for i in range(min(args.n, len(rp)))])
    n = len(x0)
    params = load_release_params(args.npz)
    mcfg = ModelConfig(image_size=64, attn_max_resolution=32,
                       compute_dtype="float32")
    model = build_model("webp", mcfg)
    sampler = DDRMSampler(model, get_preset("webp"), "surrogate")

    W = 8
    for q in args.qualities:
        y = compress_batch(x0, "webp", np.full(n, q))
        pc = production_solver_config(q, "webp")
        init_t = init_timestep_for_quality(q, 100, get_preset("webp"))
        stride = student_stride(init_t, pc["max_evals"])
        t0 = time.time()
        restored = np.asarray(sampler.sample(
            {"params": params}, jnp.asarray(y), float(q), init_t,
            key=jax.random.PRNGKey(0), stride=stride,
            encoder_reuse=pc["encoder_reuse"], eta=pc["eta"],
        ))
        r = restored - y
        d = float(np.interp(q, _DAMAGE_Q, _DAMAGE_RMS["webp"]))
        # local window stats
        hw = 64 // W
        rw = r.reshape(n, hw, W, hw, W, 3)
        local_rms = np.sqrt((rw ** 2).mean(axis=(2, 4, 5)))        # [n,hw,hw]
        # highpass of y: y - 3x3 box blur (cheap separable)
        from scipy.ndimage import uniform_filter

        hp = y - uniform_filter(y, size=(1, 3, 3, 1))
        hpw = hp.reshape(n, hw, W, hw, W, 3)
        rc = (rw * hpw).mean(axis=(2, 4, 5))
        denom = np.sqrt((rw ** 2).mean(axis=(2, 4, 5))
                        * (hpw ** 2).mean(axis=(2, 4, 5))) + 1e-12
        corr = rc / denom                                           # [n,hw,hw]
        qs = np.percentile(local_rms, [50, 90, 99])
        print(f"q={q:3d} ({time.time()-t0:.0f}s) D={d:.4f} "
              f"local_rms p50/p90/p99 = {qs[0]:.4f}/{qs[1]:.4f}/{qs[2]:.4f} "
              f"(ratio to 2D: {qs[2]/(2*d):.2f}) "
              f"corr(r,hp(y)) mean {corr.mean():+.3f} p10 "
              f"{np.percentile(corr,10):+.3f}")
        base = psnr_rows(restored, x0) - psnr_rows(y, x0)
        print(f"      dPSNR no gate: {base.mean():+.3f}")
        # candidate gates evaluated offline on the SAME restores
        for beta in (1.0, 0.5, 0.25):
            w = np.minimum(1.0, beta * d / (local_rms.mean(axis=-1)
                                            if local_rms.ndim == 4 else
                                            local_rms) )
            w_full = np.repeat(np.repeat(w, W, axis=1), W, axis=2)[..., None]
            out = y + w_full * r
            g = psnr_rows(out, x0) - psnr_rows(y, x0)
            print(f"      dPSNR trust beta={beta}: {g.mean():+.3f}")
        for tau in (0.0, -0.2, -0.4):
            # suppress windows whose rewrite anti-correlates with the
            # image's own high-frequency content (grain smoothing)
            w = np.where(corr < tau, 0.0, 1.0)
            w_full = np.repeat(np.repeat(w, W, axis=1), W, axis=2)[..., None]
            out = y + w_full * r
            g = psnr_rows(out, x0) - psnr_rows(y, x0)
            print(f"      dPSNR corr-gate tau={tau}: {g.mean():+.3f}")
        # combined: corr gate only where local_rms also small (smoothing is
        # low-amplitude); keep full restoration where rewrite is structured
        w = np.where((corr < -0.2) & (local_rms < 2 * d), 0.0, 1.0)
        w_full = np.repeat(np.repeat(w, W, axis=1), W, axis=2)[..., None]
        out = y + w_full * r
        g = psnr_rows(out, x0) - psnr_rows(y, x0)
        print(f"      dPSNR combined gate: {g.mean():+.3f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
