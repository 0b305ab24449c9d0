#!/usr/bin/env python
"""Root-cause the AVIF q90 final_exact failure (VERDICT r4, next-round #6).

Measured fact: at AVIF q90 every accelerated config loses ~1.1 dB under
surrogate+final_exact even though final_exact recomputes the LAST
projection x' = x_hat - codec(x_hat) + y with the bit-exact host codec —
a mechanism designed to restore the reference's never-worse-than-y
property (reference gains +0.43 there, avif_inference.py q90 row).

Decomposition: restored - x0 = (x_hat - x0) - (codec(x_hat) - y). When
x_hat deviates from x0 by delta, the projection only cancels the part of
delta the codec DISCARDS; the part it keeps (low-frequency, in-gamut at
q90's fine quantization) passes straight into the output. So the q90 loss
should be ~= the energy of codec-retained model error. This probe
measures every term on the SAME eval protocol as results/r4/all_avif
(all_teacher npz, synthetic seed-99 images, production solver budget):

  psnr(y, x0)                 observation quality
  psnr(x_hat, x0)             model's clean estimate at the last step
  psnr(codec(x_hat), y)       how far the final anchor is off
  psnr(x', x0)                the final_exact output (= restored)
  psnr(y + [x_hat-codec(x_hat)], x0) decomposition cross-check (same as x')
  retained error: psnr(x0 + (codec(x_hat) - y) - (x_hat - x0) ... ) via
  direct MSE split of restored-x0 into codec-discarded vs codec-retained
  model error.

Runs on the CPU backend (init_t=15 at q90 -> ~6 min at batch 16) so the
chip stays free. Usage: python scripts/probe_avif_q90.py [--quality 90]
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
    ap.add_argument("--quality", type=int, default=90)
    ap.add_argument("--n", type=int, default=16)
    ap.add_argument("--npz", default="artifacts_release/all_teacher_r3.npz")
    ap.add_argument("--steps", type=int, default=100)
    ap.add_argument("--prediction", default="direct",
                    choices=["direct", "residual"],
                    help="sampler interpretation of the model output "
                         "(quirk #7: reference uses 'direct' even though "
                         "training makes the model a residual predictor)")
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
    from ddpm_image_restoration_tpu.config import (
        ModelConfig,
        codec_index,
        get_preset,
    )
    from ddpm_image_restoration_tpu.data.dataset import SyntheticImageDataset
    from ddpm_image_restoration_tpu.diffusion.ddrm import DDRMSampler
    from ddpm_image_restoration_tpu.diffusion.policy import (
        production_solver_config,
    )
    from ddpm_image_restoration_tpu.models.unet import build_model
    from ddpm_image_restoration_tpu.train.checkpoint import load_release_params
    from ddpm_image_restoration_tpu.train.distill import student_stride

    def psnr(a, b):
        a01 = (np.asarray(a, np.float64) + 1) / 2
        b01 = (np.asarray(b, np.float64) + 1) / 2
        mse = ((a01 - b01) ** 2).mean(axis=(1, 2, 3))
        return -10 * np.log10(mse + 1e-8)

    q = args.quality
    preset = get_preset("avif")
    ds = SyntheticImageDataset(args.n, 64, seed=99, kind="waves")
    x0 = np.stack([ds[i] for i in range(args.n)])
    y = compress_batch(x0, "avif", np.full(args.n, q))

    params = load_release_params(args.npz)
    mcfg = ModelConfig(image_size=64, attn_max_resolution=32,
                       compute_dtype="float32", codec_conditioning=True)
    model = build_model("all", mcfg)
    sampler = DDRMSampler(model, preset, "surrogate",
                          prediction=args.prediction,
                          codec_id=codec_index("avif"))

    pc = production_solver_config(q, "avif")
    init_t = init_timestep_for_quality(q, args.steps, preset)
    stride = student_stride(init_t, pc["max_evals"])
    print(f"q={q} init_t={init_t} stride={stride} "
          f"encoder_reuse={pc['encoder_reuse']} eta={pc['eta']}")

    run = sampler._build(init_t, stride, pc["encoder_reuse"], 0)
    t0 = time.time()
    out_sur, x_hat = run({"params": params}, jnp.asarray(y), float(q),
                         jax.random.PRNGKey(0), jnp.float32(pc["eta"]),
                         jnp.float32(1.0))
    out_sur, x_hat = np.asarray(out_sur), np.asarray(x_hat)
    print(f"solver done in {time.time()-t0:.0f}s")

    c_real = compress_batch(x_hat, "avif", np.full(args.n, q))
    x_exact = x_hat - c_real + y  # the final_exact output

    rows = {
        "psnr(y, x0) [observation]": psnr(y, x0),
        "psnr(x_hat, x0) [model clean estimate]": psnr(x_hat, x0),
        "psnr(codec(x_hat), y) [final anchor gap]": psnr(c_real, y),
        "psnr(x_exact, x0) [final_exact output]": psnr(x_exact, x0),
        "psnr(out_surrogate, x0) [no final_exact]": psnr(out_sur, x0),
    }
    for k, v in rows.items():
        print(f"{k:45s} mean {v.mean():6.2f} dB  (min {v.min():6.2f})")

    # error decomposition: x_exact - x0 = (x_hat - x0) - (codec(x_hat) - y)
    delta = x_hat - x0                      # model error
    proj = c_real - y                       # what the projection removes
    retained = delta - proj                 # passes into the output
    for name, e in (("model error delta", delta),
                    ("projection-removed part", proj),
                    ("retained (output) error", retained)):
        print(f"{name:30s} RMS {np.sqrt((e**2).mean()):.5f}")
    # how much of delta does the codec keep? (q90 keeps almost everything)
    keep = float((retained * delta).sum() / ((delta**2).sum() + 1e-12))
    print(f"fraction of model error RETAINED by codec at q{q}: {keep:.3f}")
    print(f"delta PSNR (final_exact vs observation): "
          f"{psnr(x_exact, x0).mean() - psnr(y, x0).mean():+.2f} dB")
    return 0


if __name__ == "__main__":
    sys.exit(main())
