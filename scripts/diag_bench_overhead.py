"""Diagnose the scan-bench constancy seen in results/onchip_queue_0818.

Observation: stride 5 (14 UNet evals/restore) vs stride 70 (1 eval) moved the
scan-mode bench only 90 -> 102 img/s — per-restore time nearly constant, so
something fixed dominates. This script separates the candidates by fitting
  total_time(n_iters) = fixed + n_iters * per_restore
for two configs, plus a model-only scan (no sampler) as the compute floor.

Run serialized on the TPU (one process).
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from ddpm_image_restoration_tpu.cli.common import configure_jax_cache

configure_jax_cache()

import jax
import jax.numpy as jnp
import numpy as np

from bench import build

BATCH = 16
SIZE = 128
STEPS = 70


def timed(fn, *a):
    t0 = time.perf_counter()
    r = fn(*a)
    float(jnp.sum(r)) if hasattr(r, "shape") else float(r)
    return time.perf_counter() - t0


def main():
    from ddpm_image_restoration_tpu.config import get_preset
    from ddpm_image_restoration_tpu.diffusion.ddrm import DDRMSampler

    model, cfg = build(SIZE, "flash", attn_max_res=32)
    x = jnp.zeros((BATCH, SIZE, SIZE, 3), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x, jnp.zeros(BATCH))
    preset = get_preset("webp")
    sampler = DDRMSampler(model, preset, consistency_mode="surrogate")
    rng = np.random.default_rng(0)
    y = jnp.asarray(np.clip(rng.normal(0, 0.4, x.shape), -1, 1).astype(np.float32))
    eta = jnp.float32(preset.eta)
    eta_b = jnp.float32(preset.eta_b)

    def make_run_many(stride, encoder_reuse):
        run = sampler.build_run(STEPS, stride, encoder_reuse, 0)

        @jax.jit
        def run_many(params, y, keys):
            # chain iterations (same trick as bench.py): a key-independent
            # restore (stride>=steps has no noise step) would otherwise be
            # hoisted out of the scan by XLA and measure nothing
            def body(tot, k):
                out = run(params, y + tot * jnp.float32(1e-12), 30, k, eta,
                          eta_b)
                return tot + jnp.sum(out), None

            tot, _ = jax.lax.scan(body, jnp.float32(0), keys)
            return tot

        return run_many

    # model-only: scan N bare UNet forwards (varying t so nothing folds away)
    @jax.jit
    def model_many(params, y, ts):
        def body(tot, t):
            tvec = jnp.full((BATCH,), t, jnp.float32)
            out = model.apply(params, y, tvec, tvec)
            return tot + jnp.sum(out.astype(jnp.float32)), None

        tot, _ = jax.lax.scan(body, jnp.float32(0), ts)
        return tot

    results = {}
    for name, stride, er in [("stride5_er2", 5, 2), ("stride70_er2", 70, 2)]:
        run_many = make_run_many(stride, er)
        for n in (4, 16, 64):
            keys = jax.random.split(jax.random.PRNGKey(42), n)
            timed(run_many, params, y, keys)  # warm (compile once per n)
            dts = [timed(run_many, params, y, keys) for _ in range(3)]
            dt = min(dts)
            results[(name, n)] = dt
            print(f"{name} iters={n}: total={dt:.3f}s per_restore={dt/n*1e3:.1f}ms "
                  f"img/s={BATCH*n/dt:.1f} (3 runs: {['%.3f' % d for d in dts]})",
                  flush=True)

    for n in (16, 64, 256):
        ts = jnp.linspace(0.0, 1.0, n)
        timed(model_many, params, y, ts)
        dts = [timed(model_many, params, y, ts) for _ in range(3)]
        dt = min(dts)
        print(f"model_only iters={n}: total={dt:.3f}s per_fwd={dt/n*1e3:.2f}ms "
              f"img/s={BATCH*n/dt:.1f}", flush=True)

    # linear fit fixed + n*per for each config
    for name in ("stride5_er2", "stride70_er2"):
        ns = np.array([4, 16, 64], float)
        ys = np.array([results[(name, n)] for n in (4, 16, 64)])
        per, fixed = np.polyfit(ns, ys, 1)
        print(f"{name}: fixed={fixed*1e3:.0f}ms per_restore={per*1e3:.1f}ms "
              f"-> asymptotic img/s={BATCH/per:.1f}")


if __name__ == "__main__":
    main()
