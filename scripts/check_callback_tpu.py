"""Roadmap check: does `consistency_mode='callback'` (jax.pure_callback into
the host PIL codec pool from inside the sampler's lax.scan) work on the real
TPU through the axon tunnel? Verified on CPU already; this is the hardware
confirmation. Uses a tiny model so compile stays cheap.

Usage: python scripts/check_callback_tpu.py
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/ddpm_ir_jax_cache")


def main():
    from ddpm_image_restoration_tpu.config import ModelConfig, get_preset
    from ddpm_image_restoration_tpu.diffusion.ddrm import DDRMSampler
    from ddpm_image_restoration_tpu.models import build_model

    print("backend:", jax.default_backend(), jax.devices())
    cfg = ModelConfig(image_size=32, compute_dtype="bfloat16").scaled(8)
    model = build_model("webp", cfg)
    x = jnp.zeros((2, 32, 32, 3), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x, jnp.zeros(2))

    rng = np.random.default_rng(0)
    y = jnp.asarray(np.clip(rng.normal(0, 0.3, x.shape), -1, 1).astype(np.float32))

    for mode in ("surrogate", "callback"):
        sampler = DDRMSampler(model, get_preset("webp"), consistency_mode=mode)
        t0 = time.perf_counter()
        out = np.asarray(
            sampler.sample(params, y, quality=30, steps=6, key=jax.random.PRNGKey(1))
        )
        dt = time.perf_counter() - t0
        ok = np.isfinite(out).all() and np.abs(out).max() <= 1.0 + 1e-5
        print(f"{mode:10s}: finite={np.isfinite(out).all()} "
              f"range=[{out.min():.3f},{out.max():.3f}] {dt:.1f}s -> "
              f"{'OK' if ok else 'FAIL'}")


if __name__ == "__main__":
    main()
