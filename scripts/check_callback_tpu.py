"""Roadmap check: which exact-codec consistency modes work on the real TPU
through the axon tunnel?

Result (2026-08-17, axon PJRT): 'callback' raises
    UNIMPLEMENTED: axon_pjrt does not support host send/recv callbacks
so `consistency_mode='host_loop'` (jitted per-step device compute with the
PIL codec round-trip on the host between steps) is the exact-codec path on
this platform; 'surrogate' stays the fast default. Standard (non-tunneled)
TPU hosts support callbacks.

Usage: python scripts/check_callback_tpu.py
"""
from __future__ import annotations
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), ".."))  # run without install
del _os, _sys



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

    for mode in ("surrogate", "host_loop", "callback"):
        sampler = DDRMSampler(model, get_preset("webp"), consistency_mode=mode)
        t0 = time.perf_counter()
        try:
            out = np.asarray(
                sampler.sample(params, y, quality=30, steps=6, key=jax.random.PRNGKey(1))
            )
        except Exception as e:
            print(f"{mode:10s}: FAILED ({type(e).__name__}: {str(e)[:120]})")
            continue
        dt = time.perf_counter() - t0
        # With random-init weights the DDRM consistency step x' = x_hat-c+y
        # legitimately leaves [-1,1] (the reference has no final clamp);
        # the platform check is "runs and stays finite".
        ok = bool(np.isfinite(out).all())
        print(f"{mode:10s}: finite={ok} "
              f"range=[{out.min():.3f},{out.max():.3f}] {dt:.1f}s -> "
              f"{'OK' if ok else 'FAIL'}")


if __name__ == "__main__":
    main()
