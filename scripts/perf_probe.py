"""Per-component timing probe for the 128x128 restore path.

Times one jitted UNet forward (batch 8, bf16) under several attention
configurations, plus the codec surrogate, to attribute the restore-path
cost (bench.py) to its components. Run on the real TPU chip.

Usage: python scripts/perf_probe.py [--size 128] [--batch 8]
"""
from __future__ import annotations
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), ".."))  # run without install
del _os, _sys



import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, iters=5, warmup=2):
    for _ in range(warmup):
        np.asarray(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    np.asarray(out)
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=128)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--only", default="", help="substring filter on config name")
    args = ap.parse_args()

    from ddpm_image_restoration_tpu.config import ModelConfig
    from ddpm_image_restoration_tpu.models import build_model
    from ddpm_image_restoration_tpu.codecs.surrogate import codec_surrogate

    x = jnp.zeros((args.batch, args.size, args.size, 3), jnp.float32)
    t = jnp.zeros(args.batch)

    configs = [
        ("flash attn everywhere", dict(attention_impl="flash", attn_max_resolution=1024)),
        ("flash attn <=64", dict(attention_impl="flash", attn_max_resolution=64)),
        ("attn <=32 (xla)", dict(attention_impl="xla", attn_max_resolution=32)),
        ("no attention", dict(attention_impl="xla", attn_max_resolution=1)),
    ]
    for name, kw in configs:
        if args.only and args.only not in name:
            continue
        cfg = ModelConfig(image_size=args.size, compute_dtype="bfloat16", **kw)
        model = build_model("webp", cfg)
        params = model.init(jax.random.PRNGKey(0), x, t)
        fwd = jax.jit(lambda p, x, t: model.apply(p, x, t, t))
        dt = timeit(fwd, params, x, t)
        print(f"{name:28s}: {dt * 1e3:8.2f} ms/forward  "
              f"({args.batch / dt:7.1f} fwd-img/s)")

    q = jnp.full((args.batch,), 30.0)
    surro = jax.jit(lambda x, q: codec_surrogate(x, q, codec="webp"))
    dt = timeit(surro, x, q)
    print(f"{'codec surrogate (webp)':28s}: {dt * 1e3:8.2f} ms/call")


if __name__ == "__main__":
    main()
