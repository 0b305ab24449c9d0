"""Microbenchmark the layout-sensitive hot ops on the current accelerator:
blockwise-DCT formulations and the 2x bilinear upsample.

Each candidate runs as a 100-iteration lax.scan under one jit (single-call
timings through the axon tunnel are unreliable); reported number is
ms/iteration. Shapes default to the production restore config's hottest
level (batch 16, 128x128x64 bf16).
"""
from __future__ import annotations
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), ".."))  # run without install
del _os, _sys



import argparse
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/ddpm_ir_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

N_ITERS = 100


def timed_scan(fn, x):
    @jax.jit
    def run(x):
        def body(c, _):
            return fn(c) * 0.999 + x * 0.001, None  # keep data flowing

        out, _ = jax.lax.scan(body, x, None, length=N_ITERS)
        return out

    float(jnp.sum(run(x)))  # compile + warm
    t0 = time.perf_counter()
    float(jnp.sum(run(x)))
    return (time.perf_counter() - t0) / N_ITERS * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--size", type=int, default=128)
    ap.add_argument("--channels", type=int, default=64)
    ap.add_argument("--block-size", type=int, default=4)
    args = ap.parse_args()

    from ddpm_image_restoration_tpu.ops import dct as dct_mod
    from ddpm_image_restoration_tpu.ops import resize as resize_mod

    rng = np.random.default_rng(0)
    shape = (args.batch, args.size, args.size, args.channels)
    x = jnp.asarray(rng.normal(size=shape).astype(np.float32)).astype(jnp.bfloat16)
    print(f"platform={jax.devices()[0].platform} shape={shape} bf16")

    os.environ["DDPM_IR_DCT_IMPL"] = "kron"
    ref = np.asarray(
        dct_mod.spatial_block_dct(x, args.block_size), dtype=np.float32
    )
    for impl in ("shifts", "blockdiag", "kron"):
        os.environ["DDPM_IR_DCT_IMPL"] = impl
        try:
            got = np.asarray(
                dct_mod.spatial_block_dct(x, args.block_size), dtype=np.float32
            )
            err = float(np.max(np.abs(got - ref)))
            ms = timed_scan(
                lambda t: dct_mod.spatial_block_dct(t, args.block_size), x
            )
        except Exception as e:  # e.g. Mosaic compile failure on real TPU
            print(f"  dct[{impl:9s}]  FAILED: {type(e).__name__}: "
                  f"{str(e).splitlines()[0][:120]}")
            continue
        print(f"  dct[{impl:9s}]  {ms:7.3f} ms/iter  max|err vs kron|={err:.3e}")

    half = jnp.asarray(
        rng.normal(size=(args.batch, args.size // 2, args.size // 2,
                         args.channels)).astype(np.float32)
    ).astype(jnp.bfloat16)

    def up_resize(t):
        b, h, w, c = t.shape
        return jax.image.resize(t, (b, 2 * h, 2 * w, c), method="linear")

    def up_shifts(t):
        return resize_mod.upsample_2x_bilinear(t)

    for name, fn in (("resize", up_resize), ("shifts", up_shifts)):
        # upsample then crop back so the scan carry keeps one shape
        ms = timed_scan(lambda t: fn(t)[:, ::2, ::2, :], half)
        print(f"  upsample[{name:7s}] {ms:7.3f} ms/iter (incl. 2x crop)")


if __name__ == "__main__":
    main()
