"""Micro-benchmark for the Pallas flash-attention kernel at the parity-mode
shapes (full-token attention, SURVEY.md §3.4): T=16384/D=16 (128² level) and
T=4096/D=32 (64² level), head-dim lane-padded to 128.

Times a lax.scan of N kernel calls end-to-end (single-call timings through
the axon tunnel are meaningless — see verify skill notes), so the number is
device throughput, not dispatch latency. Compares block size variants and
the fused XLA path at the same shape where it fits.

Usage: python scripts/bench_flash_kernel.py [--t 16384] [--heads 4]
           [--bh 8] [--iters 8]
"""
from __future__ import annotations
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), ".."))  # run without install
del _os, _sys



import argparse
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/ddpm_ir_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def scan_time(fn, q, k, v, iters: int) -> float:
    """Wall time of `iters` chained attention calls (output feeds back in)."""

    @jax.jit
    def run(q, k, v):
        def body(carry, _):
            out = fn(carry, k, v)
            return out, None

        out, _ = jax.lax.scan(body, q, None, length=iters)
        return out

    out = run(q, k, v)
    float(jnp.sum(out))  # warmup + compile
    t0 = time.perf_counter()
    float(jnp.sum(run(q, k, v)))
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--t", type=int, default=16384)
    ap.add_argument("--d", type=int, default=16, help="real head dim")
    ap.add_argument("--b", type=int, default=8)
    ap.add_argument("--heads", type=int, default=4)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--xla", action="store_true", help="also time the XLA path")
    ap.add_argument("--bwd", action="store_true",
                    help="time fwd+bwd through the custom VJP instead "
                         "(block sweep applies to the BACKWARD kernels)")
    args = ap.parse_args()

    from ddpm_image_restoration_tpu.ops.pallas.flash_attention import (
        _flash_bhtd,
        _flash_bhtd_bwd,
    )

    rng = np.random.default_rng(0)
    shape = (args.b * args.heads, args.t, 128)  # lane-padded D
    mk = lambda: jnp.asarray(rng.normal(0, 1, shape).astype(np.float32)).astype(
        jnp.bfloat16
    )
    q, k, v = mk(), mk(), mk()
    # zero the padded lanes like the wrapper does
    mask = jnp.zeros((128,), jnp.bfloat16).at[: args.d].set(1)
    q, k, v = q * mask, k * mask, v * mask

    # real useful FLOPs (2 matmuls over real D) and padded FLOPs
    flops_real = 2 * 2 * shape[0] * args.t * args.t * args.d
    flops_pad = 2 * 2 * shape[0] * args.t * args.t * 128

    if args.bwd:
        # backward = 5 [T,T]xD-class matmuls (S, dP, dV, dK, dQ)
        flops_real = flops_real * 5 // 2
        flops_pad = flops_pad * 5 // 2
        o, lse = _flash_bhtd(q, k, v, real_d=args.d, save_lse=True)
        do = mk() * mask
        for blk in (256, 512, 1024):
            if args.t % blk:
                continue
            fn = functools.partial(
                lambda q, k, v, blk: _flash_bhtd_bwd(
                    q, k, v, o, lse, do, real_d=args.d, block_q=blk, block_k=blk
                )[0],
                blk=blk,
            )
            try:
                dt = scan_time(fn, q, k, v, args.iters)
            except Exception as e:
                print(f"bwd block={blk:5d}: FAILED {type(e).__name__}")
                continue
            print(
                f"bwd block={blk:5d}: {dt * 1e3:8.2f} ms  "
                f"{flops_real / dt / 1e12:6.2f} real-TF/s  "
                f"{flops_pad / dt / 1e12:6.2f} padded-TF/s"
            )
        return

    for bq, bk in ((256, 512), (512, 512), (512, 1024), (1024, 1024), (256, 1024)):
        if args.t % max(bq, bk):
            continue
        fn = functools.partial(_flash_bhtd, real_d=args.d, block_q=bq, block_k=bk)
        try:
            dt = scan_time(fn, q, k, v, args.iters)
        except Exception as e:
            print(f"block_q={bq:5d} block_k={bk:5d}: FAILED {type(e).__name__}")
            continue
        print(
            f"block_q={bq:5d} block_k={bk:5d}: {dt * 1e3:8.2f} ms  "
            f"{flops_real / dt / 1e12:6.2f} real-TF/s  "
            f"{flops_pad / dt / 1e12:6.2f} padded-TF/s"
        )

    if args.xla:
        def xla_fn(q, k, v):
            return jax.nn.dot_product_attention(
                q[:, :, None, :], k[:, :, None, :], v[:, :, None, :]
            )[:, :, 0, :]

        try:
            dt = scan_time(xla_fn, q, k, v, args.iters)
            print(f"xla fused          : {dt * 1e3:8.2f} ms  "
                  f"{flops_real / dt / 1e12:6.2f} real-TF/s")
        except Exception as e:
            print(f"xla fused          : FAILED {type(e).__name__} "
                  f"(expected at T=16384: [T,T] scores ~0.5GB/bh)")


if __name__ == "__main__":
    main()
