"""On-chip validation of the flash-attention backward (custom VJP).

1. Gradient parity vs the fused XLA path at the production shape
   (T=1024, D=64 — the attn<=32^2 UNet level) on the real TPU.
2. Feasibility + timing at the reference-parity shape (T=16384, D=16):
   fwd+bwd through the Pallas kernel, where autodiff through naive
   attention would keep [T,T] f32 score/probability tensors (4 GB each
   at batch 4*heads) alive for the backward.

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

from ddpm_image_restoration_tpu.ops.pallas.flash_attention import flash_attention


def timed(fn, *a):
    t0 = time.perf_counter()
    out = fn(*a)
    s = sum(jnp.sum(x.astype(jnp.float32)) for x in jax.tree.leaves(out))
    f = float(s)  # scalar sync
    return time.perf_counter() - t0, f


def grads(attn, q, k, v, w):
    def loss(q, k, v):
        return jnp.sum(attn(q, k, v).astype(jnp.float32) * w)

    return jax.jit(jax.grad(loss, argnums=(0, 1, 2)))


def main():
    rng = np.random.default_rng(0)

    # 1) parity at T=1024, D=64, f32
    b, t, h, d = 4, 1024, 4, 64
    q, k, v, w = (
        jnp.asarray(rng.normal(0, 1, (b, t, h, d)).astype(np.float32))
        for _ in range(4)
    )
    g_flash = grads(flash_attention, q, k, v, w)
    g_xla = grads(jax.nn.dot_product_attention, q, k, v, w)
    gf = jax.tree.map(np.asarray, g_flash(q, k, v))
    gx = jax.tree.map(np.asarray, g_xla(q, k, v))
    for name, a, r in zip("qkv", gf, gx):
        err = np.max(np.abs(a - r)) / (np.max(np.abs(r)) + 1e-9)
        print(f"d{name}: rel-max-err {err:.2e}", flush=True)
        assert err < 2e-3, f"d{name} parity failed"
    print("parity at T=1024/D=64: OK", flush=True)

    for fn, nm in ((g_flash, "flash"), (g_xla, "xla")):
        dts = [timed(fn, q, k, v)[0] for _ in range(3)]
        print(f"bwd {nm} T=1024 D=64 b=4: {min(dts)*1e3:.2f} ms", flush=True)

    # 2) big shape: T=16384 (128^2 level), D=16, bf16, batch 2
    b, t, h, d = 2, 16384, 4, 16
    q, k, v = (
        jnp.asarray(rng.normal(0, 1, (b, t, h, d)).astype(np.float32)).astype(
            jnp.bfloat16
        )
        for _ in range(3)
    )
    w = jnp.ones((b, t, h, d), jnp.bfloat16)
    g_flash = grads(flash_attention, q, k, v, w)
    t0 = time.perf_counter()
    dt, chk = timed(g_flash, q, k, v)
    print(f"compile+run flash bwd T=16384: {time.perf_counter()-t0:.1f}s", flush=True)
    dts = [timed(g_flash, q, k, v)[0] for _ in range(3)]
    print(f"bwd flash T=16384 D=16 b=2 bf16: {min(dts)*1e3:.1f} ms (chk {chk:.3e})",
          flush=True)

    try:
        g_xla = grads(jax.nn.dot_product_attention, q, k, v, w)
        dt, _ = timed(g_xla, q, k, v)
        dts = [timed(g_xla, q, k, v)[0] for _ in range(3)]
        print(f"bwd xla   T=16384 D=16 b=2 bf16: {min(dts)*1e3:.1f} ms", flush=True)
    except Exception as e:  # expected: OOM on [B,H,T,T] residuals
        print(f"bwd xla   T=16384: FAILED ({type(e).__name__}: {str(e)[:120]})",
              flush=True)


if __name__ == "__main__":
    main()
