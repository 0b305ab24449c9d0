"""Layout-preserving blockwise 2-D DCT Pallas TPU kernel.

Why: the UNet's frequency modules run `spatial_block_dct` on NHWC activations
in all 13 ResAttn blocks every model evaluation (the reference recomputes the
same transform with a Python block loop, webp_training.py:241-252). The XLA
formulations all pay HBM-level layout traffic: the tile-reshape Kronecker GEMM
(current default) spends ~10% of restore busy time in space-to-depth copies
around its [N, bs²] x [bs², bs²] matmul; the block-diagonal einsum avoids the
tile gather but forces [H,H]/[W,W] relayouts on every *surrounding* op (16x
end-to-end regression, see ops/dct.py).

This kernel keeps the NHWC layout contract at the HBM boundary — one read and
one write of the activation, no XLA-visible layout change — and runs the
block-diagonal form inside VMEM where the H- and W-axis contractions are MXU
matmuls and the inter-pass transpose is VMEM-local:

    per program (one batch element, one channel chunk):
      y   = kron(I, D_bs)[H,H] @ x.reshape(H, W*cb)        # H-axis DCT
      z   = kron(I, D_bs)[W,W] @ y^T(swap H,W)             # W-axis DCT
      out = z^T(swap back)                                 # NHWC again

The block-diagonal matrices waste (H/bs)x FLOPs on structural zeros, but at
bf16 on the MXU the whole 128² level costs ~microseconds of matmul — the op
is bandwidth-bound, which is exactly what the single-read/single-write
contract optimises. f32 accumulation via preferred_element_type; weights are
cast to the activation dtype to match the XLA paths' numerics.

Grid: (B, C/cb); block [1, H, W, cb]. cb keeps each VMEM buffer <= ~2 MB
(cb=64 at 128², min(C,128) below). Tiny planes (H*W < 32²) stay on the XLA
kron path — kernel launch overhead dominates there and they are a rounding
error of the op's total volume.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(bdh_ref, bdw_ref, x_ref, o_ref):
    x = x_ref[0]                                        # [H, W, cb]
    h, w, cb = x.shape
    y = jax.lax.dot_general(
        bdh_ref[:], x.reshape(h, w * cb),
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)
    y = y.reshape(h, w, cb).transpose(1, 0, 2).reshape(w, h * cb)
    z = jax.lax.dot_general(
        bdw_ref[:], y,
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)
    o_ref[0] = z.reshape(w, h, cb).transpose(1, 0, 2)


def _channel_chunk(h: int, c: int) -> int:
    """Largest channel chunk that keeps one [H, W, cb] bf16 buffer ~<= 2 MB."""
    cb = min(c, 128 if h < 128 else 64)
    while c % cb:
        cb //= 2
    return max(cb, 1)


@functools.partial(jax.jit, static_argnames=("block_size", "interpret"))
def block_dct_nhwc(
    x: jnp.ndarray, block_size: int, interpret: bool = False
) -> jnp.ndarray:
    """Blockwise 2-D DCT of NHWC `x` (H, W divisible by block_size), output in
    the same spatial layout as `spatial_block_dct` (each bs x bs tile holds
    its own DCT coefficients)."""
    from ddpm_image_restoration_tpu.ops.dct import _block_diag_dct_np

    b, h, w, c = x.shape
    bd_h = jnp.asarray(_block_diag_dct_np(h, block_size), dtype=x.dtype)
    bd_w = jnp.asarray(_block_diag_dct_np(w, block_size), dtype=x.dtype)
    cb = _channel_chunk(h, c)
    grid = (b, c // cb)
    return pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((h, h), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((w, w), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, h, w, cb), lambda i, j: (i, 0, 0, j), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, h, w, cb), lambda i, j: (i, 0, 0, j), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(bd_h, bd_w, x)
