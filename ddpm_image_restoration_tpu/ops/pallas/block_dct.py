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
one write of the activation, no XLA-visible layout change — and runs both
1-D DCT passes inside VMEM using only leading-axis indexing (Mosaic does not
support shape casts that merge the tiled minor dims, e.g.
[H, W, cb] -> [H, W*cb] — that was this kernel's first formulation and it
failed `infer-vector-layout: unsupported shape cast` on real v5e):

    per program (one batch element, one channel chunk of x [1, H, W, cb]):
      pass 1 (W-axis DCT, MXU): for each row h, u[h] = kron(I, D)[W,W] @ x[0,h]
              — a [W,W] x [W,cb] dot; x[0,h] is a leading-index slice, so the
              tiled (W, cb) layout never changes.
      pass 2 (H-axis DCT, VPU): the H contraction only mixes rows within each
              bs-sized block (D is block-diagonal), so each output row is a
              bs-term scalar multiply-add of full [W, cb] slabs — statically
              unrolled with the DCT coefficients baked in as immediates.

The pass-1 block-diagonal matrix wastes (W/bs)x FLOPs on structural zeros, but
at bf16 on the MXU the whole 128² level costs ~microseconds of matmul — the
op is bandwidth-bound, which is exactly what the single-read/single-write
contract optimises. Pass 1 accumulates f32 via preferred_element_type with
weights cast to the activation dtype (matching the XLA paths' numerics);
pass 2 runs in f32 and casts once on store.

Grid: (B, C/cb); block [1, H, W, cb]. cb keeps each VMEM buffer <= ~2 MB
(cb=64 at 128², min(C,128) below); the f32 scratch is 2x that. Tiny planes
(H*W < 32²) stay on the XLA kron path — kernel launch overhead dominates
there and they are a rounding error of the op's total volume.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(bdw_ref, x_ref, o_ref, u_scr, *, block_size: int, d_np: np.ndarray):
    h = x_ref.shape[1]

    # pass 1: W-axis DCT — one [W,W] x [W,cb] MXU dot per row, leading-index
    # slices only (no reshape/transpose; Mosaic cannot merge tiled dims)
    def row_dct(hi, _):
        u_scr[hi] = jax.lax.dot_general(
            bdw_ref[:], x_ref[0, hi],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return 0

    jax.lax.fori_loop(0, h, row_dct, 0)

    # pass 2: H-axis DCT — block-diagonal, so each output row mixes only the
    # bs rows of its own block: static unroll with immediate coefficients
    for kb in range(h // block_size):
        base = kb * block_size
        for a in range(block_size):
            acc = functools.reduce(
                jnp.add,
                (float(d_np[a, r]) * u_scr[base + r] for r in range(block_size)),
            )
            o_ref[0, base + a] = acc.astype(o_ref.dtype)


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
    from ddpm_image_restoration_tpu.codecs.surrogate import dct_matrix
    from ddpm_image_restoration_tpu.ops.dct import _block_diag_dct_np

    b, h, w, c = x.shape
    bd_w = jnp.asarray(_block_diag_dct_np(w, block_size), dtype=x.dtype)
    d_np = dct_matrix(block_size).astype(np.float64)
    cb = _channel_chunk(h, c)
    grid = (b, c // cb)
    try:
        compiler_params = pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")
        )
    except TypeError:  # older pallas without the field
        compiler_params = None
    return pl.pallas_call(
        functools.partial(_kernel, block_size=block_size, d_np=d_np),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((w, w), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, h, w, cb), lambda i, j: (i, 0, 0, j), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, h, w, cb), lambda i, j: (i, 0, 0, j), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[pltpu.VMEM((h, w, cb), jnp.float32)],
        compiler_params=compiler_params,
        interpret=interpret,
    )(bd_w, x)
