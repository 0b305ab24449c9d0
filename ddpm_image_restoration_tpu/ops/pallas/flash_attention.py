"""Blockwise (flash) self-attention Pallas TPU kernel.

Why: the reference applies full nn.MultiheadAttention over every spatial
position in every ResAttn block (webp_training.py:317-321). At the 128x128
configuration that is 16384 tokens; materialising the [T,T] score matrix
costs ~0.5-2 GB *per block per image* and caps batch size at ~1. This kernel
runs the online-softmax recurrence over key blocks so peak memory is
O(block_q * T) instead of O(T^2), with f32 accumulation and bf16 inputs.

Design notes (see /opt/skills/guides/pallas_guide.md):
  * grid = (batch*heads, T/block_q); one program owns one query block.
  * K and V for the whole (b,h) live in VMEM (T*D <= ~4MB for every level of
    this UNet family); the kernel loops over key blocks with lax.fori_loop.
  * head_dim is zero-padded to a multiple of 128 lanes by the wrapper;
    zero-padded key/query lanes contribute 0 to scores, so no masking needed
    on D. T is padded to a block multiple and padded KEYS are masked with a
    large negative score (static mask built from broadcasted_iota).
  * softmax statistics (running max m, normaliser l, accumulator acc) are f32.

The public `flash_attention(q, k, v)` takes [B, T, H, D] like
jax.nn.dot_product_attention and dispatches: tiny T or non-TPU backends fall
back to the fused XLA path (same math, keeps CPU tests honest), TPU takes the
Pallas kernel.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _round_up(x: int, m: int) -> int:
    return _cdiv(x, m) * m


def _kernel(
    q_ref, k_ref, v_ref, o_ref, m_scr, l_scr, acc_scr,
    *, sm_scale: float, block_k: int, t_real: int,
):
    """One (query block, key block) grid step of the online-softmax recurrence.

    Grid is (bh, n_q_blocks, n_k_blocks) with the key axis innermost
    ('arbitrary' semantics): the m/l/acc scratch carries softmax state across
    key blocks for a fixed query block; Pallas double-buffers the K/V block
    streams from HBM automatically. VMEM per step is O(block_q*D + block_k*D),
    independent of T — this is what lets 16k-token levels run at batch size.
    """
    j = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(j == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, -jnp.inf)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    q = q_ref[0].astype(jnp.float32) * sm_scale            # [bq, D]
    k = k_ref[0].astype(jnp.float32)                       # [bk, D]
    v = v_ref[0].astype(jnp.float32)
    bq = q.shape[0]

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )                                                      # [bq, bk]
    # mask padded keys (static t_real; key index = j*block_k + col)
    col = jax.lax.broadcasted_iota(jnp.int32, (bq, block_k), 1)
    s = jnp.where(col + j * block_k < t_real, s, -1e30)

    m_prev = m_scr[:, 0:1]
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
    p = jnp.exp(s - m_new)
    alpha = jnp.exp(m_prev - m_new)
    l_new = l_scr[:, 0:1] * alpha + jnp.sum(p, axis=-1, keepdims=True)
    acc_new = acc_scr[:] * alpha + jax.lax.dot_general(
        p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    m_scr[:, 0:1] = m_new
    l_scr[:, 0:1] = l_new
    acc_scr[:] = acc_new

    @pl.when(j == nk - 1)
    def _finalize():
        o_ref[0] = (acc_scr[:] / l_scr[:, 0:1]).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("real_d", "block_q", "block_k", "interpret")
)
def _flash_bhtd(
    q, k, v, real_d: int, block_q: int = 1024, block_k: int = 1024, interpret: bool = False
):
    """Core kernel over [BH, T, D] with D already lane-aligned; `real_d` is
    the unpadded head dim (softmax scale must not see the padding)."""
    bh, t, d = q.shape
    sm_scale = 1.0 / math.sqrt(real_d)
    if t <= block_q:
        # single query block; key loop degenerates to one iteration
        block_q = block_k = t_pad = _round_up(t, 8)
    else:
        t_pad = _round_up(t, max(block_q, block_k))
        # 1024/1024 blocks measured 2x faster than 256/512 at the parity
        # shapes (T=16384: 34.7 vs 69.2 ms, 64% of padded-FLOPs peak on
        # v5e) -- scripts/bench_flash_kernel.py
    if t_pad != t:
        pad = ((0, 0), (0, t_pad - t), (0, 0))
        q = jnp.pad(q, pad)
        k = jnp.pad(k, pad)
        v = jnp.pad(v, pad)

    grid = (bh, t_pad // block_q, t_pad // block_k)
    try:
        compiler_params = pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")
        )
    except TypeError:  # older pallas without the field
        compiler_params = None
    out = pl.pallas_call(
        functools.partial(_kernel, sm_scale=sm_scale, block_k=block_k, t_real=t),
        out_shape=jax.ShapeDtypeStruct((bh, t_pad, d), q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), lambda b, i, j: (b, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), lambda b, i, j: (b, j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, block_q, d), lambda b, i, j: (b, i, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((block_q, 128), jnp.float32),  # running max (col 0 used)
            pltpu.VMEM((block_q, 128), jnp.float32),  # running normaliser
            pltpu.VMEM((block_q, d), jnp.float32),    # output accumulator
        ],
        compiler_params=compiler_params,
        interpret=interpret,
    )(q, k, v)
    return out[:, :t, :]


def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    min_tokens_for_kernel: int = 1024,
    interpret: str = "auto",
) -> jnp.ndarray:
    """[B, T, H, D] scaled-dot-product attention via the Pallas kernel.

    Falls back to the fused XLA path for small T (kernel launch overhead and
    lane padding dominate) and on non-TPU backends unless `interpret` forces
    the kernel ('always' runs it in interpreter mode off-TPU, for tests).
    The threshold is measured, not guessed: with the tuned 1024-blocks the
    kernel's single-block path wins from T=1024 up (1.98 vs 2.52 ms against
    fused XLA at T=1024/D=64 on v5e; the old 256/512 blocks lost there),
    below that the fused XLA path wins on launch overhead, and at T>=4096
    the kernel is also what keeps the [T,T] score matrix out of HBM.
    """
    b, t, h, d = q.shape
    on_tpu = jax.default_backend() not in ("cpu", "gpu")
    if interpret == "never" or (
        interpret != "always" and (t < min_tokens_for_kernel or not on_tpu)
    ):
        return jax.nn.dot_product_attention(q, k, v)

    d_pad = _round_up(d, 128)

    def to_bhtd(x):
        x = jnp.moveaxis(x, 2, 1).reshape(b * h, t, d)
        if d_pad != d:
            x = jnp.pad(x, ((0, 0), (0, 0), (0, d_pad - d)))
        return x

    out = _flash_bhtd(
        to_bhtd(q), to_bhtd(k), to_bhtd(v), real_d=d, interpret=(interpret == "always")
    )
    out = out[:, :, :d].reshape(b, h, t, d)
    return jnp.moveaxis(out, 1, 2)
