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

The kernel is differentiable via a custom VJP (FlashAttention-2-style
backward, see the backward section below): training at the reference's full
attention resolution — 16384 tokens at 128², where autodiff through a naive
attention keeps [T,T] probability AND score tensors alive for the backward —
runs in O(block · T) memory both ways.
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
    q_ref, k_ref, v_ref, o_ref, *scratch,
    sm_scale: float, block_k: int, t_real: int, save_lse: bool = False,
):
    """One (query block, key block) grid step of the online-softmax recurrence.

    Grid is (bh, n_q_blocks, n_k_blocks) with the key axis innermost
    ('arbitrary' semantics): the m/l/acc scratch carries softmax state across
    key blocks for a fixed query block; Pallas double-buffers the K/V block
    streams from HBM automatically. VMEM per step is O(block_q*D + block_k*D),
    independent of T — this is what lets 16k-token levels run at batch size.
    """
    if save_lse:
        lse_ref, m_scr, l_scr, acc_scr = scratch
    else:
        lse_ref, (m_scr, l_scr, acc_scr) = None, scratch
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
        if save_lse:
            lse = m_scr[:, 0:1] + jnp.log(l_scr[:, 0:1])
            lse_ref[0] = jnp.broadcast_to(lse, lse_ref.shape[1:])


def _block_plan(t: int, block_q: int, block_k: int):
    """Padded length + effective blocks: tiny T degenerates to one block."""
    if t <= block_q:
        block_q = block_k = t_pad = _round_up(t, 8)
    else:
        t_pad = _round_up(t, max(block_q, block_k))
        # 1024/1024 blocks measured 2x faster than 256/512 at the parity
        # shapes (T=16384: 34.7 vs 69.2 ms, 64% of padded-FLOPs peak on
        # v5e) -- scripts/bench_flash_kernel.py
    return t_pad, block_q, block_k


def _pad_t(arrs, t_pad: int):
    t = arrs[0].shape[1]
    if t_pad == t:
        return arrs
    pad = ((0, 0), (0, t_pad - t), (0, 0))
    return [jnp.pad(a, pad) for a in arrs]


def _compiler_params():
    try:
        return pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")
        )
    except TypeError:  # older pallas without the field
        return None


@functools.partial(
    jax.jit,
    static_argnames=("real_d", "block_q", "block_k", "interpret", "save_lse"),
)
def _flash_bhtd(
    q, k, v, real_d: int, block_q: int = 1024, block_k: int = 1024,
    interpret: bool = False, save_lse: bool = False,
):
    """Core kernel over [BH, T, D] with D already lane-aligned; `real_d` is
    the unpadded head dim (softmax scale must not see the padding). With
    `save_lse` also returns the per-query log-sum-exp, replicated across a
    128-lane axis ([BH, T, 128], col 0 meaningful — the layout JAX's own TPU
    flash kernel uses: 1-D stats would need a lane→sublane relayout that
    Mosaic rejects, cf. the block-DCT shape-cast failure)."""
    bh, t, d = q.shape
    sm_scale = 1.0 / math.sqrt(real_d)
    t_pad, block_q, block_k = _block_plan(t, block_q, block_k)
    q, k, v = _pad_t([q, k, v], t_pad)

    grid = (bh, t_pad // block_q, t_pad // block_k)
    out_shape = [jax.ShapeDtypeStruct((bh, t_pad, d), q.dtype)]
    out_specs = [
        pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0), memory_space=pltpu.VMEM)
    ]
    if save_lse:
        out_shape.append(jax.ShapeDtypeStruct((bh, t_pad, 128), jnp.float32))
        out_specs.append(
            pl.BlockSpec((1, block_q, 128), lambda b, i, j: (b, i, 0), memory_space=pltpu.VMEM)
        )
    out = pl.pallas_call(
        functools.partial(
            _kernel, sm_scale=sm_scale, block_k=block_k, t_real=t, save_lse=save_lse
        ),
        out_shape=out_shape,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), lambda b, i, j: (b, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), lambda b, i, j: (b, j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        scratch_shapes=[
            pltpu.VMEM((block_q, 128), jnp.float32),  # running max (col 0 used)
            pltpu.VMEM((block_q, 128), jnp.float32),  # running normaliser
            pltpu.VMEM((block_q, d), jnp.float32),    # output accumulator
        ],
        compiler_params=_compiler_params(),
        interpret=interpret,
    )(q, k, v)
    if save_lse:
        return out[0][:, :t, :], out[1][:, :t, :]
    return out[0][:, :t, :]


# --------------------------------------------------------------------------
# Backward pass (FlashAttention-2 style): two kernels re-stream K/V and Q
# blocks against the saved output + log-sum-exp instead of materialising the
# [T,T] probability matrix the VJP of a naive attention would keep. Both
# kernels work in [block_q, block_k] orientation (dKV uses transposed
# dot_general contractions) so the per-row stats stay [bq, 1] column slices —
# no lane→sublane relayouts. D_i = rowsum(dO ∘ O) is recomputed per block
# from the o/do blocks (cheap, elementwise) rather than stored like LSE.
#
#   S = scale·QKᵀ, P = exp(S − LSE)
#   dV = Pᵀ·dO
#   dS = P ∘ (dO·Vᵀ − D)
#   dQ = scale·dS·K,  dK = scale·dSᵀ·Q
# --------------------------------------------------------------------------


def _bwd_dq_kernel(
    q_ref, k_ref, v_ref, do_ref, o_ref, lse_ref, dq_ref, acc_scr,
    *, sm_scale: float, block_k: int, t_real: int,
):
    """grid (bh, n_q, n_k), key axis innermost; accumulates dQ for one
    query block across key blocks."""
    j = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(j == 0)
    def _init():
        acc_scr[:] = jnp.zeros_like(acc_scr)

    q = q_ref[0].astype(jnp.float32) * sm_scale
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)
    do = do_ref[0].astype(jnp.float32)
    o = o_ref[0].astype(jnp.float32)
    bq = q.shape[0]

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )                                                      # [bq, bk]
    col = jax.lax.broadcasted_iota(jnp.int32, (bq, block_k), 1)
    s = jnp.where(col + j * block_k < t_real, s, -1e30)
    p = jnp.exp(s - lse_ref[0][:, 0:1])                    # [bq, bk]
    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )                                                      # [bq, bk]
    d_row = jnp.sum(do * o, axis=-1, keepdims=True)        # [bq, 1]
    ds = p * (dp - d_row)
    acc_scr[:] += jax.lax.dot_general(
        ds, k, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ) * sm_scale

    @pl.when(j == nk - 1)
    def _finalize():
        dq_ref[0] = acc_scr[:].astype(dq_ref.dtype)


def _bwd_dkv_kernel(
    q_ref, k_ref, v_ref, do_ref, o_ref, lse_ref, dk_ref, dv_ref,
    dk_scr, dv_scr, *, sm_scale: float, block_k: int, t_real: int,
):
    """grid (bh, n_k, n_q), query axis innermost; accumulates dK/dV for one
    key block across query blocks. Padded-key rows produce garbage dK/dV
    that the wrapper's [:t] slice drops; padded-query rows have dO == 0 (the
    cotangent of jnp.pad) so they contribute nothing."""
    i = pl.program_id(2)
    ni = pl.num_programs(2)
    j = pl.program_id(1)

    @pl.when(i == 0)
    def _init():
        dk_scr[:] = jnp.zeros_like(dk_scr)
        dv_scr[:] = jnp.zeros_like(dv_scr)

    q = q_ref[0].astype(jnp.float32) * sm_scale
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)
    do = do_ref[0].astype(jnp.float32)
    o = o_ref[0].astype(jnp.float32)
    bq = q.shape[0]

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )                                                      # [bq, bk]
    col = jax.lax.broadcasted_iota(jnp.int32, (bq, block_k), 1)
    s = jnp.where(col + j * block_k < t_real, s, -1e30)
    p = jnp.exp(s - lse_ref[0][:, 0:1])
    dv_scr[:] += jax.lax.dot_general(                      # Pᵀ·dO → [bk, D]
        p, do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    d_row = jnp.sum(do * o, axis=-1, keepdims=True)
    ds = p * (dp - d_row)
    dk_scr[:] += jax.lax.dot_general(                      # dSᵀ·(scale·Q) → [bk, D]
        ds, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )

    @pl.when(i == ni - 1)
    def _finalize():
        dk_ref[0] = dk_scr[:].astype(dk_ref.dtype)
        dv_ref[0] = dv_scr[:].astype(dv_ref.dtype)


# Backward blocks default smaller than forward: each grid step keeps ~4
# [bq,bk] f32 temporaries live in VMEM (s, p, dp, ds), so 1024² blocks
# (4×4 MB) would crowd the ~16 MB VMEM of a v5e core; 512² keeps them at 1 MB.
_BWD_BLOCK = 512


@functools.partial(
    jax.jit, static_argnames=("real_d", "block_q", "block_k", "interpret")
)
def _flash_bhtd_bwd(
    q, k, v, o, lse, do, real_d: int,
    block_q: int = _BWD_BLOCK, block_k: int = _BWD_BLOCK, interpret: bool = False,
):
    bh, t, d = q.shape
    sm_scale = 1.0 / math.sqrt(real_d)
    t_pad, block_q, block_k = _block_plan(t, block_q, block_k)
    q, k, v, o, do = _pad_t([q, k, v, o, do], t_pad)
    (lse,) = _pad_t([lse], t_pad)

    qkv_i = lambda b, i, j: (b, i, 0)
    qkv_j = lambda b, i, j: (b, j, 0)
    spec_i = pl.BlockSpec((1, block_q, d), qkv_i, memory_space=pltpu.VMEM)
    spec_j = pl.BlockSpec((1, block_k, d), qkv_j, memory_space=pltpu.VMEM)
    lse_i = pl.BlockSpec((1, block_q, 128), qkv_i, memory_space=pltpu.VMEM)

    dq = pl.pallas_call(
        functools.partial(
            _bwd_dq_kernel, sm_scale=sm_scale, block_k=block_k, t_real=t
        ),
        out_shape=jax.ShapeDtypeStruct((bh, t_pad, d), q.dtype),
        grid=(bh, t_pad // block_q, t_pad // block_k),
        in_specs=[spec_i, spec_j, spec_j, spec_i, spec_i, lse_i],
        out_specs=spec_i,
        scratch_shapes=[pltpu.VMEM((block_q, d), jnp.float32)],
        compiler_params=_compiler_params(),
        interpret=interpret,
    )(q, k, v, do, o, lse)

    # dK/dV: same inputs, grid transposed (key blocks parallel, query axis
    # innermost). Index maps swap i/j roles relative to the dq call.
    qkv_ii = lambda b, j, i: (b, i, 0)
    qkv_jj = lambda b, j, i: (b, j, 0)
    spec_ii = pl.BlockSpec((1, block_q, d), qkv_ii, memory_space=pltpu.VMEM)
    spec_jj = pl.BlockSpec((1, block_k, d), qkv_jj, memory_space=pltpu.VMEM)
    lse_ii = pl.BlockSpec((1, block_q, 128), qkv_ii, memory_space=pltpu.VMEM)
    dk, dv = pl.pallas_call(
        functools.partial(
            _bwd_dkv_kernel, sm_scale=sm_scale, block_k=block_k, t_real=t
        ),
        out_shape=[
            jax.ShapeDtypeStruct((bh, t_pad, d), q.dtype),
            jax.ShapeDtypeStruct((bh, t_pad, d), q.dtype),
        ],
        grid=(bh, t_pad // block_k, t_pad // block_q),
        in_specs=[spec_ii, spec_jj, spec_jj, spec_ii, spec_ii, lse_ii],
        out_specs=[spec_jj, spec_jj],
        scratch_shapes=[
            pltpu.VMEM((block_k, d), jnp.float32),
            pltpu.VMEM((block_k, d), jnp.float32),
        ],
        compiler_params=_compiler_params(),
        interpret=interpret,
    )(q, k, v, do, o, lse)
    return dq[:, :t, :], dk[:, :t, :], dv[:, :t, :]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def _flash_diff(q, k, v, real_d, block_q, block_k, interpret):
    """Differentiable [BH,T,D] flash attention: primal calls are the plain
    forward kernel; under jax.grad the fwd also saves LSE and the bwd runs
    the blockwise dQ / dKV kernels (never materialising [T,T])."""
    return _flash_bhtd(
        q, k, v, real_d=real_d, block_q=block_q, block_k=block_k,
        interpret=interpret,
    )


def _flash_diff_fwd(q, k, v, real_d, block_q, block_k, interpret):
    o, lse = _flash_bhtd(
        q, k, v, real_d=real_d, block_q=block_q, block_k=block_k,
        interpret=interpret, save_lse=True,
    )
    return o, (q, k, v, o, lse)


def _flash_diff_bwd(real_d, block_q, block_k, interpret, res, do):
    q, k, v, o, lse = res
    dq, dk, dv = _flash_bhtd_bwd(
        q, k, v, o, lse, do, real_d=real_d, interpret=interpret
    )
    return dq, dk, dv


_flash_diff.defvjp(_flash_diff_fwd, _flash_diff_bwd)


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

    out = _flash_diff(
        to_bhtd(q), to_bhtd(k), to_bhtd(v), d, 1024, 1024, interpret == "always"
    )
    out = out[:, :, :d].reshape(b, h, t, d)
    return jnp.moveaxis(out, 1, 2)
