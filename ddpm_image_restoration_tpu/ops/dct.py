"""Frequency-domain ops for the UNet's codec-specialised modules.

TPU-native redesign of the reference's frequency machinery:

  * `DCTLayer` (webp_training.py:154-203) builds its DCT matrix elementwise in
    Python, `unfold`s into blocks and matmuls per block. Here the blockwise DCT
    is two einsum contractions over a statically reshaped [B,H/b,W/b,b,b,C]
    layout — one fused XLA op, MXU-tileable, no data-dependent shapes.

  * `WebPFreqAwareBlock`'s low/high frequency split runs a Python double loop
    over (h/b)x(w/b) blocks rebuilding the same mask every call, every block,
    every step (webp_training.py:241-252). The mask pattern is STATIC for a
    given (H, W, block, low_size): within each bxb tile, positions with
    (row < low) & (col < low) are "low frequency". Here it is a precomputed
    constant the compiler folds into the surrounding elementwise ops.

All ops take NHWC (TPU conv layout); the reference is NCHW.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from ddpm_image_restoration_tpu.codecs.surrogate import dct_matrix, kron_dct_matrix


@functools.lru_cache(maxsize=None)
def _block_diag_dct_np(n: int, block_size: int) -> np.ndarray:
    """kron(I_{n/bs}, D_bs) [n, n]: the blockwise 1-D DCT of a length-n axis
    as ONE dense matrix. ~ (n/bs)x redundant FLOPs over the per-block form,
    but they ride the MXU at its native 128-wide contraction with ZERO
    layout changes — the tile reshape/transpose form spends more time in
    layout copies than the matmul itself (measured: the space-to-depth
    copies were ~17% of restore busy time at 128²)."""
    d = dct_matrix(block_size).astype(np.float64)
    return np.kron(np.eye(n // block_size), d).astype(np.float32)


def spatial_block_dct(x: jnp.ndarray, block_size: int) -> jnp.ndarray:
    """Blockwise 2-D DCT of NHWC `x`, returned in the reference's spatial
    layout: each bxb tile of the output holds that tile's DCT coefficients
    (matches DCTLayer.forward webp_training.py:161-192, minus its pad path —
    UNet feature maps here are always block-size multiples).

    Formulation is selectable via DDPM_IR_DCT_IMPL = kron (default) |
    blockdiag | shifts: `kron` is the tile-reshape [N, bs²] x
    [bs², bs²] Kronecker GEMM; `blockdiag` contracts the full H then W axes
    against kron(I, D) block-diagonal matrices; `shifts` is pure elementwise
    strided slices + scalar multiply-adds. (A VMEM-resident Pallas kernel
    was tried across rounds 2-3 and DELETED: it passed interpret-mode parity
    but never compiled on real Mosaic — tpu_compile_helper exit 1 on every
    on-chip attempt, results/r3/micro_ops.log — while the flash-attention
    kernels compile fine through the same path. The kron GEMM is already
    MXU-shaped and within ~10% of the measured DCT budget, so the kernel's
    ceiling did not justify carrying a broken compile path.)

    The default is measured END-TO-END, not on micro-benchmarks (full 128²
    restore bench, v5e): kron 201.9 img/s, shifts 149.4, blockdiag 12.1.
    blockdiag won the isolated micro-op comparison 2.6x but collapsed in
    context — its [H,H]/[W,W] spatial contractions force layout changes on
    every surrounding op, which the micro-benchmark's steady-state loop never
    paid; shifts avoids matmuls entirely but its stack+reshape interleave
    materialises more intermediates than kron's tile copies. Only
    full-pipeline numbers pick defaults here.
    """
    b, h, w, c = x.shape
    bs = block_size
    if h % bs or w % bs:
        # pad to block multiple, transform, crop (DCTLayer semantics)
        hp, wp = (-h) % bs, (-w) % bs
        x_p = jnp.pad(x, ((0, 0), (0, hp), (0, wp), (0, 0)))
        return spatial_block_dct(x_p, bs)[:, :h, :w, :]
    impl = os.environ.get("DDPM_IR_DCT_IMPL", "kron")
    if impl == "shifts":
        # Pure-elementwise formulation: within a block, each output row is a
        # fixed bs-term linear combination of input rows — strided slices +
        # scalar multiply-adds + interleave, all at the tensor's native NHWC
        # layout. The dot_general forms contract over a SPATIAL axis, which
        # on TPU forces h/w into the 128-lane minor dim: the profiler showed
        # the surrounding layout copies costing more than the matmul
        # (copies were 15% of restore busy time at 128²). f32 accumulation
        # (free on the VPU) keeps bf16 activations at dot_general precision.
        d = dct_matrix(bs).astype(np.float64)

        def axis_dct(t: jnp.ndarray, axis: int) -> jnp.ndarray:
            slices = [
                jax.lax.slice_in_dim(t, j, None, stride=bs, axis=axis).astype(
                    jnp.float32
                )
                for j in range(bs)
            ]
            outs = [
                functools.reduce(
                    jnp.add, (float(d[i, j]) * slices[j] for j in range(bs))
                )
                for i in range(bs)
            ]
            stacked = jnp.stack(outs, axis=axis + 1)  # [..., n/bs, bs, ...]
            return stacked.reshape(t.shape)

        out = axis_dct(axis_dct(x, 1), 2)
        return out.astype(x.dtype)
    if impl == "blockdiag":
        d_h = jnp.asarray(_block_diag_dct_np(h, bs), dtype=x.dtype)
        d_w = jnp.asarray(_block_diag_dct_np(w, bs), dtype=x.dtype)
        return jnp.einsum(
            "Hh,bhwc,Ww->bHWc", d_h, x, d_w,
            precision=jax.lax.Precision.HIGHEST,
        )
    # one [N, bs²] x [bs², bs²] Kronecker GEMM instead of two bs x bs
    # contractions (MXU-friendly; this runs in every UNet block)
    k = jnp.asarray(kron_dct_matrix(bs), dtype=x.dtype)
    hb, wb = h // bs, w // bs
    tiles = x.reshape(b, hb, bs, wb, bs, c).transpose(0, 1, 3, 5, 2, 4)
    flat = tiles.reshape(b, hb, wb, c, bs * bs)
    coeffs = jnp.einsum("...p,qp->...q", flat, k, precision=jax.lax.Precision.HIGHEST)
    coeffs = coeffs.reshape(b, hb, wb, c, bs, bs).transpose(0, 1, 4, 2, 5, 3)
    return coeffs.reshape(b, h, w, c)


@functools.lru_cache(maxsize=None)
def _low_freq_mask_np(h: int, w: int, block_size: int, low_size: int) -> np.ndarray:
    """[h,w] float32 mask: 1 where the coefficient is 'low frequency'.

    Reproduces the reference loop bit-for-bit (webp_training.py:241-252):
    per bxb tile, low = top-left low_size x low_size corner, where
    low_size = max(1, min(cfg_low, tile_h, tile_w)) for edge tiles.
    """
    mask = np.zeros((h, w), dtype=np.float32)
    for i in range(0, h, block_size):
        i_end = min(i + block_size, h)
        for j in range(0, w, block_size):
            j_end = min(j + block_size, w)
            ls = max(1, min(low_size, min(i_end - i, j_end - j)))
            mask[i : i + ls, j : j + ls] = 1.0
    return mask


def low_freq_mask(h: int, w: int, block_size: int, low_size: int) -> jnp.ndarray:
    """Static low-frequency mask, shaped [1,h,w,1] for NHWC broadcast."""
    return jnp.asarray(_low_freq_mask_np(h, w, block_size, low_size))[None, :, :, None]


def image_to_dct(x: jnp.ndarray) -> jnp.ndarray:
    """Full-plane 2-D DCT of each YCbCr channel (the reference's cv2-based
    img_to_dct helper, dct.ipynb cell 0: RGB->YCrCb + per-channel cv2.dct).
    Input NHWC RGB in [-1,1]; output NHWC DCT coefficients (YCbCr order)."""
    from ddpm_image_restoration_tpu.codecs.surrogate import rgb_to_ycbcr

    ycc = rgb_to_ycbcr((x.astype(jnp.float32) + 1.0) * 0.5)
    h, w = x.shape[1], x.shape[2]
    d_h = jnp.asarray(dct_matrix(h))
    d_w = jnp.asarray(dct_matrix(w))
    planes = jnp.moveaxis(ycc, -1, 1)          # [B,3,H,W]
    coeffs = jnp.einsum(
        "ij,bcjk,lk->bcil", d_h, planes, d_w,
        precision=jax.lax.Precision.HIGHEST,
    )
    return jnp.moveaxis(coeffs, 1, -1)


def dct_to_image(coeffs: jnp.ndarray) -> jnp.ndarray:
    """Inverse of `image_to_dct`: coefficients -> RGB in [-1,1]."""
    from ddpm_image_restoration_tpu.codecs.surrogate import ycbcr_to_rgb

    h, w = coeffs.shape[1], coeffs.shape[2]
    d_h = jnp.asarray(dct_matrix(h))
    d_w = jnp.asarray(dct_matrix(w))
    planes = jnp.moveaxis(coeffs.astype(jnp.float32), -1, 1)
    ycc = jnp.einsum(
        "ji,bcjk,kl->bcil", d_h, planes, d_w,
        precision=jax.lax.Precision.HIGHEST,
    )
    rgb = ycbcr_to_rgb(jnp.moveaxis(ycc, 1, -1))
    return jnp.clip(rgb * 2.0 - 1.0, -1.0, 1.0)


def adjusted_group_count(channels: int, max_groups: int = 8) -> int:
    """GroupNorm group count with the reference's divisor-adjust rule
    (webp_training.py:277-279): min(8, C) reduced until it divides C."""
    g = min(max_groups, channels)
    while channels % g != 0 and g > 1:
        g -= 1
    return g
