"""Differentiable, device-resident codec surrogates (tensorized JPEG/WebP/AVIF).

TPU-native role: the reference's DDRM sampler re-compresses the model
prediction through the *real* codec every reverse step
(webp_training.py:452 `webp_compress(x_theta, quality)`), forcing a
device->host->libcodec->device round-trip per step. Precedent for a pure-tensor
stand-in exists in the reference itself: `DCTProcessor`
(experiments/code/dct.ipynb cell 2) implements JPEG's 8x8 DCT + quantization
round-trip with the standard quant tables as a torch op (with quadruple Python
loops). This module is that idea done right for XLA:

  * blockwise DCT as two einsum matmuls over static [B,H/b,b,W/b,b] tiles
    (MXU-friendly, no Python loops),
  * quality -> quant-scale via the libjpeg formula,
  * rounding with a straight-through gradient so the surrogate is usable
    inside a differentiable sampler,
  * 4:2:0 chroma subsampling as 2x2 average-pool + nearest upsample,
  * per-sample quality (a [B] vector) — fully batched, jittable, vmappable.

The surrogate is an *approximation* of the real bitstream codecs (no entropy
coding or adaptive block sizes; WebP/AVIF's in-loop deblocking is modeled by
the calibrated `_deblock` filter rather than reproduced bit-exactly). Its
contract is calibrated per codec so that PSNR(surrogate(x,q), codec(x,q))
stays small and monotone in q; exact-parity evaluation goes through
`consistency_mode='callback'` / 'host_loop'.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

# ---------------------------------------------------------------------------
# Color transforms (JPEG / BT.601 full-range)
# ---------------------------------------------------------------------------

_RGB2YCC = np.array(
    [
        [0.299, 0.587, 0.114],
        [-0.168736, -0.331264, 0.5],
        [0.5, -0.418688, -0.081312],
    ],
    dtype=np.float32,
)
_YCC2RGB = np.linalg.inv(_RGB2YCC).astype(np.float32)


def _color_matmul(x: jnp.ndarray, m: np.ndarray) -> jnp.ndarray:
    """3-channel color transform as scalar multiply-adds on unstacked
    channels. An einsum over a 3-wide channel axis lowers to a dot_general
    that wants the (3-element!) channel axis in the 128-lane minor dim —
    the TPU profiler showed full-tensor layout copies around those dots;
    this form stays elementwise at the tensor's native layout."""
    c0, c1, c2 = x[..., 0], x[..., 1], x[..., 2]
    return jnp.stack(
        [float(m[d, 0]) * c0 + float(m[d, 1]) * c1 + float(m[d, 2]) * c2
         for d in range(3)],
        axis=-1,
    )


def rgb_to_ycbcr(x: jnp.ndarray) -> jnp.ndarray:
    """[...,3] RGB in [0,1] -> YCbCr with Y in [0,1], Cb/Cr centered at 0."""
    return _color_matmul(x, _RGB2YCC)


def ycbcr_to_rgb(y: jnp.ndarray) -> jnp.ndarray:
    return _color_matmul(y, _YCC2RGB)


# ---------------------------------------------------------------------------
# Blockwise orthonormal DCT
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def dct_matrix(n: int) -> np.ndarray:
    """Orthonormal DCT-II matrix, rows = frequencies (D @ D.T = I)."""
    k = np.arange(n)[:, None].astype(np.float64)
    j = np.arange(n)[None, :].astype(np.float64)
    m = np.cos(np.pi * (2 * j + 1) * k / (2 * n)) * np.sqrt(2.0 / n)
    m[0] = np.sqrt(1.0 / n)
    return m.astype(np.float32)


@functools.lru_cache(maxsize=None)
def kron_dct_matrix(n: int) -> np.ndarray:
    """D ⊗ D [n², n²]: vec(D·X·Dᵀ) = (D⊗D)·vec(X) for row-major vec.

    Lets the blockwise 2-D DCT run as ONE [N, n²] x [n², n²] matmul instead of
    two tiny nxn contractions — the nxn einsum form leaves the 128x128 MXU
    ~97% idle (n=4/8), and the blockwise DCT is on the sampler's hot path
    (surrogate consistency every step + the frequency module in all 13 UNet
    blocks).
    """
    d = dct_matrix(n).astype(np.float64)
    return np.kron(d, d).astype(np.float32)


def blockify(x: jnp.ndarray, b: int) -> jnp.ndarray:
    """[..., H, W] -> [..., H//b, W//b, b, b] static reshape (no data movement beyond transpose)."""
    *lead, h, w = x.shape
    x = x.reshape(*lead, h // b, b, w // b, b)
    return jnp.moveaxis(x, -3, -2)  # [..., H//b, W//b, b, b]


def unblockify(x: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    b = x.shape[-1]
    x = jnp.moveaxis(x, -2, -3)  # [..., H//b, b, W//b, b]
    return x.reshape(*x.shape[:-4], h, w)


def block_dct2(x: jnp.ndarray, b: int) -> jnp.ndarray:
    """Blockwise 2-D DCT of [..., H, W]; returns block layout [..., H//b, W//b, b, b].

    Computed as a flattened Kronecker matmul (one [N, b²] x [b², b²] GEMM) —
    MXU-friendly, vs. two b x b contractions that waste >95% of the array.
    HIGHEST precision: quantization is sensitive to coefficient error.
    """
    k = jnp.asarray(kron_dct_matrix(b), dtype=x.dtype)
    blocks = blockify(x, b)                                   # [..., hb, wb, b, b]
    flat = blocks.reshape(*blocks.shape[:-2], b * b)
    coeffs = jnp.einsum(
        "...p,qp->...q", flat, k, precision=jax.lax.Precision.HIGHEST
    )
    return coeffs.reshape(blocks.shape)


def block_idct2(coeffs: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    b = coeffs.shape[-1]
    k = jnp.asarray(kron_dct_matrix(b), dtype=coeffs.dtype)
    flat = coeffs.reshape(*coeffs.shape[:-2], b * b)
    blocks = jnp.einsum(
        "...q,qp->...p", flat, k, precision=jax.lax.Precision.HIGHEST
    ).reshape(coeffs.shape)
    return unblockify(blocks, h, w)


# ---------------------------------------------------------------------------
# Quantization tables
# ---------------------------------------------------------------------------

# JPEG Annex K base tables (the same tables DCTProcessor uses: dct.ipynb cell 2).
_JPEG_LUMA = np.array(
    [
        [16, 11, 10, 16, 24, 40, 51, 61],
        [12, 12, 14, 19, 26, 58, 60, 55],
        [14, 13, 16, 24, 40, 57, 69, 56],
        [14, 17, 22, 29, 51, 87, 80, 62],
        [18, 22, 37, 56, 68, 109, 103, 77],
        [24, 35, 55, 64, 81, 104, 113, 92],
        [49, 64, 78, 87, 103, 121, 120, 101],
        [72, 92, 95, 98, 112, 100, 103, 99],
    ],
    dtype=np.float32,
)
_JPEG_CHROMA = np.array(
    [
        [17, 18, 24, 47, 99, 99, 99, 99],
        [18, 21, 26, 66, 99, 99, 99, 99],
        [24, 26, 56, 99, 99, 99, 99, 99],
        [47, 66, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
    ],
    dtype=np.float32,
)


def _vp8_style_table(b: int = 4) -> np.ndarray:
    """Flat-ish 4x4 table with mild high-frequency emphasis (VP8 uses near-flat
    quantizers with separate DC/AC strength rather than JPEG's steep tables)."""
    i = np.arange(b)[:, None] + np.arange(b)[None, :]
    return (12.0 + 6.0 * i).astype(np.float32)


def _av1_style_table(b: int = 8) -> np.ndarray:
    """Smoother-than-JPEG 8x8 table (AV1 quant matrices rise more gently)."""
    i = np.arange(b)[:, None] + np.arange(b)[None, :]
    return (14.0 + 4.5 * i).astype(np.float32)


def jpeg_quality_scale(quality: jnp.ndarray) -> jnp.ndarray:
    """libjpeg quality -> table scale factor (in %)."""
    quality = jnp.clip(quality, 1, 100).astype(jnp.float32)
    return jnp.where(quality < 50.0, 5000.0 / quality, 200.0 - 2.0 * quality)


def _scaled_table(base: jnp.ndarray, quality: jnp.ndarray) -> jnp.ndarray:
    """Scale a base table by quality; quality may be a scalar or [B] vector."""
    scale = jpeg_quality_scale(quality) / 100.0
    table = base * scale[..., None, None]
    return jnp.clip(jnp.floor(table + 0.5), 1.0, 255.0)


# ---------------------------------------------------------------------------
# Straight-through rounding
# ---------------------------------------------------------------------------


@jax.custom_vjp
def ste_round(x):
    return jnp.round(x)


def _ste_fwd(x):
    return jnp.round(x), None


def _ste_bwd(_, g):
    return (g,)


ste_round.defvjp(_ste_fwd, _ste_bwd)


# ---------------------------------------------------------------------------
# In-loop deblocking (WebP/AVIF)
# ---------------------------------------------------------------------------


def _deblock(chan: jnp.ndarray, b: int, strength: jnp.ndarray,
             thresh: jnp.ndarray = 8.0) -> jnp.ndarray:
    """One pass of a VP8/AV1-style in-loop deblocking approximation.

    The real WebP/AVIF decoders run a loop filter after dequantization that
    smooths pixels across transform-block boundaries, with strength rising as
    quality falls; the quantize-only surrogate therefore shows sharper block
    edges than the real codecs, and that mismatch was the leading suspect for
    the measured AVIF mid-quality host-vs-surrogate restoration gap
    (docs/PARITY.md, VERDICT round 3 #4). Model: at every b-aligned boundary,
    pull the two pixels each side toward the boundary average by
    (strength/2, strength/4), gated by g = T^2/(T^2+d^2) so genuine image
    edges (large inter-block step d) pass through — the differentiable
    analogue of the codecs' filter-threshold test. Pure strided slicing and
    elementwise math: negligible next to the DCT GEMMs, fully batched, and
    smooth in both inputs and `strength` (calibrated per quality).

    Args:
      chan: [B, H, W] channel in 0-255-scale units (any fixed offset).
      b: transform block size.
      strength: per-sample [B] filter strength in [0, 1].
      thresh: edge-preservation scale T in pixel-value units (scalar or
        per-sample [B]) — larger T filters across bigger block steps, the
        analogue of the codecs' quality-dependent filter limits; calibrated
        per quality alongside `strength`.
    """
    s = jnp.asarray(strength, jnp.float32)[:, None, None]
    t2 = jnp.square(
        jnp.broadcast_to(jnp.asarray(thresh, jnp.float32), (chan.shape[0],))
    )[:, None, None]

    def axis_pass(x: jnp.ndarray, axis: int) -> jnp.ndarray:
        x = jnp.moveaxis(x, axis, -1)
        n = x.shape[-1] // b
        if n < 2:
            return jnp.moveaxis(x, -1, axis)
        length = n * b
        p1 = x[..., b - 2::b][..., : n - 1]
        p0 = x[..., b - 1::b][..., : n - 1]
        q0 = x[..., b::b]
        q1 = x[..., b + 1::b]
        d = q0 - p0
        g = t2 / (t2 + d * d)
        adj = s * g * d
        x = x.at[..., b - 2:length - 2:b].add(0.25 * adj)
        x = x.at[..., b - 1:length - 1:b].add(0.5 * adj)
        x = x.at[..., b:length:b].add(-0.5 * adj)
        x = x.at[..., b + 1:length:b].add(-0.25 * adj)
        return jnp.moveaxis(x, -1, axis)

    return axis_pass(axis_pass(chan, 2), 1)


# ---------------------------------------------------------------------------
# Chroma subsampling
# ---------------------------------------------------------------------------


def _subsample_420(c: jnp.ndarray) -> jnp.ndarray:
    """[B,H,W] -> 2x2 average pooled and nearest-upsampled back (4:2:0 round trip)."""
    b, h, w = c.shape
    pooled = c.reshape(b, h // 2, 2, w // 2, 2).mean(axis=(2, 4))
    return jnp.repeat(jnp.repeat(pooled, 2, axis=1), 2, axis=2)


# ---------------------------------------------------------------------------
# The surrogate
# ---------------------------------------------------------------------------

_BLOCK = {"jpeg": 8, "webp": 4, "avif": 8}
# Per-codec quality-indexed quant-strength multipliers, fitted so the
# surrogate's MSE-vs-clean matches the real codec's at each quality on a
# calibration set (scripts/calibrate_surrogate.py); linearly interpolated in
# quality at runtime. Identity (1.0) until calibrated.
_CALIBRATION = {
    "jpeg": ([1, 5, 10, 20, 30, 40, 50, 60, 70, 75, 80, 85, 90, 95, 100],
             [1.0108, 1.0387, 1.1612, 1.5343, 1.8622, 0.9875, 0.9984, 1.0158,
              1.03, 1.0391, 1.0515, 1.0816, 1.1182, 1.246, 2.4953]),
    "webp": ([1, 5, 10, 20, 30, 40, 50, 60, 70, 75, 80, 85, 90, 95, 100],
             [0.7292, 0.7568, 1.2344, 1.9233, 2.289, 2.562, 2.7477, 2.9979,
              3.5427, 3.8976, 3.9432, 4.1925, 4.7712, 7.8653, 17.6325]),
    # AVIF needs the dense grid: the true multiplier drops sharply between
    # q50 (0.693) and q60 (0.378) — AOM switches rate-control behavior — and
    # linear interpolation over the old sparse knots {50,70,85,95} was ~1 dB
    # too lossy at q90 (interp 0.62 vs calibrated 0.538), which dominated the
    # q90 restoration regression (the real codec sits at ~44 dB there, so the
    # solver's consistency projections inherited the full mismatch).
    "avif": ([1, 5, 10, 20, 30, 40, 50, 60, 70, 75, 80, 85, 90, 95, 100],
             [0.5248, 0.4866, 0.7057, 0.8411, 0.8425, 0.7761, 0.7214, 0.3868,
              0.3944, 0.4037, 0.431, 0.4488, 0.5409, 0.7992, 2.0384]),
}


# Per-codec quality-indexed deblocking (strength, edge-threshold) pairs for
# `_deblock`, fitted by scripts/calibrate_surrogate.py to minimize the
# surrogate's direct MSE against the real codec output (not MSE-vs-clean —
# the loop filter barely changes distortion but visibly changes WHERE the
# error lives, which is what the solver's consistency projection feels).
# JPEG has no in-loop filter, so its strengths are identically zero.
# Fitted 2026-08-21 (scripts/calibrate_surrogate.py, 32 synthetic 64^2
# images, 2-round coordinate descent over s x T x mult). Direct
# surrogate-vs-real PSNR gains: WebP ~+0.5 dB at every quality, AVIF
# +0.3 dB at q<=50 (high-q AVIF barely filters — matching AOM, whose loop
# filter strength falls off with qindex). The fitted threshold T falls with
# quality exactly like the real codecs' filter limits.
_DEBLOCK = {
    "jpeg": ([1, 100], [0.0, 0.0], [8.0, 8.0]),
    "webp": ([1, 5, 10, 20, 30, 40, 50, 60, 70, 75, 80, 85, 90, 95, 100],
             [1.0, 0.8, 1.0, 0.8, 1.0, 0.8, 0.8, 0.8, 0.8, 0.8, 0.6, 0.6,
              0.8, 0.6, 0.6],
             [32.0, 32.0, 24.0, 24.0, 16.0, 16.0, 16.0, 16.0, 12.0, 12.0,
              12.0, 12.0, 8.0, 8.0, 8.0]),
    "avif": ([1, 5, 10, 20, 30, 40, 50, 60, 70, 75, 80, 85, 90, 95, 100],
             [1.0, 1.0, 1.0, 0.8, 1.0, 0.8, 0.8, 0.45, 0.3, 0.3, 0.15, 0.15,
              0.15, 0.15, 0.0],
             [32.0, 32.0, 32.0, 32.0, 16.0, 16.0, 12.0, 6.0, 6.0, 6.0, 8.0,
              6.0, 4.0, 4.0, 4.0]),
}


def _base_tables(codec: str):
    if codec == "jpeg":
        return _JPEG_LUMA, _JPEG_CHROMA
    if codec == "webp":
        t = _vp8_style_table(4)
        return t, t * 1.4
    if codec == "avif":
        t = _av1_style_table(8)
        return t, t * 1.3
    raise ValueError(f"unknown codec {codec!r}")


@functools.partial(jax.jit, static_argnames=("codec", "subsample"))
def codec_surrogate(
    x: jnp.ndarray,
    quality: jnp.ndarray,
    codec: str = "jpeg",
    subsample: bool = True,
) -> jnp.ndarray:
    """Differentiable codec round-trip approximation.

    Args:
      x: [B,H,W,3] in [-1,1] (NHWC — TPU conv layout). H, W divisible by the
        codec block size (and by 2 when `subsample`).
      quality: scalar or [B] quality in [1,100] (higher = less distortion).
      codec: 'jpeg' | 'webp' | 'avif'.
      subsample: apply a 4:2:0 chroma round-trip (the real codecs do below
        their subsampling-switch quality; here applied via a smooth blend).

    Returns:
      [B,H,W,3] in [-1,1], same dtype as x.
    """
    bsz = x.shape[0]
    q_vec = jnp.broadcast_to(jnp.asarray(quality, jnp.float32), (bsz,))
    q_grid, m_grid = _CALIBRATION[codec]
    mult = jnp.interp(q_vec, jnp.asarray(q_grid, jnp.float32),
                      jnp.asarray(m_grid, jnp.float32))
    dq_grid, s_grid, t_grid = _DEBLOCK[codec]
    dq = jnp.asarray(dq_grid, jnp.float32)
    deblock = jnp.interp(q_vec, dq, jnp.asarray(s_grid, jnp.float32))
    deblock_t = jnp.interp(q_vec, dq, jnp.asarray(t_grid, jnp.float32))
    return _surrogate_raw(x, q_vec, codec, subsample, mult, deblock, deblock_t)


@functools.partial(jax.jit, static_argnames=("codec", "subsample"))
def _surrogate_raw(
    x: jnp.ndarray,
    quality: jnp.ndarray,
    codec: str,
    subsample: bool,
    strength_mult: jnp.ndarray,
    deblock: jnp.ndarray = 0.0,
    deblock_thresh: jnp.ndarray = 8.0,
) -> jnp.ndarray:
    """Uncalibrated surrogate core; strength_mult scales the quant tables,
    deblock / deblock_thresh (scalar or [B]) set the in-loop filter strength
    (0 = off) and its edge-preservation threshold."""
    orig_dtype = x.dtype
    x = x.astype(jnp.float32)
    b = _BLOCK[codec]
    bsz, h, w, _ = x.shape
    quality = jnp.broadcast_to(jnp.asarray(quality, jnp.float32), (bsz,))
    strength_mult = jnp.broadcast_to(
        jnp.asarray(strength_mult, jnp.float32), (bsz,)
    )[:, None, None]

    # to [0,255] YCbCr, centered at 0 for the DCT
    rgb01 = (x + 1.0) * 0.5
    ycc = rgb_to_ycbcr(rgb01) * 255.0
    y = ycc[..., 0] - 128.0
    cb = ycc[..., 1]
    cr = ycc[..., 2]

    if subsample:
        # real codecs switch 4:2:0 <-> 4:4:4 at a quality threshold; a hard
        # switch would be non-differentiable in q, so blend with weight that
        # saturates at the extremes.
        w420 = jnp.clip((75.0 - quality) / 50.0, 0.0, 1.0)[:, None, None]
        cb = w420 * _subsample_420(cb) + (1.0 - w420) * cb
        cr = w420 * _subsample_420(cr) + (1.0 - w420) * cr

    luma_t, chroma_t = _base_tables(codec)
    qt_l = _scaled_table(jnp.asarray(luma_t), quality) * strength_mult   # [B,b,b]
    qt_c = _scaled_table(jnp.asarray(chroma_t), quality) * strength_mult

    def quantize_channel(chan: jnp.ndarray, table: jnp.ndarray) -> jnp.ndarray:
        coeffs = block_dct2(chan, b)                       # [B,H/b,W/b,b,b]
        # The orthonormal 2-D DCT-II has exactly JPEG's coefficient scaling at
        # b=8 (DC of a constant-v block is 8v in both gauges); for other block
        # sizes the coefficient magnitude scales as b/8, so rescale the table.
        t = table[:, None, None] * (b / 8.0)               # [B,1,1,b,b]
        q = ste_round(coeffs / t) * t
        return block_idct2(q, h, w)

    y_q = quantize_channel(y, qt_l)
    cb_q = quantize_channel(cb, qt_c)
    cr_q = quantize_channel(cr, qt_c)

    deblock = jnp.broadcast_to(jnp.asarray(deblock, jnp.float32), (bsz,))
    deblock_thresh = jnp.broadcast_to(
        jnp.asarray(deblock_thresh, jnp.float32), (bsz,))
    # JPEG has no in-loop filter (its _DEBLOCK table is zero); for WebP/AVIF
    # the filter runs inside the codec's reconstruction loop, i.e. after
    # dequantization and before the color transform — same place here.
    y_q = _deblock(y_q, b, deblock, deblock_thresh)
    cb_q = _deblock(cb_q, b, deblock, deblock_thresh)
    cr_q = _deblock(cr_q, b, deblock, deblock_thresh)

    ycc_q = jnp.stack([y_q + 128.0, cb_q, cr_q], axis=-1) / 255.0
    rgb = ycbcr_to_rgb(ycc_q)
    out = jnp.clip(rgb * 2.0 - 1.0, -1.0, 1.0)
    return out.astype(orig_dtype)
