"""Codec-specialised frequency modules for the UNet.

Three variants, one interface (`__call__(x_nhwc, compression_level) -> nhwc`):

  * `DCTFreqAwareBlock` — WebP (4x4 blocks, low_size 3, boost clamp .15/1.9;
    webp_training.py:206-270) and JPEG (8x8, low_size 4, clamp .2/2.0;
    `svd imagenet.ipynb` cell 0). The reference's per-block Python mask loop is
    a precomputed static mask here (see ops/dct.py).

  * `AVIFAdaptiveTransform` — learnable per-channel 8x8 block transform
    T·X·Tᵀ with an adaptive-quantization sigmoid gate (avif.py:186-247). The
    per-channel Python loop (avif.py:221-227) is one einsum. The reference
    also allocates an `inverse_weights` parameter it never uses (avif.py:195);
    deliberately not reproduced — dead parameters waste HBM.

  * `AVIFFreqAwareBlock` — adaptive transform + multi-scale SE attention at
    pooled scales [1,2,4,8], color-consistency and edge-preservation gates,
    compression-conditioned boosts, combined multiplicatively (avif.py:250-322).
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ddpm_image_restoration_tpu.codecs.surrogate import dct_matrix
from ddpm_image_restoration_tpu.ops.dct import low_freq_mask, spatial_block_dct
from ddpm_image_restoration_tpu.ops.resize import adaptive_avg_pool


def _level_col(level: Optional[jnp.ndarray], x: jnp.ndarray) -> Optional[jnp.ndarray]:
    """Broadcast a per-sample compression level to [B,1,1,1] in x's dtype."""
    if level is None:
        return None
    level = jnp.asarray(level, x.dtype)
    if level.ndim == 0:
        level = level[None]
    return level.reshape(-1, 1, 1, 1)


class DCTFreqAwareBlock(nn.Module):
    """WebP/JPEG frequency-aware module with static low/high masks."""

    channels: int
    block_size: int
    low_size: int
    high_boost_clamp: Tuple[float, float]
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, compression_level=None) -> jnp.ndarray:
        c = self.channels
        x_dct = spatial_block_dct(x, self.block_size)

        mask = low_freq_mask(
            x.shape[1], x.shape[2], self.block_size, self.low_size
        ).astype(x.dtype)
        low = x_dct * mask
        high = x_dct * (1.0 - mask)

        def gate(h, name):
            h = nn.Conv(c // 2, (1, 1), dtype=self.dtype, name=f"{name}_in")(h)
            h = nn.leaky_relu(h, 0.2)
            h = nn.Conv(c, (1, 1), dtype=self.dtype, name=f"{name}_out")(h)
            return nn.sigmoid(h)

        low_attn = gate(low, "low_attn")
        high_attn = gate(high, "high_attn")

        lvl = _level_col(compression_level, x)
        if lvl is not None:
            lo, hi = self.high_boost_clamp
            high_attn = high_attn * jnp.clip(1.0 - lvl, lo, hi)

        combined = low_attn * low + high_attn * high
        return nn.Conv(c, (3, 3), dtype=self.dtype, name="conv_out")(x + combined)


class AVIFAdaptiveTransform(nn.Module):
    """Learnable per-channel block transform + adaptive quantization gate."""

    channels: int
    block_size: int = 8
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, h, w, c = x.shape
        bs = self.block_size
        # init near the DCT so early training behaves like a fixed transform
        # plus learnable perturbation (the reference's randn init makes the
        # first epochs fight a random non-orthogonal transform).
        def init_fn(key, shape, dtype):
            base = jnp.asarray(dct_matrix(bs), dtype)
            noise = 0.02 * jax.random.normal(key, shape, dtype)
            return jnp.broadcast_to(base, shape) + noise

        tw = self.param("transform_weights", init_fn, (c, bs, bs), jnp.float32)
        tw = tw.astype(x.dtype)

        # pad to a block multiple, transform, crop (avif.py:208-242)
        hp, wp = (-h) % bs, (-w) % bs
        x_p = jnp.pad(x, ((0, 0), (0, hp), (0, wp), (0, 0))) if (hp or wp) else x
        tiles = x_p.reshape(b, (h + hp) // bs, bs, (w + wp) // bs, bs, c)
        # per-channel T · X · Tᵀ — replaces the reference's channel loop
        out = jnp.einsum("cij,bhjwkc,clk->bhiwlc", tw, tiles, tw)
        transformed = out.reshape(b, h + hp, w + wp, c)[:, :h, :w, :]

        q = nn.Conv(c, (1, 1), dtype=self.dtype, name="quant_in")(transformed)
        q = nn.relu(q)
        q = nn.Conv(c, (1, 1), dtype=self.dtype, name="quant_out")(q)
        return transformed * nn.sigmoid(q)


class AVIFFreqAwareBlock(nn.Module):
    channels: int
    block_size: int = 8
    color_boost_clamp: Tuple[float, float] = (0.3, 1.5)
    edge_boost_clamp: Tuple[float, float] = (0.5, 1.3)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, compression_level=None) -> jnp.ndarray:
        c = self.channels
        x_t = AVIFAdaptiveTransform(
            c, self.block_size, dtype=self.dtype, name="adaptive_transform"
        )(x)

        # multi-scale SE-style attention (avif.py:258-266)
        attn_sum = 0.0
        for scale in (1, 2, 4, 8):
            a = adaptive_avg_pool(x, scale)
            a = nn.Conv(c // 4, (1, 1), dtype=self.dtype, name=f"ms{scale}_in")(a)
            a = nn.relu(a)
            a = nn.Conv(c, (1, 1), dtype=self.dtype, name=f"ms{scale}_out")(a)
            a = nn.sigmoid(a)
            if a.shape[1:3] != x.shape[1:3]:
                a = jax.image.resize(
                    a, (a.shape[0], x.shape[1], x.shape[2], c), method="linear"
                )
            attn_sum = attn_sum + a
        attn_avg = attn_sum / 4.0

        col = nn.Conv(c, (1, 1), dtype=self.dtype, name="color_in")(x)
        col = nn.relu(col)
        col = nn.Conv(c, (1, 1), dtype=self.dtype, name="color_out")(col)
        color_attn = nn.sigmoid(col)

        e = nn.Conv(c // 2, (3, 3), dtype=self.dtype, name="edge_in")(x)
        e = nn.relu(e)
        e = nn.Conv(c, (3, 3), dtype=self.dtype, name="edge_out")(e)
        edge_attn = nn.sigmoid(e)

        lvl = _level_col(compression_level, x)
        if lvl is not None:
            clo, chi = self.color_boost_clamp
            elo, ehi = self.edge_boost_clamp
            color_attn = color_attn * jnp.clip(0.5 + 0.5 * (1.0 - lvl), clo, chi)
            edge_attn = edge_attn * jnp.clip(0.7 + 0.3 * (1.0 - lvl), elo, ehi)

        enhanced = x_t * attn_avg * color_attn * edge_attn
        return nn.Conv(c, (3, 3), dtype=self.dtype, name="conv_out")(x + enhanced)
