"""The codec-conditioned residual-attention UNet family.

One parameterised skeleton covers the reference's three near-identical model
classes ({WebP,JPEG,AVIF}DiffusionModel, webp_training.py:330-399 /
avif.py:382-451 / `svd imagenet.ipynb` cell 0), with the codec differences
carried by `CodecPreset` (frequency module kind, block size, attention heads,
DCT-fusion scale).

Architecture (matching the reference block-for-block):
  encoder   3 -> w1 -> w2 -> w3 -> w4 -> w5 with 2x2 max-pool between stages
  bottleneck w5 -> b1 -> b2 -> b3 (at image_size/32 spatial)
  decoder   5 stages of concat([bilinear-up 2x, skip]) -> ResAttnBlock
  fusion    u5 + fusion_scale * DCT(u5)       (webp_training.py:396-397)
  head      GroupNorm -> SiLU -> conv3x3 -> tanh (residual in [-1,1])

Each ResAttnBlock: GN -> conv3x3 -> +time -> GN -> GELU -> dropout -> conv3x3
-> full spatial self-attention (residual) -> codec frequency module ->
shortcut(x) + h (webp_training.py:273-327).

TPU-first choices: NHWC layout, bf16 compute with fp32 GroupNorm and time
embedding, attention via fused XLA dot-product-attention or a Pallas flash
kernel, all frequency masks static constants.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from ddpm_image_restoration_tpu.config import CodecPreset, ModelConfig, get_preset
from ddpm_image_restoration_tpu.models.freq_blocks import (
    AVIFFreqAwareBlock,
    DCTFreqAwareBlock,
)
from ddpm_image_restoration_tpu.models.time_embedding import TimeEmbedding
from ddpm_image_restoration_tpu.ops.attention import spatial_attention
from ddpm_image_restoration_tpu.ops.dct import adjusted_group_count, spatial_block_dct
from ddpm_image_restoration_tpu.ops.resize import max_pool_2x, upsample_2x_bilinear


def _group_norm(c: int, name: str):
    # fp32 norms regardless of compute dtype: GroupNorm statistics in bf16
    # visibly degrade small-residual predictions.
    return nn.GroupNorm(
        num_groups=adjusted_group_count(c), dtype=jnp.float32, name=name
    )


class SpatialSelfAttention(nn.Module):
    """Multi-head self-attention over all H*W tokens (nn.MultiheadAttention
    equivalent: joint qkv projection + output projection, both with bias)."""

    channels: int
    num_heads: int
    impl: str = "xla"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, h, w, c = x.shape
        head_dim = c // self.num_heads
        tokens = x.reshape(b, h * w, c)
        qkv = nn.Dense(3 * c, dtype=self.dtype, name="qkv")(tokens)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(b, h * w, self.num_heads, head_dim)
        k = k.reshape(b, h * w, self.num_heads, head_dim)
        v = v.reshape(b, h * w, self.num_heads, head_dim)
        out = spatial_attention(q, k, v, impl=self.impl)
        out = out.reshape(b, h * w, c)
        out = nn.Dense(c, dtype=self.dtype, name="out")(out)
        return out.reshape(b, h, w, c)


class ResAttnBlock(nn.Module):
    out_channels: int
    preset: CodecPreset
    cfg: ModelConfig

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        t_emb: jnp.ndarray,
        compression_level: Optional[jnp.ndarray],
        deterministic: bool = True,
    ) -> jnp.ndarray:
        dtype = jnp.dtype(self.cfg.compute_dtype)
        in_c, out_c = x.shape[-1], self.out_channels

        h = _group_norm(in_c, "norm1")(x).astype(dtype)
        h = nn.Conv(out_c, (3, 3), dtype=dtype, name="conv1")(h)
        t = nn.Dense(out_c, dtype=dtype, name="time_proj")(t_emb.astype(dtype))
        h = h + t[:, None, None, :]

        h = _group_norm(out_c, "norm2")(h).astype(dtype)
        h = nn.gelu(h)
        h = nn.Dropout(self.cfg.dropout, deterministic=deterministic)(h)
        h = nn.Conv(out_c, (3, 3), dtype=dtype, name="conv2")(h)

        if x.shape[1] <= self.cfg.attn_max_resolution:
            attn = SpatialSelfAttention(
                out_c,
                self.preset.attn_heads,
                impl=self.cfg.attention_impl,
                dtype=dtype,
                name="attn",
            )(h)
            h = h + attn

        if self.preset.adaptive_transform:
            h = AVIFFreqAwareBlock(
                out_c,
                self.preset.dct_block_size,
                self.preset.color_boost_clamp,
                self.preset.edge_boost_clamp,
                dtype=dtype,
                name="freq_guide",
            )(h, compression_level)
        else:
            h = DCTFreqAwareBlock(
                out_c,
                self.preset.dct_block_size,
                self.preset.low_freq_size,
                self.preset.high_boost_clamp,
                dtype=dtype,
                name="freq_guide",
            )(h, compression_level)

        if in_c != out_c:
            x = nn.Conv(out_c, (1, 1), dtype=dtype, name="shortcut")(x)
        return x.astype(dtype) + h


class CodecDiffusionModel(nn.Module):
    """UNet predicting the restoration residual x0 - xt in [-1,1].

    The forward pass is split into `encode` (encoder + bottleneck) and
    `decode` (decoder + DCT fusion + head) so the solver can cache encoder
    features across diffusion steps (encoder-propagation acceleration,
    arXiv:2312.09608 / block caching arXiv:2312.03209): `__call__` is
    exactly `decode(encode(x))`, and both methods are usable standalone via
    `model.apply(..., method="encode"/"decode")` with the SAME param tree as
    the original single-pass implementation.
    """

    preset: CodecPreset
    cfg: ModelConfig

    def setup(self):
        cfg, preset = self.cfg, self.preset
        self.time_embed = TimeEmbedding(cfg.time_dim)
        if cfg.codec_conditioning:
            # Unified multi-codec model: a learned per-codec vector added to
            # the time embedding (config.CODECS order). The reference trains
            # one model per codec; this is the single-checkpoint equivalent.
            from ddpm_image_restoration_tpu.config import CODECS

            self.codec_embed = nn.Embed(
                len(CODECS), cfg.time_dim, dtype=jnp.float32
            )
        # cfg.remat: checkpoint each block's activations (recomputed on
        # backward) — the jax.checkpoint HBM<->FLOPs lever for 256^2+ runs.
        # `deterministic` stays a static Python bool through the lifted
        # transform (argnums include the module scope at 0: x=1, t_emb=2,
        # level=3, deterministic=4).
        block = (
            nn.remat(ResAttnBlock, static_argnums=(4,)) if cfg.remat
            else ResAttnBlock
        )
        for i, w_ in enumerate(cfg.enc_widths):
            setattr(self, f"down{i + 1}", block(w_, preset, cfg))
        for i, w_ in enumerate(cfg.bottleneck_widths):
            setattr(self, f"bottleneck{i + 1}", block(w_, preset, cfg))
        # decoder widths mirror the encoder (up1..up5 -> 512,256,128,64,64)
        self._dec_widths = list(cfg.enc_widths[-2::-1]) + [cfg.enc_widths[0]]
        for i, w_ in enumerate(self._dec_widths):
            setattr(self, f"up{i + 1}", block(w_, preset, cfg))
        self.out_norm = nn.GroupNorm(
            num_groups=adjusted_group_count(cfg.enc_widths[0]), dtype=jnp.float32
        )
        self.out_conv = nn.Conv(cfg.in_channels, (3, 3), dtype=jnp.float32)

    def _prep(self, t, compression_level, codec_id=None):
        t = jnp.asarray(t, jnp.float32)
        if t.ndim == 0:
            t = t[None]
        t_emb = self.time_embed(t)
        if self.cfg.codec_conditioning:
            if codec_id is None:
                raise ValueError(
                    "codec_conditioning=True: pass codec_id "
                    "(config.codec_index of the degradation codec)"
                )
            cid = jnp.broadcast_to(
                jnp.asarray(codec_id, jnp.int32), t.shape
            )
            t_emb = t_emb + self.codec_embed(cid)
        if compression_level is None:
            compression_level = t  # webp_training.py:373-374
        return t_emb, compression_level

    def encode(
        self,
        x: jnp.ndarray,
        t: jnp.ndarray,
        compression_level: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
        codec_id: Optional[jnp.ndarray] = None,
    ):
        """Encoder + bottleneck -> (skips tuple, bottleneck features)."""
        cfg = self.cfg
        t_emb, level = self._prep(t, compression_level, codec_id)
        h = x.astype(jnp.dtype(cfg.compute_dtype))
        skips = []
        for i in range(len(cfg.enc_widths)):
            h = getattr(self, f"down{i + 1}")(
                h if i == 0 else max_pool_2x(h), t_emb, level, deterministic
            )
            skips.append(h)
        h = max_pool_2x(h)
        for i in range(len(cfg.bottleneck_widths)):
            h = getattr(self, f"bottleneck{i + 1}")(h, t_emb, level, deterministic)
        return tuple(skips), h

    def decode_deep(
        self,
        features,
        t: jnp.ndarray,
        compression_level: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
        depth: int = 1,
        codec_id: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        """Decoder stages up1..up{n-depth} over cached `encode` output.

        Returns the deep decoder feature just before the last `depth` stages.
        The solver caches this across reuse steps (DeepCache-style decoder
        caching, arXiv:2312.00858, composed with encoder propagation): the
        deep, low-resolution decoder stages change little between adjacent
        diffusion steps, while the shallow high-resolution stages carry the
        step-to-step detail — so only those are recomputed per step via
        `decode_shallow`.
        """
        t_emb, level = self._prep(t, compression_level, codec_id)
        skips, h = features
        for i in range(len(self._dec_widths) - depth):
            skip = skips[-(i + 1)]
            h = jnp.concatenate([upsample_2x_bilinear(h), skip], axis=-1)
            h = getattr(self, f"up{i + 1}")(h, t_emb, level, deterministic)
        return h

    def decode_shallow(
        self,
        h: jnp.ndarray,
        skips,
        t: jnp.ndarray,
        compression_level: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
        depth: int = 1,
        codec_id: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        """The last `depth` decoder stages + DCT fusion + head, resuming from
        a (possibly cached) `decode_deep` output."""
        preset = self.preset
        t_emb, level = self._prep(t, compression_level, codec_id)
        n = len(self._dec_widths)
        for i in range(n - depth, n):
            skip = skips[-(i + 1)]
            h = jnp.concatenate([upsample_2x_bilinear(h), skip], axis=-1)
            h = getattr(self, f"up{i + 1}")(h, t_emb, level, deterministic)

        # DCT-feature fusion (webp_training.py:396-397; 0.15 for AVIF avif.py:448-449)
        dct_feature = spatial_block_dct(h, preset.dct_block_size)
        h = h + preset.dct_fusion_scale * dct_feature

        # output head (fp32)
        h = self.out_norm(h)
        h = nn.silu(h)
        h = self.out_conv(h)
        return jnp.tanh(h)

    def decode(
        self,
        features,
        t: jnp.ndarray,
        compression_level: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
        codec_id: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        """Decoder + DCT-feature fusion + head over cached `encode` output.

        Exactly `decode_shallow(decode_deep(...))` — the split point is a
        no-op on the math, it only exists so the solver can cache the deep
        stages."""
        h = self.decode_deep(
            features, t, compression_level, deterministic, depth=0,
            codec_id=codec_id,
        )
        return self.decode_shallow(
            h, features[0], t, compression_level, deterministic, depth=0,
            codec_id=codec_id,
        )

    def __call__(
        self,
        x: jnp.ndarray,
        t: jnp.ndarray,
        compression_level: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
        codec_id: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        t = jnp.asarray(t, jnp.float32)
        if t.ndim == 0:
            t = jnp.broadcast_to(t, (x.shape[0],))
        features = self.encode(x, t, compression_level, deterministic, codec_id)
        return self.decode(features, t, compression_level, deterministic, codec_id)


def build_model(codec: str, cfg: Optional[ModelConfig] = None) -> CodecDiffusionModel:
    cfg = (cfg or ModelConfig()).validate()
    if codec.lower() == "all" and not cfg.codec_conditioning:
        # the unified multi-codec model is always codec-conditioned
        import dataclasses

        cfg = dataclasses.replace(cfg, codec_conditioning=True)
    return CodecDiffusionModel(preset=get_preset(codec), cfg=cfg)
