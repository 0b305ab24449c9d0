"""The historical / experimental model family (experiments/code/*).

The reference's method evolved through five generations of models before the
production pipelines; they remain part of the framework's capability surface:

  * `MLPDenoiser`        — earliest baseline: flatten + linear t-embed + MLP
                           + tanh (ddpm.ipynb, extract ddpm.py:52-75).
  * `SimpleConvUNet`     — plain DoubleConv UNet with DDPM ε-target
                           (conv.ipynb, extract conv.py:43-160).
  * `DCTDenoiser`        — direct-x0 conv UNet over DCTProcessor-degraded
                           inputs with HybridLoss + cosine quality schedule
                           (dct.ipynb cell 2).
  * `HFCM`               — high-frequency compensation module: DCT features x
                           learned sigmoid mask x (1 - compression_level),
                           added to x ("FDG-Diff adapted",
                           new_method.py:185-219 extract).
  * `ExperimentalFreqAwareBlock` — DCT -> conv -> global-pool SE attention,
                           compression-modulated attn*(1-level)+0.5
                           (new_method.py:222-264 extract).
  * `SelectiveFreqUNet`  — the new_method UNet: freq guidance only at
                           down2/down3, bottleneck 0/2, up2/up3; bare 1x1-conv
                           head, no tanh (new_method.py:372-429 extract).

All NHWC, jnp/Flax; the DDPM-schedule companions live in
diffusion/ddpm_schedule.py.
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp

from ddpm_image_restoration_tpu.models.freq_blocks import _level_col
from ddpm_image_restoration_tpu.models.time_embedding import TimeEmbedding
from ddpm_image_restoration_tpu.ops.dct import adjusted_group_count, spatial_block_dct
from ddpm_image_restoration_tpu.ops.resize import max_pool_2x, upsample_2x_bilinear


class MLPDenoiser(nn.Module):
    """Flatten + Linear(1->512) t-encoder + 4-layer MLP + tanh."""

    image_size: int = 32
    hidden: Tuple[int, ...] = (1024, 2048, 1024)
    t_dim: int = 512

    @nn.compact
    def __call__(self, x: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
        b, h, w, c = x.shape
        flat = x.reshape(b, -1)
        t_embed = nn.Dense(self.t_dim, name="t_encoder")(
            jnp.asarray(t, jnp.float32).reshape(b, 1)
        )
        z = jnp.concatenate([flat, t_embed], axis=-1)
        for i, width in enumerate(self.hidden):
            z = nn.relu(nn.Dense(width, name=f"fc{i}")(z))
        z = nn.Dense(h * w * c, name="out")(z)
        return jnp.tanh(z).reshape(b, h, w, c)


class DoubleConv(nn.Module):
    out_channels: int

    @nn.compact
    def __call__(self, x):
        x = nn.relu(nn.Conv(self.out_channels, (3, 3), name="conv1")(x))
        return nn.relu(nn.Conv(self.out_channels, (3, 3), name="conv2")(x))


class SimpleConvUNet(nn.Module):
    """Plain 3-level DoubleConv UNet with sinusoidal time conditioning."""

    widths: Tuple[int, ...] = (64, 128, 256)
    time_dim: int = 128

    @nn.compact
    def __call__(self, x: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
        t_emb = TimeEmbedding(self.time_dim, name="time_embed")(
            jnp.asarray(t, jnp.float32)
        )
        skips = []
        h = x
        for i, w_ in enumerate(self.widths):
            h = DoubleConv(w_, name=f"down{i}")(h)
            h = h + nn.Dense(w_, name=f"tproj{i}")(t_emb)[:, None, None, :]
            skips.append(h)
            if i < len(self.widths) - 1:
                h = max_pool_2x(h)
        for i, w_ in enumerate(self.widths[-2::-1]):
            h = upsample_2x_bilinear(h)
            h = jnp.concatenate([h, skips[-(i + 2)]], axis=-1)
            h = DoubleConv(w_, name=f"up{i}")(h)
        return nn.Conv(x.shape[-1], (1, 1), name="out")(h)


class DCTDenoiser(nn.Module):
    """Direct x0-predictor over codec-simulated inputs (dct.ipynb cell 2)."""

    widths: Tuple[int, ...] = (64, 128, 256)
    time_dim: int = 128

    @nn.compact
    def __call__(self, x: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
        # UNet trunk predicting the clean image directly (tanh head, [-1,1])
        h = SimpleConvUNet(self.widths, self.time_dim, name="trunk")(x, t)
        return jnp.tanh(h)


class HFCM(nn.Module):
    """High-frequency compensation: x + mask(dct) * dct * (1 - level)."""

    channels: int
    block_size: int = 8

    @nn.compact
    def __call__(self, x: jnp.ndarray, compression_level=None) -> jnp.ndarray:
        dct = spatial_block_dct(x, self.block_size)
        gate = nn.Conv(self.channels, (1, 1), name="mask_conv")(dct)
        mask = nn.sigmoid(gate)
        comp = dct * mask
        lvl = _level_col(compression_level, x)
        if lvl is not None:
            comp = comp * (1.0 - lvl)
        return x + comp


class ExperimentalFreqAwareBlock(nn.Module):
    """DCT -> conv -> global-pool SE gate, modulated by (1-level)+0.5."""

    channels: int
    block_size: int = 8

    @nn.compact
    def __call__(self, x: jnp.ndarray, compression_level=None) -> jnp.ndarray:
        dct = spatial_block_dct(x, self.block_size)
        f = nn.relu(nn.Conv(self.channels, (3, 3), name="freq_conv")(dct))
        pooled = f.mean(axis=(1, 2))
        attn = nn.sigmoid(nn.Dense(self.channels, name="se")(pooled))[:, None, None, :]
        lvl = _level_col(compression_level, x)
        if lvl is not None:
            attn = attn * (1.0 - lvl) + 0.5
        return x + f * attn


class _ExpResBlock(nn.Module):
    out_channels: int
    time_dim: int
    use_freq_guide: bool = False

    @nn.compact
    def __call__(self, x, t_emb, level):
        in_c, out_c = x.shape[-1], self.out_channels
        h = nn.GroupNorm(adjusted_group_count(in_c), name="norm1")(x)
        h = nn.Conv(out_c, (3, 3), name="conv1")(h)
        h = h + nn.Dense(out_c, name="time_proj")(t_emb)[:, None, None, :]
        h = nn.GroupNorm(adjusted_group_count(out_c), name="norm2")(h)
        h = nn.gelu(h)
        h = nn.Conv(out_c, (3, 3), name="conv2")(h)
        if self.use_freq_guide:
            h = HFCM(out_c, name="hfcm")(h, level)
            h = ExperimentalFreqAwareBlock(out_c, name="freq")(h, level)
        if in_c != out_c:
            x = nn.Conv(out_c, (1, 1), name="shortcut")(x)
        return x + h


class SelectiveFreqUNet(nn.Module):
    """new_method.ipynb UNet: frequency guidance only at selected positions;
    bare conv head (no tanh)."""

    widths: Tuple[int, ...] = (64, 128, 256, 512, 512)
    bottleneck: Tuple[int, ...] = (1024, 1024, 512)
    time_dim: int = 256

    @nn.compact
    def __call__(self, x, t, compression_level=None):
        t = jnp.asarray(t, jnp.float32)
        if compression_level is None:
            compression_level = t
        t_emb = TimeEmbedding(self.time_dim, name="time_embed")(t)
        freq_down = {1, 2}          # down2/down3 (0-indexed)
        freq_bottle = {0, 2}
        freq_up = {1, 2}            # up2/up3

        skips = []
        h = x
        for i, w_ in enumerate(self.widths):
            if i > 0:
                h = max_pool_2x(h)
            h = _ExpResBlock(w_, self.time_dim, i in freq_down, name=f"down{i + 1}")(
                h, t_emb, compression_level
            )
            skips.append(h)
        h = max_pool_2x(h)
        for i, w_ in enumerate(self.bottleneck):
            h = _ExpResBlock(w_, self.time_dim, i in freq_bottle, name=f"bottleneck{i + 1}")(
                h, t_emb, compression_level
            )
        dec = list(self.widths[-2::-1]) + [self.widths[0]]
        for i, w_ in enumerate(dec):
            h = jnp.concatenate([upsample_2x_bilinear(h), skips[-(i + 1)]], axis=-1)
            h = _ExpResBlock(w_, self.time_dim, i in freq_up, name=f"up{i + 1}")(
                h, t_emb, compression_level
            )
        return nn.Conv(x.shape[-1], (1, 1), name="out")(h)  # bare head, no tanh
