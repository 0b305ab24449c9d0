"""Sinusoidal timestep embedding + MLP.

Matches TimeEmbedding (webp_training.py:135-151 / avif.py:166-183): input is a
*normalized float* t in [0,1]; frequencies exp(-log(10000) * k/(half-1)) for
k in [0, half); sin/cat/cos; then Linear(dim, 4dim) -> SiLU -> Linear(4dim, dim).
Computed in float32 regardless of the model's compute dtype — embeddings of
nearby timesteps must stay distinguishable.
"""

from __future__ import annotations

import math

import flax.linen as nn
import jax.numpy as jnp


class TimeEmbedding(nn.Module):
    dim: int

    @nn.compact
    def __call__(self, t: jnp.ndarray) -> jnp.ndarray:
        t = t.astype(jnp.float32)
        half = self.dim // 2
        freqs = jnp.exp(
            jnp.arange(half, dtype=jnp.float32) * -(math.log(10000.0) / (half - 1))
        )
        args = t[:, None] * freqs[None, :]
        emb = jnp.concatenate([jnp.sin(args), jnp.cos(args)], axis=-1)
        emb = nn.Dense(self.dim * 4, dtype=jnp.float32, name="proj_in")(emb)
        emb = nn.silu(emb)
        return nn.Dense(self.dim, dtype=jnp.float32, name="proj_out")(emb)
