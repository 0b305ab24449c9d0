"""Self-attention over spatial tokens.

The reference runs full nn.MultiheadAttention over all H*W tokens in EVERY
ResAttn block (webp_training.py:317-321) — 4096 tokens at the 64x64 level,
O((HW)^2) memory. TPU-native treatment:

  * 'xla'   — jax.nn.dot_product_attention. XLA fuses the softmax chain and
              tiles the matmuls onto the MXU; fine up to a few thousand tokens.
  * 'flash' — blockwise Pallas kernel (ops/pallas/flash_attention.py) that
              never materialises the [T,T] score matrix; required headroom for
              the 128x128 (16384-token) configuration. Differentiable (custom
              VJP with blockwise backward kernels), so it is valid for
              training, not just the sampler.

Inputs are [B, T, H, D] (batch, tokens, heads, head_dim).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def spatial_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    impl: str = "xla",
) -> jnp.ndarray:
    """Scaled dot-product attention, [B,T,H,D] -> [B,T,H,D]."""
    if impl == "flash":
        from ddpm_image_restoration_tpu.ops.pallas.flash_attention import (
            flash_attention,
        )

        return flash_attention(q, k, v)
    if impl == "xla":
        return jax.nn.dot_product_attention(q, k, v)
    raise ValueError(f"unknown attention impl {impl!r}")
