"""Flash-attention kernel tests (interpreter mode on CPU): numerical parity
with the XLA path across shapes, padding edges, dtypes."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ddpm_image_restoration_tpu.ops.pallas.flash_attention import flash_attention


def _qkv(rng, b, t, h, d, dtype=np.float32):
    def mk():
        return jnp.asarray(rng.normal(0, 1, (b, t, h, d)).astype(dtype))
    return mk(), mk(), mk()


@pytest.mark.parametrize(
    "b,t,h,d",
    [
        (2, 64, 4, 16),    # tiny T, small head dim (UNet level-1-like, lane-padded)
        (1, 256, 4, 32),   # T == one query block
        (2, 300, 2, 64),   # T not a block multiple (padding + key masking)
        (1, 1024, 8, 128), # lane-aligned head dim
    ],
)
def test_matches_xla(rng, b, t, h, d):
    q, k, v = _qkv(rng, b, t, h, d)
    ref = jax.nn.dot_product_attention(q, k, v)
    out = flash_attention(q, k, v, interpret="always")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-3, rtol=2e-3)


def test_small_t_fallback(rng):
    """Below the token threshold the wrapper must route to the XLA path."""
    q, k, v = _qkv(rng, 2, 16, 4, 16)
    out = flash_attention(q, k, v)  # auto mode on CPU -> xla
    ref = jax.nn.dot_product_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)


def test_bf16_inputs(rng):
    q, k, v = _qkv(rng, 1, 256, 2, 32)
    qb, kb, vb = (x.astype(jnp.bfloat16) for x in (q, k, v))
    out = flash_attention(qb, kb, vb, interpret="always")
    ref = jax.nn.dot_product_attention(q, k, v)
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref), atol=3e-2, rtol=3e-2
    )


def test_softmax_scale_uses_real_head_dim(rng):
    """d=16 pads to 128 lanes; the softmax scale must still be 1/sqrt(16)."""
    q, k, v = _qkv(rng, 1, 256, 1, 16)
    ref = jax.nn.dot_product_attention(q, k, v)
    out = flash_attention(q, k, v, interpret="always")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-3, rtol=2e-3)


@pytest.mark.parametrize(
    "b,t,h,d",
    [
        (2, 300, 2, 64),   # single-block backward, T padding + lane padding
        (1, 1300, 2, 16),  # multi-block backward (512² blocks), both paddings
    ],
)
def test_grads_match_xla(rng, b, t, h, d):
    """custom_vjp backward kernels vs autodiff through the XLA path."""
    q, k, v = _qkv(rng, b, t, h, d)
    w = jnp.asarray(rng.normal(0, 1, q.shape).astype(np.float32))

    def loss(fn):
        return lambda q, k, v: jnp.sum(fn(q, k, v) * w)

    ref = jax.grad(loss(jax.nn.dot_product_attention), argnums=(0, 1, 2))(q, k, v)
    out = jax.grad(
        loss(lambda q, k, v: flash_attention(q, k, v, interpret="always")),
        argnums=(0, 1, 2),
    )(q, k, v)
    for g, r, name in zip(out, ref, "qkv"):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(r), atol=5e-3, rtol=5e-3,
            err_msg=f"d{name} mismatch",
        )


def test_grads_bf16_dtype(rng):
    q, k, v = _qkv(rng, 1, 256, 2, 32)
    qb, kb, vb = (x.astype(jnp.bfloat16) for x in (q, k, v))
    g = jax.grad(
        lambda q, k, v: jnp.sum(
            flash_attention(q, k, v, interpret="always").astype(jnp.float32)
        ),
        argnums=(0, 1, 2),
    )(qb, kb, vb)
    assert all(x.dtype == jnp.bfloat16 for x in g)
