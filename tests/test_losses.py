"""Loss tests: identity properties, ordering, SSIM behavior."""

import jax.numpy as jnp
import numpy as np
import pytest

from ddpm_image_restoration_tpu.diffusion.losses import (
    avif_frequency_aware_loss,
    color_preservation_loss,
    frequency_aware_loss,
    huber_loss,
    hybrid_loss,
    loss_for_preset,
    ssim,
)

LOSSES = [
    frequency_aware_loss,
    avif_frequency_aware_loss,
    color_preservation_loss,
    hybrid_loss,
    huber_loss,
]


def test_ssim_identity(small_images):
    x01 = jnp.asarray(small_images) * 0.5 + 0.5
    assert float(ssim(x01, x01)) == pytest.approx(1.0, abs=1e-5)


def test_ssim_decreases_with_noise(rng, small_images):
    x01 = jnp.asarray(small_images) * 0.5 + 0.5
    noisy1 = jnp.clip(x01 + 0.05 * rng.standard_normal(x01.shape).astype("f"), 0, 1)
    noisy2 = jnp.clip(x01 + 0.3 * rng.standard_normal(x01.shape).astype("f"), 0, 1)
    s1, s2 = float(ssim(x01, noisy1)), float(ssim(x01, noisy2))
    assert 1.0 > s1 > s2 > 0.0


def test_ssim_per_sample(small_images):
    x01 = jnp.asarray(small_images) * 0.5 + 0.5
    s = ssim(x01, x01, size_average=False)
    assert s.shape == (x01.shape[0],)


@pytest.mark.parametrize("loss_fn", LOSSES)
def test_loss_identity_near_zero(loss_fn, small_images):
    x = jnp.asarray(small_images)
    assert float(loss_fn(x, x)) == pytest.approx(0.0, abs=1e-4)


@pytest.mark.parametrize("loss_fn", LOSSES)
def test_loss_ordering(loss_fn, rng, small_images):
    x = jnp.asarray(small_images)
    near = jnp.clip(x + 0.02 * rng.standard_normal(x.shape).astype("f"), -1, 1)
    far = jnp.clip(x + 0.4 * rng.standard_normal(x.shape).astype("f"), -1, 1)
    assert float(loss_fn(near, x)) < float(loss_fn(far, x))


def test_loss_registry():
    assert loss_for_preset("frequency_aware") is frequency_aware_loss
    assert loss_for_preset("avif_frequency_aware") is avif_frequency_aware_loss
    with pytest.raises(KeyError):
        loss_for_preset("nope")
