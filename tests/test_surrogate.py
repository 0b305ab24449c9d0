"""On-device codec surrogate tests: DCT orthonormality (golden-value), quality
monotonicity, differentiability, and proximity to the real codec."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ddpm_image_restoration_tpu.codecs import pil_codecs
from ddpm_image_restoration_tpu.codecs.surrogate import (
    block_dct2,
    block_idct2,
    codec_surrogate,
    dct_matrix,
    rgb_to_ycbcr,
    ycbcr_to_rgb,
)


@pytest.mark.parametrize("n", [4, 8])
def test_dct_matrix_orthonormal(n):
    d = dct_matrix(n)
    np.testing.assert_allclose(d @ d.T, np.eye(n), atol=1e-5)


def test_block_dct_roundtrip(rng):
    x = jnp.asarray(rng.normal(size=(2, 16, 16)).astype(np.float32))
    coeffs = block_dct2(x, 4)
    assert coeffs.shape == (2, 4, 4, 4, 4)
    back = block_idct2(coeffs, 16, 16)
    np.testing.assert_allclose(np.asarray(back), np.asarray(x), atol=1e-4)


def test_dct_dc_coefficient(rng):
    """DC coeff of an orthonormal DCT of a constant block = const * block_size."""
    x = jnp.ones((1, 8, 8), jnp.float32) * 3.0
    coeffs = np.asarray(block_dct2(x, 8))
    assert abs(coeffs[0, 0, 0, 0, 0] - 3.0 * 8) < 1e-4
    assert np.abs(coeffs[0, 0, 0]).sum() - abs(coeffs[0, 0, 0, 0, 0]) < 1e-4


def test_color_roundtrip(rng):
    x = jnp.asarray(rng.uniform(0, 1, size=(4, 4, 3)).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(ycbcr_to_rgb(rgb_to_ycbcr(x))), np.asarray(x), atol=1e-5
    )


@pytest.mark.parametrize("codec", ["jpeg", "webp", "avif"])
def test_surrogate_monotone_and_bounded(codec, small_images):
    x = jnp.asarray(small_images)
    errs = []
    for q in [5, 30, 95]:
        out = codec_surrogate(x, jnp.float32(q), codec=codec)
        assert out.shape == x.shape
        assert float(jnp.max(jnp.abs(out))) <= 1.0 + 1e-5
        errs.append(float(jnp.mean((out - x) ** 2)))
    assert errs[0] > errs[1] > errs[2]


def test_surrogate_per_sample_quality(small_images):
    x = jnp.asarray(small_images)
    q = jnp.asarray([5.0, 30.0, 60.0, 95.0])
    out = codec_surrogate(x, q, codec="jpeg")
    errs = [float(jnp.mean((out[i] - x[i]) ** 2)) for i in range(4)]
    assert errs[0] > errs[3]


def test_surrogate_differentiable(small_images):
    x = jnp.asarray(small_images)

    def loss(x):
        return jnp.mean(codec_surrogate(x, jnp.float32(30.0), codec="jpeg") ** 2)

    g = jax.grad(loss)(x)
    assert np.all(np.isfinite(np.asarray(g)))
    assert float(jnp.abs(g).max()) > 0  # straight-through round passes gradient


@pytest.mark.parametrize("codec", ["jpeg", "webp", "avif"])
def test_calibrated_surrogate_tracks_real(codec):
    """After calibration (scripts/calibrate_surrogate.py), surrogate PSNR must
    stay within ~2dB of the real codec on in-distribution images."""
    from ddpm_image_restoration_tpu.data import SyntheticImageDataset

    ds = SyntheticImageDataset(8, 64, seed=3)  # different seed than calibration
    x = np.stack([ds[i] for i in range(8)])
    xd = jnp.asarray(x)
    for q in [10, 30, 70]:
        real = pil_codecs.compress_batch(x, codec, q)
        sur = np.asarray(codec_surrogate(xd, jnp.float32(q), codec=codec))
        p = lambda a: -10 * np.log10(np.mean((a - x) ** 2) + 1e-9)
        assert abs(p(real) - p(sur)) < 2.0, (
            f"{codec} q{q}: real {p(real):.2f}dB vs surrogate {p(sur):.2f}dB"
        )


def test_surrogate_tracks_real_jpeg(small_images):
    """Surrogate distortion should be within ~a factor of real JPEG distortion."""
    x = jnp.asarray(small_images)
    for q in [10, 50, 90]:
        real = pil_codecs.compress_batch(small_images, "jpeg", q)
        sur = np.asarray(codec_surrogate(x, jnp.float32(q), codec="jpeg"))
        mse_real = np.mean((real - small_images) ** 2) + 1e-8
        mse_sur = np.mean((sur - small_images) ** 2) + 1e-8
        ratio = mse_sur / mse_real
        assert 0.1 < ratio < 10.0, f"q={q}: surrogate/real MSE ratio {ratio:.3f}"


def test_deblock_identity_at_zero_strength(rng):
    """_deblock with strength 0 is exactly the identity."""
    from ddpm_image_restoration_tpu.codecs.surrogate import _deblock

    x = jnp.asarray(rng.uniform(-128, 127, (2, 16, 16)).astype(np.float32))
    out = _deblock(x, 4, jnp.zeros(2), jnp.full(2, 8.0))
    np.testing.assert_array_equal(np.asarray(out), np.asarray(x))


def test_deblock_smooths_block_edges_preserves_true_edges():
    """The filter shrinks a small step at a block boundary but passes a large
    (true-edge) step nearly untouched, and never touches block interiors."""
    from ddpm_image_restoration_tpu.codecs.surrogate import _deblock

    b = 4
    x = np.zeros((2, 16, 16), np.float32)
    x[0, :, 8:] = 6.0     # small blocking step at the 8|9 boundary (cols)
    x[1, :, 8:] = 120.0   # large step = genuine image edge
    out = np.asarray(_deblock(jnp.asarray(x), b, jnp.full(2, 1.0),
                              jnp.full(2, 8.0)))
    step_small = out[0, 0, 8] - out[0, 0, 7]
    step_large = out[1, 0, 8] - out[1, 0, 7]
    assert step_small < 6.0 * 0.6, step_small      # visibly smoothed
    assert step_large > 120.0 * 0.9, step_large    # edge preserved
    # interiors (>=2 px from any boundary) are untouched
    np.testing.assert_array_equal(out[:, :, :2], x[:, :, :2])
    # smoothing is monotone across the boundary (no ringing/overshoot)
    assert out[0, 0, 6] <= out[0, 0, 7] <= out[0, 0, 8] <= out[0, 0, 9]


def test_deblock_per_sample_strength_and_grad():
    """Per-sample strengths act independently and the op is differentiable."""
    from ddpm_image_restoration_tpu.codecs.surrogate import _deblock

    x = np.zeros((2, 8, 8), np.float32)
    x[:, :, 4:] = 6.0
    s = jnp.asarray([0.0, 1.0])
    out = np.asarray(_deblock(jnp.asarray(x), 4, s, jnp.full(2, 8.0)))
    np.testing.assert_array_equal(out[0], x[0])          # lane 0: off
    assert out[1, 0, 4] - out[1, 0, 3] < 6.0             # lane 1: filtered
    g = jax.grad(lambda v: _deblock(v, 4, s, jnp.full(2, 8.0)).sum())(
        jnp.asarray(x))
    assert np.isfinite(np.asarray(g)).all()
