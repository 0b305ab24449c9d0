"""Ops tests: spatial DCT layout, static masks vs the reference's loop
semantics, group-count rule, resize ops."""

import jax.numpy as jnp
import numpy as np
import pytest

from ddpm_image_restoration_tpu.ops.dct import (
    _low_freq_mask_np,
    adjusted_group_count,
    low_freq_mask,
    spatial_block_dct,
)
from ddpm_image_restoration_tpu.ops.resize import (
    adaptive_avg_pool,
    max_pool_2x,
    upsample_2x_bilinear,
)


def test_spatial_dct_matches_blockwise(rng):
    """Each bxb tile of the output holds that tile's 2-D DCT."""
    x = rng.normal(size=(1, 8, 8, 1)).astype(np.float32)
    out = np.asarray(spatial_block_dct(jnp.asarray(x), 4))
    from ddpm_image_restoration_tpu.codecs.surrogate import dct_matrix

    d = dct_matrix(4)
    tile = x[0, 0:4, 4:8, 0]
    expected = d @ tile @ d.T
    np.testing.assert_allclose(out[0, 0:4, 4:8, 0], expected, atol=1e-5)


def test_spatial_dct_pads_non_multiple(rng):
    x = jnp.asarray(rng.normal(size=(1, 10, 14, 2)).astype(np.float32))
    out = spatial_block_dct(x, 4)
    assert out.shape == x.shape


def test_low_freq_mask_matches_reference_loop():
    """The static mask must equal the reference's per-block Python loop
    (webp_training.py:241-252) including the edge-tile min() rule."""
    for (h, w, b, ls) in [(16, 16, 4, 3), (8, 8, 8, 4), (10, 14, 4, 3)]:
        mask = _low_freq_mask_np(h, w, b, ls)
        ref = np.zeros((h, w), np.float32)
        for i in range(0, h, b):
            i_end = min(i + b, h)
            for j in range(0, w, b):
                j_end = min(j + b, w)
                low = max(1, min(ls, min(i_end - i, j_end - j)))
                ref[i : i + low, j : j + low] = 1.0
        np.testing.assert_array_equal(mask, ref)
    m = low_freq_mask(16, 16, 4, 3)
    assert m.shape == (1, 16, 16, 1)
    assert float(m.sum()) == 16 * 9  # 16 tiles x 3x3 low corner


def test_image_dct_roundtrip(rng):
    from ddpm_image_restoration_tpu.ops.dct import dct_to_image, image_to_dct

    x = jnp.asarray(np.clip(rng.normal(0, 0.3, (2, 16, 16, 3)), -0.9, 0.9).astype("f"))
    coeffs = image_to_dct(x)
    assert coeffs.shape == x.shape
    back = dct_to_image(coeffs)
    np.testing.assert_allclose(np.asarray(back), np.asarray(x), atol=1e-4)
    # DC coefficient dominates for a smooth image
    energy = np.asarray(coeffs[0, :, :, 0] ** 2)
    assert energy[0, 0] > 0.2 * energy.sum() or energy.sum() < 1e-6


def test_adjusted_group_count():
    # reference rule: min(8, c), decremented until it divides c
    assert adjusted_group_count(64) == 8
    assert adjusted_group_count(3) == 3
    assert adjusted_group_count(12) == 6
    assert adjusted_group_count(7) == 7
    assert adjusted_group_count(10) == 5


def test_max_pool(rng):
    x = jnp.asarray(rng.normal(size=(2, 8, 8, 3)).astype(np.float32))
    out = max_pool_2x(x)
    assert out.shape == (2, 4, 4, 3)
    assert float(out[0, 0, 0, 0]) == float(jnp.max(x[0, 0:2, 0:2, 0]))


def test_upsample_shape_and_constant(rng):
    x = jnp.ones((1, 4, 4, 2), jnp.float32) * 3.0
    out = upsample_2x_bilinear(x)
    assert out.shape == (1, 8, 8, 2)
    np.testing.assert_allclose(np.asarray(out), 3.0, atol=1e-6)


def test_adaptive_avg_pool(rng):
    x = jnp.asarray(rng.normal(size=(1, 8, 8, 2)).astype(np.float32))
    out = adaptive_avg_pool(x, 2)
    assert out.shape == (1, 2, 2, 2)
    np.testing.assert_allclose(
        float(out[0, 0, 0, 0]), float(x[0, 0:4, 0:4, 0].mean()), rtol=1e-5
    )
    up = adaptive_avg_pool(x, 16)  # upsample case falls back to resize
    assert up.shape == (1, 16, 16, 2)


def test_spatial_dct_impls_agree(rng, monkeypatch):
    """All three formulations — tile-reshape Kronecker GEMM (default),
    block-diagonal kron(I,D) contraction, and the elementwise strided-slice
    form — must compute the same transform."""
    x = jnp.asarray(rng.normal(size=(2, 16, 24, 3)).astype(np.float32))
    for bs in (4, 8):
        monkeypatch.setenv("DDPM_IR_DCT_IMPL", "kron")
        ref = np.asarray(spatial_block_dct(x, bs))
        for impl in ("blockdiag", "shifts"):
            monkeypatch.setenv("DDPM_IR_DCT_IMPL", impl)
            got = np.asarray(spatial_block_dct(x, bs))
            np.testing.assert_allclose(got, ref, atol=1e-5, err_msg=impl)

