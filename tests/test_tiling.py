"""Overlap-tiled restoration: coverage, alignment, exact reassembly."""

import numpy as np
import pytest

from ddpm_image_restoration_tpu.utils.tiling import (
    CODEC_BLOCK_ALIGN,
    assemble_tiles,
    blend_window,
    extract_tiles,
    plan_tiles,
    restore_tiled,
)


@pytest.fixture
def rng():
    return np.random.default_rng(7)


@pytest.mark.parametrize(
    "h,w", [(128, 128), (300, 201), (64, 500), (50, 40), (17, 333), (1, 1)]
)
def test_plan_covers_and_aligns(h, w):
    tile = 128
    offsets, ph, pw = plan_tiles(h, w, tile, overlap=32)
    assert ph >= h and pw >= w
    covered = np.zeros((ph, pw), bool)
    for y, x in offsets:
        assert y % CODEC_BLOCK_ALIGN == 0 and x % CODEC_BLOCK_ALIGN == 0
        assert y + tile <= ph and x + tile <= pw
        covered[y : y + tile, x : x + tile] = True
    assert covered.all()


def test_plan_rejects_bad_args():
    with pytest.raises(ValueError):
        plan_tiles(100, 100, 100, 0)  # tile not 16-aligned
    with pytest.raises(ValueError):
        plan_tiles(100, 100, 128, 128)  # overlap >= tile


def test_blend_window_positive_and_symmetric():
    win = blend_window(64, 16)
    assert (win > 0).all() and win.max() <= 1.0
    np.testing.assert_allclose(win, win[::-1, ::-1])
    np.testing.assert_allclose(win, win.T)


@pytest.mark.parametrize("h,w,overlap", [(300, 201, 32), (64, 64, 0), (90, 260, 48)])
def test_identity_roundtrip_exact(rng, h, w, overlap):
    """extract -> assemble with untouched tiles must reproduce the image
    exactly: overlap weights normalise out, padding is cropped."""
    img = rng.normal(size=(h, w, 3)).astype(np.float32)
    tile = 64
    offsets, ph, pw = plan_tiles(h, w, tile, overlap)
    tiles = extract_tiles(img, offsets, tile, ph, pw)
    back = assemble_tiles(tiles, offsets, h, w, ph, pw, overlap)
    np.testing.assert_allclose(back, img, atol=1e-5)


def test_restore_tiled_applies_fn_and_batches(rng):
    img = rng.normal(size=(150, 333, 3)).astype(np.float32)
    calls = []

    def shift(batch):
        calls.append(batch.shape)
        return batch + 0.25

    out = restore_tiled(shift, img, tile=64, overlap=16, batch_size=4)
    np.testing.assert_allclose(out, img + 0.25, atol=1e-5)
    # every call saw the full static batch shape
    assert all(s == (4, 64, 64, 3) for s in calls)


def test_restore_tiled_tiny_image(rng):
    """Images smaller than one tile reflect-pad up and crop back."""
    img = rng.normal(size=(20, 30, 3)).astype(np.float32)
    out = restore_tiled(lambda b: b, img, tile=64, overlap=16, batch_size=2)
    assert out.shape == img.shape
    np.testing.assert_allclose(out, img, atol=1e-5)
