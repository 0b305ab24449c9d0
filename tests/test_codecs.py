"""Codec frontend tests: round-trip shape/range/monotonic-quality properties
(the unit-test strategy SURVEY.md §4 prescribes for the codec layer)."""

import numpy as np
import pytest

from ddpm_image_restoration_tpu.codecs import pil_codecs
from ddpm_image_restoration_tpu.codecs.quality import (
    init_timestep_for_quality,
    quality_for_timestep,
    sample_quality_range,
)
from ddpm_image_restoration_tpu.config import get_preset

CODECS = ["jpeg", "webp"] + (["avif"] if pil_codecs.avif_available() else [])


@pytest.mark.parametrize("codec", CODECS)
def test_roundtrip_shape_range(codec, small_images):
    out = pil_codecs.compress_batch(small_images, codec, 50)
    assert out.shape == small_images.shape
    assert out.dtype == np.float32
    assert out.min() >= -1.0 - 1e-6 and out.max() <= 1.0 + 1e-6


@pytest.mark.parametrize("codec", CODECS)
def test_quality_monotonic(codec, small_images):
    """Higher quality => lower (or equal) mean distortion."""
    errs = []
    for q in [5, 30, 95]:
        out = pil_codecs.compress_batch(small_images, codec, q)
        errs.append(float(np.mean((out - small_images) ** 2)))
    assert errs[0] >= errs[1] >= errs[2]
    assert errs[2] < 0.01  # q=95 should be near-lossless


def test_per_image_quality(small_images):
    qs = np.array([5, 30, 60, 95])
    out = pil_codecs.compress_batch(small_images, "jpeg", qs)
    errs = [float(np.mean((out[i] - small_images[i]) ** 2)) for i in range(4)]
    assert errs[0] > errs[3]


def test_single_image_squeeze(small_images):
    out = pil_codecs.compress_batch(small_images[0], "jpeg", 50)
    assert out.shape == small_images[0].shape


def test_quality_clamps():
    p_webp, p_jpeg = get_preset("webp"), get_preset("jpeg")
    assert p_webp.clamp_quality(-5) == 0      # webp_training.py:85
    assert p_jpeg.clamp_quality(-5) == 1
    assert p_jpeg.clamp_quality(1000) == 100


def test_quality_for_timestep():
    # q = clamp(min + (max-min)(1 - t/steps)) — webp_training.py:503
    t = np.array([1, 50, 99])
    q = quality_for_timestep(t, 100, (0, 40))
    assert q[0] > q[1] > q[2]
    assert q.min() >= 0 and q.max() <= 100


def test_init_timestep_clamps():
    p = get_preset("webp")
    assert init_timestep_for_quality(90, 100, p) == 20   # clamped up
    assert init_timestep_for_quality(0, 100, p) == 80    # clamped down
    p_avif = get_preset("avif")
    assert init_timestep_for_quality(90, 100, p_avif) == 15
    assert init_timestep_for_quality(1, 100, p_avif) == 75


def test_curriculum_distribution(rng):
    p = get_preset("webp")
    early = [sample_quality_range(rng, 0, p) for _ in range(500)]
    late = [sample_quality_range(rng, 100, p) for _ in range(500)]
    frac_high_early = np.mean([r == (70, 100) for r in early])
    frac_high_late = np.mean([r == (70, 100) for r in late])
    assert 0.2 < frac_high_early < 0.4      # P=0.3 at epoch 0
    assert 0.6 < frac_high_late < 0.8       # P=0.7 at epoch>=100
    assert any(r[0] == 0 for r in early)    # WebP low range starts at 0


def test_estimate_jpeg_quality_exact(tmp_path):
    """Estimator recovers libjpeg's quality setting exactly across the scale
    (both table-scaling regimes and the clamp ends), and returns None for
    non-JPEG inputs."""
    import io

    from PIL import Image

    from ddpm_image_restoration_tpu.codecs.quality import estimate_jpeg_quality

    rng = np.random.default_rng(0)
    img = Image.fromarray(rng.integers(0, 255, (64, 64, 3), dtype=np.uint8))
    for q in [2, 5, 10, 30, 50, 75, 90, 95, 100]:
        buf = io.BytesIO()
        img.save(buf, "JPEG", quality=q)
        buf.seek(0)
        assert estimate_jpeg_quality(Image.open(buf)) == q
    # path input
    p = tmp_path / "x.jpg"
    img.save(p, "JPEG", quality=37)
    assert estimate_jpeg_quality(str(p)) == 37
    # non-JPEG
    png = tmp_path / "x.png"
    img.save(png, "PNG")
    assert estimate_jpeg_quality(str(png)) is None
    assert estimate_jpeg_quality("/nonexistent/file.jpg") is None


def test_webp_quality_estimation(tmp_path):
    """VP8 header parse recovers a plausible quality: monotone in the true
    setting and within the calibrated tolerance on natural-statistics
    content; lossless WebP and non-WebP return None."""
    import io

    from PIL import Image

    from ddpm_image_restoration_tpu.codecs.estimate import (
        estimate_quality,
        estimate_webp_quality,
        parse_webp_y_ac_qi,
    )
    from ddpm_image_restoration_tpu.data.dataset import SyntheticImageDataset

    ds = SyntheticImageDataset(4, 64, seed=9, kind="dead_leaves")
    imgs = [Image.fromarray(((ds[i] * 0.5 + 0.5) * 255).astype(np.uint8))
            for i in range(4)]
    prev = -1.0
    for q in [10, 30, 50, 70, 90]:
        ests = []
        for im in imgs:
            buf = io.BytesIO()
            im.save(buf, "WEBP", quality=q)
            qi = parse_webp_y_ac_qi(buf.getvalue())
            assert qi is not None and 0 <= qi <= 127
            ests.append(estimate_webp_quality(buf.getvalue()))
        est = float(np.median(ests))
        assert abs(est - q) <= 10, (q, ests)
        assert est > prev  # monotone across the quality grid
        prev = est

    # lossless WebP carries no VP8 quantizer
    buf = io.BytesIO()
    imgs[0].save(buf, "WEBP", lossless=True)
    assert parse_webp_y_ac_qi(buf.getvalue()) is None

    # dispatcher: sniffs JPEG exactly, WebP approximately, None otherwise
    p_jpg = tmp_path / "a.jpg"
    imgs[0].save(p_jpg, "JPEG", quality=42)
    assert estimate_quality(str(p_jpg)) == 42
    p_webp = tmp_path / "a.webp"
    imgs[0].save(p_webp, "WEBP", quality=50)
    assert abs(estimate_quality(str(p_webp)) - 50) <= 12
    p_png = tmp_path / "a.png"
    imgs[0].save(p_png, "PNG")
    assert estimate_quality(str(p_png)) is None
    assert estimate_quality("/nonexistent.webp") is None


def test_avif_quality_estimation(tmp_path):
    """AV1 header walk recovers libavif's quality setting to +-1 (the qidx
    table is content- and size-independent); dispatcher sniffs the ftyp box."""
    import io

    from PIL import Image

    from ddpm_image_restoration_tpu.codecs.estimate import (
        estimate_avif_quality,
        estimate_quality,
        parse_avif_base_q_idx,
    )

    rng = np.random.default_rng(5)
    try:
        probe = io.BytesIO()
        Image.fromarray(np.zeros((16, 16, 3), np.uint8)).save(probe, "AVIF")
    except Exception:
        pytest.skip("no AVIF encoder in this environment")

    imgs = [
        Image.fromarray(rng.integers(0, 255, (64, 64, 3), dtype=np.uint8)),
        Image.fromarray((np.indices((77, 123)).sum(0) % 255).astype(np.uint8)).convert("RGB"),
    ]
    for q in [1, 10, 25, 50, 75, 90, 100]:
        for im in imgs:
            buf = io.BytesIO()
            im.save(buf, "AVIF", quality=q)
            qidx = parse_avif_base_q_idx(buf.getvalue())
            assert qidx is not None and 0 <= qidx <= 255
            assert abs(estimate_avif_quality(buf.getvalue()) - q) <= 1, q

    p = tmp_path / "x.avif"
    imgs[0].save(p, "AVIF", quality=33)
    assert abs(estimate_quality(str(p)) - 33) <= 1
    assert parse_avif_base_q_idx(b"nonsense") is None


def test_avif_superres_frame_header_exact():
    """Superres frames use the CODED denominator (coded_denom + 9), not an
    assumed one: with max_w=8192 and denom=16 the downscaled frame width is
    4096 (64 superblock columns, min_log2_tile_cols=0); a wrong denominator
    yields 114 sb columns, forcing min_log2_tile_cols=1 and mis-walking
    tile_info past the wrong number of bits before base_q_idx."""
    from ddpm_image_restoration_tpu.codecs.estimate import (
        _parse_av1_base_q_idx,
        _Seq,
    )

    s = _Seq()
    s.decoder_model_info_present = 0
    s.reduced = 1
    s.force_screen_content_tools = 2
    s.force_integer_mv = 2
    s.frame_id_numbers_present = 0
    s.enable_order_hint = 0
    s.order_hint_bits = 0
    s.frame_width_bits = 16
    s.frame_height_bits = 16
    s.max_w, s.max_h = 8192, 64
    s.enable_superres = 1
    s.use_128x128_superblock = 0

    # disable_cdf_update=0, allow_sct=0, use_superres=1, coded_denom=0b111
    # (denom 16), render_size_diff=0, uniform_tile_spacing=1,
    # increment_tile_cols_log2=0, base_q_idx=0b10001001 (137)
    header = bytes([0b00111101, 0b01000100, 0b10000000])
    assert _parse_av1_base_q_idx(header, s) == 137


def test_detect_codec(tmp_path, small_images):
    """Magic-byte codec detection (--codec auto dispatch): every codec the
    PIL frontend can write must round-trip through detect_codec; PNG and
    junk must return None."""
    from PIL import Image

    from ddpm_image_restoration_tpu.codecs.estimate import detect_codec

    img = Image.fromarray(
        (np.clip(small_images[0] * 0.5 + 0.5, 0, 1) * 255).astype(np.uint8)
    )
    for codec, fmt in [("jpeg", "JPEG"), ("webp", "WEBP")] + (
        [("avif", "AVIF")] if pil_codecs.avif_available() else []
    ):
        p = tmp_path / f"x_{codec}.bin"
        img.save(p, format=fmt, quality=50)
        assert detect_codec(p) == codec
        assert detect_codec(p.read_bytes()) == codec
    png = tmp_path / "x.png"
    img.save(png, format="PNG")
    assert detect_codec(png) is None
    assert detect_codec(b"garbage-not-an-image") is None
    assert detect_codec(tmp_path / "missing.jpg") is None
