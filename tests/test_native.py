"""Native C++ codec engine tests: build, numerics vs the jnp surrogate,
threading, error codes."""

import numpy as np
import pytest

from ddpm_image_restoration_tpu.codecs.native import (
    codec_surrogate_native,
    native_available,
)

pytestmark = pytest.mark.skipif(
    not native_available(), reason="no C++ toolchain to build the engine"
)


@pytest.fixture
def batch(rng):
    return np.clip(rng.normal(0, 0.4, (4, 32, 32, 3)), -1, 1).astype(np.float32)


@pytest.mark.parametrize("codec", ["jpeg", "webp", "avif"])
def test_matches_jnp_surrogate(codec, batch):
    import jax.numpy as jnp

    from ddpm_image_restoration_tpu.codecs.surrogate import codec_surrogate

    q = np.array([5, 30, 60, 95], np.int32)
    native = codec_surrogate_native(batch, q, codec=codec)
    device = np.asarray(
        codec_surrogate(jnp.asarray(batch), jnp.asarray(q, jnp.float32), codec=codec)
    )
    diff = np.abs(native - device)
    # coefficients at a rounding boundary may flip between implementations
    # (different float summation order); bound magnitude and frequency instead
    # of exact equality
    assert diff.mean() < 5e-3
    assert diff.max() < 8e-2
    assert (diff > 1e-3).mean() < 0.25


def test_monotone_quality(batch):
    errs = [
        float(np.mean((codec_surrogate_native(batch, q, "jpeg") - batch) ** 2))
        for q in (5, 50, 95)
    ]
    assert errs[0] > errs[1] > errs[2]


def test_threading_deterministic(batch):
    a = codec_surrogate_native(batch, 30, "jpeg", n_threads=1)
    b = codec_surrogate_native(batch, 30, "jpeg", n_threads=4)
    np.testing.assert_array_equal(a, b)


def test_bad_shape_raises(batch):
    with pytest.raises(ValueError, match="divisible"):
        codec_surrogate_native(batch[:, :30], 30, "jpeg")  # 30 not /8
