"""Test harness: run everything on a faked 8-device CPU mesh.

The standard JAX substitute for multi-chip testing without a cluster:
XLA_FLAGS=--xla_force_host_platform_device_count=8 with JAX_PLATFORMS=cpu.
Must be set before jax initialises its backends, hence at conftest import time.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The environment's TPU plugin ("axon") re-selects itself regardless of
# JAX_PLATFORMS, so pin the platform through the config API before any
# backend is initialised.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture
def small_images(rng):
    """A tiny [4,16,16,3] batch in [-1,1] with smooth structure (compressible)."""
    b, h, w = 4, 16, 16
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    base = np.stack(
        [
            np.sin(xx / 3.0 + i) * np.cos(yy / 4.0 + 0.5 * i)
            for i in range(b * 3)
        ]
    ).reshape(b, 3, h, w).transpose(0, 2, 3, 1)
    noise = rng.normal(0, 0.05, size=base.shape).astype(np.float32)
    return np.clip(0.7 * base + noise, -1, 1).astype(np.float32)
