"""ctypes binding for the native C++ codec engine (native/codec_engine.cpp).

Builds the shared library on first use (make in native/, cached), falls back
gracefully to the jnp surrogate when no compiler is available. Numerics match
`codecs.surrogate.codec_surrogate` (same tables, same quality scaling, same
smooth 4:2:0 blend) so host-degraded training pairs are consistent with the
on-device in-sampler consistency step.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import warnings
from typing import Optional, Union

import numpy as np

_CODEC_IDS = {"jpeg": 0, "webp": 1, "avif": 2}
_LIB: Optional[ctypes.CDLL] = None
_LIB_FAILED = False


def _native_dir() -> str:
    return os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))), "native")


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _LIB_FAILED
    if _LIB is not None or _LIB_FAILED:
        return _LIB
    ndir = _native_dir()
    so = os.path.join(ndir, "libcodec_engine.so")
    try:
        if not os.path.exists(so) or os.path.getmtime(so) < os.path.getmtime(
            os.path.join(ndir, "codec_engine.cpp")
        ):
            subprocess.run(
                ["make", "-s", "libcodec_engine.so"], cwd=ndir, check=True,
                capture_output=True,
            )
        lib = ctypes.CDLL(so)
        lib.codec_surrogate_batch.restype = ctypes.c_int
        lib.codec_surrogate_batch.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ]
        if lib.codec_engine_version() < 3:
            raise RuntimeError("stale libcodec_engine.so (pre-deblock ABI)")
        _LIB = lib
    except Exception as e:  # no compiler / build failure: soft-fail to jnp path
        warnings.warn(f"native codec engine unavailable ({e}); using jnp surrogate")
        _LIB_FAILED = True
    return _LIB


def native_available() -> bool:
    return _load() is not None


def codec_surrogate_native(
    x: np.ndarray,
    quality: Union[int, np.ndarray],
    codec: str = "jpeg",
    subsample: bool = True,
    n_threads: int = 0,
) -> np.ndarray:
    """Host-side surrogate round-trip on [B,H,W,3] float32 in [-1,1]."""
    lib = _load()
    x = np.ascontiguousarray(x, dtype=np.float32)
    b, h, w, c = x.shape
    assert c == 3, "NHWC RGB expected"
    q = np.broadcast_to(np.asarray(quality, np.int32).reshape(-1), (b,))
    q = np.ascontiguousarray(q, dtype=np.int32)
    if lib is None:
        # jnp fallback re-derives the calibration/deblock interpolations
        # internally — skip computing them here.
        import jax.numpy as jnp

        from ddpm_image_restoration_tpu.codecs.surrogate import codec_surrogate

        return np.asarray(
            codec_surrogate(jnp.asarray(x), jnp.asarray(q, jnp.float32),
                            codec=codec, subsample=subsample)
        )
    from ddpm_image_restoration_tpu.codecs.surrogate import (
        _CALIBRATION,
        _DEBLOCK,
    )

    q_grid, m_grid = _CALIBRATION[codec]
    mult = np.ascontiguousarray(
        np.interp(q.astype(np.float64), q_grid, m_grid), dtype=np.float32
    )
    dq_grid, s_grid, t_grid = _DEBLOCK[codec]
    dbs = np.ascontiguousarray(
        np.interp(q.astype(np.float64), dq_grid, s_grid), dtype=np.float32
    )
    dbt = np.ascontiguousarray(
        np.interp(q.astype(np.float64), dq_grid, t_grid), dtype=np.float32
    )
    out = np.empty_like(x)
    rc = lib.codec_surrogate_batch(
        x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        q.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        mult.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        dbs.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        dbt.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        b, h, w, _CODEC_IDS[codec], int(subsample), n_threads,
    )
    if rc != 0:
        raise ValueError(
            f"codec_engine error {rc}: shape ({h},{w}) must be divisible by the "
            f"{codec} block size (and by 2 with subsampling)"
        )
    return out
