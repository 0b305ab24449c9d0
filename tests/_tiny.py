"""Shared tiny model configs for tests.

MINI: 2 encoder stages at 16x16 — cheap to compile on the 1-core CPU test
runner (5 ResAttn blocks instead of 13). Used by train/parallel/sampler tests
where architecture depth is irrelevant.

TINY5: the full 5-stage topology with shrunken widths at 32x32 — used only by
structure/parity tests.
"""

from ddpm_image_restoration_tpu.config import ModelConfig

MINI = ModelConfig(
    image_size=16,
    enc_widths=(8, 16),
    bottleneck_widths=(16, 16),
    time_dim=32,
    compute_dtype="float32",
)

TINY5 = ModelConfig(
    image_size=32,
    enc_widths=(8, 16, 16, 32, 32),
    bottleneck_widths=(32, 32, 32),
    time_dim=32,
    compute_dtype="float32",
)
