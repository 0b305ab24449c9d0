"""Degradation-level estimation from compressed bitstreams.

The reference treats the codec quality as ground-truth input everywhere
(test_webp_restoration takes quality_levels, webp_inference.py:604; the
samplers take `quality` directly). In production the quality of a file is
unknown — but it is (partly) recoverable from the bitstream:

  * JPEG: exact — the quantization tables encode libjpeg's quality setting
    (see `quality.estimate_jpeg_quality`).
  * WebP (lossy/VP8): approximate — the frame header carries the base
    quantizer index `y_ac_qi` (0..127). libwebp's rate control adapts qi to
    content, so a single quality maps to a small qi band; the inverse of a
    dead-leaves-calibrated median curve recovers quality to roughly +-5 on
    natural images (noise-like content skews lower).

The VP8 header walk below implements just enough of RFC 6386 (frame tag,
segmentation/filter blocks, then the quantizer block, 9.6) with the
standard boolean entropy decoder (7.3) to reach y_ac_qi.
"""

from __future__ import annotations

import os
from typing import Optional, Union

import numpy as np


class _BoolDecoder:
    """RFC 6386 7.3 boolean decoder (only prob=128 literals are needed for
    the header fields we read, but read_bool takes any prob)."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 2
        self.value = (data[0] << 8) | data[1]
        self.range = 255
        self.bit_count = 0

    def read_bool(self, prob: int = 128) -> int:
        split = 1 + (((self.range - 1) * prob) >> 8)
        big = split << 8
        if self.value >= big:
            ret = 1
            self.range -= split
            self.value -= big
        else:
            ret = 0
            self.range = split
        while self.range < 128:
            self.value = (self.value << 1) & 0xFFFF
            self.range <<= 1
            self.bit_count += 1
            if self.bit_count == 8:
                self.bit_count = 0
                if self.pos < len(self.data):
                    self.value |= self.data[self.pos]
                    self.pos += 1
        return ret

    def literal(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bool()
        return v

    def flagged_signed(self, n: int) -> int:
        """flag bit -> (n-bit magnitude, sign bit); 0 when the flag is 0."""
        if not self.read_bool():
            return 0
        v = self.literal(n)
        return -v if self.read_bool() else v


def parse_webp_y_ac_qi(data: Union[bytes, str, os.PathLike]) -> Optional[int]:
    """Base quantizer index (0..127) of a lossy WebP's VP8 key frame, or
    None for non-WebP input, lossless (VP8L), or parse failure."""
    if not isinstance(data, (bytes, bytearray)):
        try:
            with open(data, "rb") as f:
                data = f.read()
        except OSError:
            return None
    b = bytes(data)
    try:
        if b[:4] != b"RIFF" or b[8:12] != b"WEBP":
            return None
        pos = 12
        payload = None
        while pos + 8 <= len(b):
            tag = b[pos : pos + 4]
            size = int.from_bytes(b[pos + 4 : pos + 8], "little")
            if tag == b"VP8 ":
                payload = b[pos + 8 : pos + 8 + size]
                break
            pos += 8 + size + (size & 1)  # chunks are 2-byte aligned
        if payload is None:
            return None
        tag0 = payload[0] | (payload[1] << 8) | (payload[2] << 16)
        if tag0 & 1:  # interframe — WebP stills are always key frames
            return None
        if payload[3:6] != b"\x9d\x01\x2a":
            return None
        d = _BoolDecoder(payload[10:])  # 3B tag + 3B start code + 4B dims
        d.read_bool()  # color_space
        d.read_bool()  # clamping_type
        if d.read_bool():  # segmentation_enabled (9.3)
            update_map = d.read_bool()
            if d.read_bool():  # update_segment_feature_data
                d.read_bool()  # segment_feature_mode
                for _ in range(4):
                    d.flagged_signed(7)  # per-segment quantizer
                for _ in range(4):
                    d.flagged_signed(6)  # per-segment loop filter
            if update_map:
                for _ in range(3):
                    if d.read_bool():
                        d.literal(8)  # segment prob
        d.read_bool()  # filter_type (9.4)
        d.literal(6)  # loop_filter_level
        d.literal(3)  # sharpness_level
        if d.read_bool():  # loop_filter_adj_enable
            if d.read_bool():  # mode_ref_lf_delta_update
                for _ in range(4):
                    d.flagged_signed(6)
                for _ in range(4):
                    d.flagged_signed(6)
        d.literal(2)  # log2(token partitions) (9.5)
        return d.literal(7)  # y_ac_qi (9.6)
    except IndexError:
        return None


# Median y_ac_qi of PIL/libwebp encodes over dead-leaves (natural-image-
# statistics) content, quality 0..100 step 5 (spread was +-4 qi; noise-like
# content can sit ~15 qi lower at low quality). Regenerate with
# scripts/calibrate_webp_qi.py.
_WEBP_CAL_QUALITY = np.arange(0, 101, 5, dtype=np.float32)
_WEBP_CAL_QI = np.array(
    [127, 101, 91, 84, 78, 72, 67, 63, 59, 55, 51,
     48, 44, 41, 38, 35, 27, 19, 12, 6, 0],
    dtype=np.float32,
)


def estimate_webp_quality(data: Union[bytes, str, os.PathLike]) -> Optional[int]:
    """Approximate encoder quality of a lossy WebP (+-5-ish on natural
    images) by inverting the calibrated quality->y_ac_qi curve."""
    qi = parse_webp_y_ac_qi(data)
    if qi is None:
        return None
    # np.interp needs increasing x: the curve is decreasing, so flip both
    q = np.interp(qi, _WEBP_CAL_QI[::-1], _WEBP_CAL_QUALITY[::-1])
    return int(np.clip(round(float(q)), 0, 100))


def estimate_quality(path: Union[str, os.PathLike]) -> Optional[int]:
    """Best-effort quality estimate for a compressed image file: exact for
    JPEG (quantization tables), approximate for lossy WebP (quantizer
    index), None otherwise (PNG, lossless WebP, AVIF...)."""
    from ddpm_image_restoration_tpu.codecs.quality import estimate_jpeg_quality

    try:
        with open(path, "rb") as f:
            head = f.read(16)
    except OSError:
        return None
    if head[:3] == b"\xff\xd8\xff":
        return estimate_jpeg_quality(path)
    if head[:4] == b"RIFF" and head[8:12] == b"WEBP":
        return estimate_webp_quality(path)
    return None
