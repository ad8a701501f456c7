"""RD measurement harness sanity (ours vs libx264 at matched bitrate)."""

import numpy as np
import pytest

from tpuh264.bench import quality
from tpuh264.conformance.ffenc import encoder_available
from tpuh264.conformance import libav_available

pytestmark = pytest.mark.skipif(
    not (libav_available() and encoder_available()),
    reason="libavcodec/libx264 unavailable",
)


def test_rd_points_monotone():
    frames = quality.make_sequence(64, 48, 4)
    lo = quality.our_rd_point(frames, qp=20, gop=4)
    hi = quality.our_rd_point(frames, qp=40, gop=4)
    assert lo["bits_per_s"] > hi["bits_per_s"]
    assert lo["psnr"] > hi["psnr"]
    assert lo["psnr"] > 35


def test_x264_anchor_decodes():
    frames = quality.make_sequence(64, 48, 4)
    x = quality.x264_rd_point(frames, 400_000)
    assert x["bytes"] > 0 and 20 < x["psnr"] < 99
