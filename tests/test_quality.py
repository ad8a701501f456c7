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


def test_rd_floor_vs_x264_mid_rate():
    """Quality floor vs the external anchor (VERDICT r3 item 7): at the
    mid-rate point our PSNR must be within 2 dB of x264 (veryfast) at
    matched bitrate -- a regression gate, not the parity target (the
    north star is >= reference encoder at matched rate)."""
    frames = quality.make_sequence(320, 192, 6)
    x = quality.x264_rd_point(frames, 500_000)
    ours = [quality.our_rd_point(frames, qp, gop=6) for qp in (24, 26, 28)]
    best = min(ours, key=lambda o: abs(o["bits_per_s"] - x["bits_per_s"]))
    rate_ratio = best["bits_per_s"] / x["bits_per_s"]
    assert 0.6 < rate_ratio < 1.4, f"no comparable rate point: {rate_ratio}"
    assert best["psnr"] >= x["psnr"] - 2.0, (
        f"PSNR floor broken: ours {best['psnr']:.2f} dB at "
        f"{best['bits_per_s']/1e3:.0f} kbps vs x264 {x['psnr']:.2f} dB at "
        f"{x['bits_per_s']/1e3:.0f} kbps"
    )
