"""Intra_4x4: golden round-trip + libavcodec bit-exactness."""

import numpy as np
import pytest

from tpuh264.golden import codec
from tpuh264.conformance import decode_with_libav, libav_available
from tests.test_golden_codec import psnr, synth_frame

pytestmark = pytest.mark.skipif(not libav_available(), reason="no libav")


@pytest.mark.parametrize("qp", [22, 30, 40])
@pytest.mark.parametrize("slice_mode", ["rows", "single"])
def test_i44_libav_bit_exact(qp, slice_mode):
    y, u, v = synth_frame(48, 64, seed=qp + 70, kind="gradient")
    stream, (ry, ru, rv) = codec.encode_iframe(
        y, u, v, qp=qp, slice_mode=slice_mode, intra44=True
    )
    dy, du, dv = codec.decode_annexb(stream)
    np.testing.assert_array_equal(dy, ry[:48, :64])
    libav = decode_with_libav(stream)
    np.testing.assert_array_equal(libav[0][0], ry[:48, :64])
    np.testing.assert_array_equal(libav[0][1], ru[:24, :32])
    np.testing.assert_array_equal(libav[0][2], rv[:24, :32])


def test_i44_improves_quality():
    y, u, v = synth_frame(64, 96, seed=5, kind="gradient")
    s16, (r16, _, _) = codec.encode_iframe(y, u, v, qp=32, intra44=False)
    s44, (r44, _, _) = codec.encode_iframe(y, u, v, qp=32, intra44=True)
    # with the richer mode set, distortion at the same QP must not worsen
    assert psnr(r44[:64, :96], y) >= psnr(r16[:64, :96], y) - 0.01


def test_i44_with_deblock_libav():
    y, u, v = synth_frame(48, 64, seed=8, kind="noise")
    stream, (ry, ru, rv) = codec.encode_iframe(
        y, u, v, qp=34, intra44=True, deblock=True
    )
    libav = decode_with_libav(stream)
    np.testing.assert_array_equal(libav[0][0], ry[:48, :64])
