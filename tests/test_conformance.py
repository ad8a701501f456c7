"""Conformance: our decoder must agree bit-exactly with libavcodec on our
encoded streams (fills the reference's test void, SURVEY.md section 4)."""

import numpy as np
import pytest

from tpuh264.golden import codec
from tpuh264.conformance import decode_with_libav, libav_available
from tests.test_golden_codec import synth_frame

pytestmark = pytest.mark.skipif(
    not libav_available(), reason="libavcodec not available"
)


def assert_match(stream, dy, du, dv):
    frames = decode_with_libav(stream)
    assert len(frames) == 1
    fy, fu, fv = frames[0]
    np.testing.assert_array_equal(fy, dy)
    np.testing.assert_array_equal(fu, du)
    np.testing.assert_array_equal(fv, dv)


@pytest.mark.parametrize("slice_mode", ["rows", "single"])
@pytest.mark.parametrize("qp", [0, 8, 20, 28, 38, 51])
def test_libav_bit_exact_qp_sweep(qp, slice_mode):
    y, u, v = synth_frame(48, 80, seed=qp + 100, kind="gradient")
    stream, _ = codec.encode_iframe(y, u, v, qp=qp, slice_mode=slice_mode)
    assert_match(stream, *codec.decode_annexb(stream))


@pytest.mark.parametrize("kind", ["noise", "flat", "gradient"])
def test_libav_bit_exact_content(kind):
    y, u, v = synth_frame(64, 96, seed=11, kind=kind)
    stream, _ = codec.encode_iframe(y, u, v, qp=26)
    assert_match(stream, *codec.decode_annexb(stream))


def test_libav_bit_exact_cropped():
    y, u, v = synth_frame(34, 50, seed=2)
    stream, _ = codec.encode_iframe(y, u, v, qp=30)
    assert_match(stream, *codec.decode_annexb(stream))


def test_libav_bit_exact_360p():
    y, u, v = synth_frame(360, 640, seed=9, kind="gradient")
    stream, _ = codec.encode_iframe(y, u, v, qp=30, slice_mode="rows")
    assert_match(stream, *codec.decode_annexb(stream))
