"""Native (C++) entropy engine must be byte-identical to the Python oracle."""

import numpy as np
import pytest

from tpuh264.core.params import PPS, SPS
from tpuh264.entropy import native, pack
from tpuh264.golden import codec
from tests.test_golden_codec import synth_frame

pytestmark = pytest.mark.skipif(not native.available(), reason="no toolchain")


def _symbols_for(y, u, v, qp, slice_mode="rows"):
    stream, _ = codec.encode_iframe(y, u, v, qp=qp, slice_mode=slice_mode)
    return stream, pack.parse_iframe(stream)


@pytest.mark.parametrize("qp", [0, 20, 30, 47])
@pytest.mark.parametrize("slice_mode", ["rows", "single"])
def test_native_pack_matches_python(qp, slice_mode):
    y, u, v = synth_frame(48, 80, seed=qp, kind="gradient")
    stream, (sps, pps, qp2, *arrays) = _symbols_for(y, u, v, qp, slice_mode)
    py_stream = pack.pack_iframe(*arrays, sps, pps, qp2, slice_mode=slice_mode)
    nat_stream = native.pack_iframe(*arrays, sps, pps, qp2, slice_mode=slice_mode)
    assert py_stream == stream
    assert nat_stream == stream


def test_native_parse_matches_python():
    y, u, v = synth_frame(64, 96, seed=2, kind="noise")
    stream, (sps, pps, qp, *py_arrays) = _symbols_for(y, u, v, 26)
    nat = native.parse_iframe(stream)
    assert (nat[0], nat[1], nat[2]) == (sps, pps, qp)
    for a, b in zip(py_arrays, nat[3:]):
        np.testing.assert_array_equal(a, b)


def test_native_escape_roundtrip():
    from tpuh264.core import nal

    rng = np.random.default_rng(0)
    for _ in range(20):
        raw = bytes(rng.integers(0, 4, rng.integers(1, 400)).astype(np.uint8))
        raw += b"\x80"
        assert native.escape_rbsp(raw) == nal.escape_rbsp(raw)
