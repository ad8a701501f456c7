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
    py_stream = pack.pack_iframe(*arrays[:5], sps, pps, qp2,
                                 slice_mode=slice_mode, i4modes=arrays[5])
    nat_stream = native.pack_iframe(*arrays[:5], sps, pps, qp2,
                                    slice_mode=slice_mode, i4modes=arrays[5])
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


def test_native_pframe_pack_parse_matches_python():
    from tpuh264.core.bitstream import BitReader
    from tpuh264.core.params import SPS, PPS
    from tpuh264.core.sliceheader import SliceHeader
    from tpuh264.core import nal as nal_mod
    from tpuh264.entropy import packp
    from tpuh264.golden import codec as gc
    from tests.test_golden_pframe import moving_sequence

    frames = moving_sequence(48, 64, 3, seed=11)
    stream, _ = gc.encode_sequence(frames, qp=28)
    sps = pps = None
    groups = {}
    for _, t, rbsp in nal_mod.split_annexb(stream):
        if t == 7:
            from tpuh264.core.params import SPS as S

            sps = S.parse(BitReader(rbsp))
        elif t == 8:
            from tpuh264.core.params import PPS as P

            pps = P.parse(BitReader(rbsp))
        elif t == 1:
            r = BitReader(rbsp)
            h = SliceHeader.parse(r, sps, pps, False)
            groups.setdefault(h.frame_num, []).append(
                (rbsp, r.bit_position, h.first_mb_in_slice)
            )
    for fn, slices in groups.items():
        py = packp.parse_pframe_slices(slices, sps, pps)
        nat = native.parse_pframe_slices(slices, sps, pps)
        for a, b in zip(py, nat):
            np.testing.assert_array_equal(a, b)
        # pack back: native must reproduce the original P slices
        py_stream = packp.pack_pframe(*py, sps, pps, 28, frame_num=fn)
        nat_stream = native.pack_pframe(*nat, sps, pps, 28, frame_num=fn)
        assert py_stream == nat_stream
