"""Temporal scalability (2-layer): non-reference T1 frames; base layer
must decode standalone; libavcodec stays bit-exact on the full stream."""

import numpy as np
import pytest

from tpuh264.core import nal
from tpuh264.golden import codec
from tpuh264.conformance import decode_with_libav, libav_available
from tests.test_golden_pframe import moving_sequence


def test_temporal_2layer_roundtrip_and_libav():
    frames = moving_sequence(48, 64, 6, seed=20)
    stream, recons = codec.encode_sequence(frames, qp=30, temporal_layers=2)
    decoded = codec.decode_annexb_seq(stream)
    assert len(decoded) == 6
    for t in range(6):
        np.testing.assert_array_equal(decoded[t][0], recons[t][0][:48, :64])
    if libav_available():
        libav = decode_with_libav(stream)
        assert len(libav) == 6
        for t in range(6):
            np.testing.assert_array_equal(libav[t][0], recons[t][0][:48, :64])


def test_temporal_base_layer_decodes_standalone():
    frames = moving_sequence(48, 64, 6, seed=21)
    stream, recons = codec.encode_sequence(frames, qp=30, temporal_layers=2)
    # drop all non-reference NALs (nal_ref_idc == 0): the T0 base layer
    base = bytearray()
    for ridc, ntype, rbsp in nal.split_annexb(stream):
        if ntype in (nal.NAL_SPS, nal.NAL_PPS) or ridc != 0:
            base += nal.wrap_nal(ntype, rbsp, nal_ref_idc=ridc)
    decoded = codec.decode_annexb_seq(bytes(base))
    # base layer = frames 0, 2, 4
    assert len(decoded) == 3
    for i, t in enumerate((0, 2, 4)):
        np.testing.assert_array_equal(decoded[i][0], recons[t][0][:48, :64])
    if libav_available():
        libav = decode_with_libav(bytes(base))
        assert len(libav) == 3
        for i, t in enumerate((0, 2, 4)):
            np.testing.assert_array_equal(libav[i][0], recons[t][0][:48, :64])
