"""On-device CAVLC assembly must be byte-identical to the host packers."""

import numpy as np
import pytest

from tpuh264.core.params import PPS, SPS
from tpuh264.entropy import device_pack
from tpuh264.golden import codec
from tpuh264.kernels import iframe
from tests.test_golden_codec import synth_frame


def encode_symbols(y, u, v, qp):
    yb = np.asarray(y, np.int32)[None]
    ub = np.asarray(u, np.int32)[None]
    vb = np.asarray(v, np.int32)[None]
    return iframe.encode_iframe_rows(yb, ub, vb, qp)


@pytest.mark.parametrize("qp", [0, 20, 30, 45])
def test_device_pack_matches_golden(qp):
    y, u, v = synth_frame(48, 64, seed=qp + 50, kind="gradient")
    golden_stream, _ = codec.encode_iframe(y, u, v, qp=qp, slice_mode="rows")
    symbols, _ = encode_symbols(y, u, v, qp)
    sps = SPS.for_size(64, 48)
    streams, overflow = device_pack.assemble_iframe(symbols, sps, PPS(), qp)
    assert not overflow
    assert streams[0] == golden_stream


def test_device_pack_noise_content():
    y, u, v = synth_frame(32, 48, seed=9, kind="noise")
    for qp in (8, 26):
        golden_stream, _ = codec.encode_iframe(y, u, v, qp=qp, slice_mode="rows")
        symbols, _ = encode_symbols(y, u, v, qp)
        streams, overflow = device_pack.assemble_iframe(
            symbols, SPS.for_size(48, 32), PPS(), qp
        )
        assert not overflow
        assert streams[0] == golden_stream


def test_device_pack_multi_stream():
    frames = [synth_frame(32, 48, seed=i) for i in range(2)]
    yb = np.stack([f[0] for f in frames]).astype(np.int32)
    ub = np.stack([f[1] for f in frames]).astype(np.int32)
    vb = np.stack([f[2] for f in frames]).astype(np.int32)
    symbols, _ = iframe.encode_iframe_rows(yb, ub, vb, 28)
    streams, overflow = device_pack.assemble_iframe(
        symbols, SPS.for_size(48, 32), PPS(), 28
    )
    assert not overflow
    for i, (y, u, v) in enumerate(frames):
        golden_stream, _ = codec.encode_iframe(y, u, v, qp=28, slice_mode="rows")
        assert streams[i] == golden_stream
