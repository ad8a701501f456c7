"""Multi-reference DPB + 3-layer temporal SVC (golden): libavcodec
bit-exactness, self-decode, and temporal-layer extraction."""

import numpy as np
import pytest

from tpuh264.core import nal as NAL
from tpuh264.core.bitstream import BitReader
from tpuh264.golden import codec as gc
from tpuh264.conformance import decode_with_libav, libav_available
from tests.test_golden_pframe import moving_sequence

pytestmark = pytest.mark.skipif(not libav_available(), reason="no libav")


def _units(stream):
    return stream.split(b"\x00\x00\x00\x01")[1:]


def test_multiref_two_refs_bit_exact():
    frames = moving_sequence(48, 64, 7, seed=5)
    stream, recons = gc.encode_sequence(frames, qp=30, num_ref=2)
    lv = decode_with_libav(stream)
    ours = gc.decode_annexb_seq(stream)
    for d, o, r in zip(lv, ours, recons):
        np.testing.assert_array_equal(d[0], r[0][:48, :64])
        np.testing.assert_array_equal(o[0], r[0][:48, :64])


def test_multiref_three_refs_bit_exact():
    frames = moving_sequence(48, 64, 6, seed=9)
    stream, recons = gc.encode_sequence(frames, qp=26, num_ref=3)
    lv = decode_with_libav(stream)
    for d, r in zip(lv, recons):
        np.testing.assert_array_equal(d[0], r[0][:48, :64])


def test_temporal_3layer_full_and_extracted():
    frames = moving_sequence(48, 64, 9, seed=5)
    stream, recons = gc.encode_sequence(frames, qp=30, temporal_layers=3)
    lv = decode_with_libav(stream)
    assert len(lv) == len(frames)
    for d, r in zip(lv, recons):
        np.testing.assert_array_equal(d[0], r[0][:48, :64])

    # drop T2 (the only non-reference slices): 1/2-rate substream
    out = bytearray()
    for u in _units(stream):
        ntype = u[0] & 0x1F
        ridc = (u[0] >> 5) & 3
        if ntype == NAL.NAL_SLICE_NON_IDR and ridc == 0:
            continue
        out += b"\x00\x00\x00\x01" + u
    lv2 = decode_with_libav(bytes(out))
    want = [recons[i] for i in range(len(recons)) if i % 2 == 0]
    assert len(lv2) == len(want)
    for d, r in zip(lv2, want):
        np.testing.assert_array_equal(d[0], r[0][:48, :64])

    # base layer only: additionally drop T1 (odd-indexed reference P
    # frames); T0 frames reference across them via ref_idx 1
    out = bytearray()
    p_i = -1
    for u in _units(stream):
        ntype = u[0] & 0x1F
        ridc = (u[0] >> 5) & 3
        if ntype in (NAL.NAL_SPS, NAL.NAL_PPS, NAL.NAL_SLICE_IDR):
            out += b"\x00\x00\x00\x01" + u
            continue
        if ntype == NAL.NAL_SLICE_NON_IDR and ridc > 0:
            r = BitReader(NAL.unescape_rbsp(u[1:]))
            if r.ue() == 0:  # first_mb_in_slice == 0: new frame
                p_i += 1
            if p_i % 2 == 1:  # T0 (ref P frames alternate T1, T0, ...)
                out += b"\x00\x00\x00\x01" + u
    lv3 = decode_with_libav(bytes(out))
    want = [recons[i] for i in range(len(recons)) if i % 4 == 0]
    assert len(lv3) == len(want)
    for d, r in zip(lv3, want):
        np.testing.assert_array_equal(d[0], r[0][:48, :64])


def test_multiref_with_deblock():
    frames = moving_sequence(48, 64, 5, seed=2)
    stream, recons = gc.encode_sequence(frames, qp=38, num_ref=2,
                                        deblock=True)
    lv = decode_with_libav(stream)
    for d, r in zip(lv, recons):
        np.testing.assert_array_equal(d[0], r[0][:48, :64])


def _engine_drive(**kw):
    import jax
    from tpuh264.engine import CodecConfig, EncoderSession
    from tpuh264.engine.decoder import DecoderSession

    frames = moving_sequence(48, 64, 9, seed=11)
    enc = EncoderSession(CodecConfig(width=64, height=48, qp=30,
                                     gop_size=30, **kw))
    dec = DecoderSession()
    full = bytearray()
    recs = []
    for (y, u, v) in frames:
        f = enc.encode_frame_yuv(y[None], u[None], v[None])
        recs.append(np.asarray(enc.recon[0][0])[:48, :64])
        out = dec.decode(f[0].data)
        assert out is not None and not dec.needs_keyframe
        np.testing.assert_array_equal(out[0], recs[-1])
        full += f[0].data
    lv = decode_with_libav(bytes(full))
    assert len(lv) == len(frames)
    for d, r in zip(lv, recs):
        np.testing.assert_array_equal(d[0], r)


def test_engine_multiref_search():
    _engine_drive(num_ref_frames=2)


def test_engine_multiref_deblock():
    _engine_drive(num_ref_frames=3, deblock=True)


def test_engine_temporal_3layer():
    _engine_drive(temporal_layers=3)


def test_engine_temporal_3layer_cabac_deblock():
    _engine_drive(temporal_layers=3, cabac=True, deblock=True)


def test_engine_multiref_cabac():
    _engine_drive(num_ref_frames=2, cabac=True)
