"""CABAC entropy backend: engine roundtrip, symbol-array pack/parse
inverse, libavcodec bit-exact conformance, engine session integration."""

import numpy as np
import pytest

from tpuh264.core.params import PPS, SPS, PROFILE_MAIN
from tpuh264.entropy import cabac_pack, pack
from tpuh264.entropy.cabac_arith import CabacDecoder, CabacEncoder
from tpuh264.entropy.cabac_tables import CTX_INIT_I, init_contexts
from tpuh264.golden import codec
from tpuh264.conformance import decode_with_libav, libav_available
from tests.test_golden_codec import synth_frame


def test_arith_engine_roundtrip():
    rng = np.random.default_rng(3)
    for _ in range(10):
        n = int(rng.integers(1, 400))
        kinds = rng.integers(0, 2, n)
        idxs = rng.integers(0, 460, n)
        bits = rng.integers(0, 2, n)
        qp = int(rng.integers(0, 52))
        st, mps = init_contexts(CTX_INIT_I, qp)
        enc = CabacEncoder()
        for k, i, b in zip(kinds, idxs, bits):
            (enc.encode(st, mps, int(i), int(b)) if k == 0
             else enc.bypass(int(b)))
        enc.terminate(1)
        st, mps = init_contexts(CTX_INIT_I, qp)
        dec = CabacDecoder(enc.get_bytes(), 0)
        for k, i, b in zip(kinds, idxs, bits):
            got = (dec.decode(st, mps, int(i)) if k == 0 else dec.bypass())
            assert got == int(b)
        assert dec.terminate() == 1


def _symbols_from_golden(y, u, v, qp, slice_mode, i44):
    gs, recon = codec.encode_iframe(
        y, u, v, qp=qp, slice_mode=slice_mode, intra44=i44
    )
    parsed = pack.parse_iframe(gs)
    return parsed, recon


@pytest.mark.parametrize("qp,kind,i44,sm", [
    (32, "gradient", False, "rows"),
    (26, "noise", False, "single"),
    (30, "gradient", True, "rows"),
    (38, "noise", True, "single"),
    (0, "noise", False, "rows"),
    (51, "gradient", True, "rows"),
])
def test_cabac_pack_parse_roundtrip(qp, kind, i44, sm):
    y, u, v = synth_frame(48, 80, seed=qp + 1, kind=kind)
    (sps, pps, qp2, *arrays), _ = _symbols_from_golden(y, u, v, qp, sm, i44)
    pps_c = PPS(entropy_coding_mode_flag=1)
    sps_c = SPS.for_size(80, 48, profile_idc=PROFILE_MAIN)
    stream = cabac_pack.pack_iframe(
        *arrays[:5], sps_c, pps_c, qp, slice_mode=sm, i4modes=arrays[5]
    )
    parsed = cabac_pack.parse_iframe(stream)
    assert parsed[2] == qp
    for a, b in zip(arrays, parsed[3:]):
        np.testing.assert_array_equal(a, b)


@pytest.mark.skipif(not libav_available(), reason="libavcodec not available")
@pytest.mark.parametrize("qp,i44", [(28, False), (34, True)])
def test_cabac_libav_bit_exact(qp, i44):
    y, u, v = synth_frame(48, 80, seed=qp, kind="noise")
    (sps, pps, qp2, *arrays), (ry, ru, rv) = _symbols_from_golden(
        y, u, v, qp, "rows", i44
    )
    pps_c = PPS(entropy_coding_mode_flag=1)
    sps_c = SPS.for_size(80, 48, profile_idc=PROFILE_MAIN)
    stream = cabac_pack.pack_iframe(
        *arrays[:5], sps_c, pps_c, qp, slice_mode="rows", i4modes=arrays[5]
    )
    lv = decode_with_libav(stream)
    np.testing.assert_array_equal(lv[0][0], ry[:48, :80])
    np.testing.assert_array_equal(lv[0][1], ru[:24, :40])
    np.testing.assert_array_equal(lv[0][2], rv[:24, :40])


def test_cabac_saves_bits_on_noise():
    y, u, v = synth_frame(64, 96, seed=2, kind="noise")
    (sps, pps, qp2, *arrays), _ = _symbols_from_golden(
        y, u, v, 24, "single", False
    )
    cavlc = pack.pack_iframe(*arrays[:5], sps, pps, 24, slice_mode="single",
                             i4modes=arrays[5])
    pps_c = PPS(entropy_coding_mode_flag=1)
    sps_c = SPS.for_size(96, 64, profile_idc=PROFILE_MAIN)
    cabac = cabac_pack.pack_iframe(
        *arrays[:5], sps_c, pps_c, 24, slice_mode="single", i4modes=arrays[5]
    )
    assert len(cabac) < len(cavlc)


def test_engine_session_cabac():
    from tpuh264.engine.decoder import DecoderSession
    from tpuh264.engine.encoder import EncoderSession

    y, u, v = synth_frame(64, 96, seed=6, kind="gradient")
    enc = EncoderSession(width=96, height=64, qp=30, cabac=True,
                         intra44=True, gop_size=1)
    frames = enc.encode_frame_yuv(y[None], u[None], v[None])
    recon = np.asarray(enc.recon[0][0])[:64, :96]
    dec = DecoderSession()
    out = dec.decode(frames[0].data)
    assert out is not None and not dec.needs_keyframe
    np.testing.assert_array_equal(out[0], recon)
    if libav_available():
        lv = decode_with_libav(frames[0].data)
        np.testing.assert_array_equal(lv[0][0], recon)


def test_engine_cabac_ippp_libav():
    """CABAC P slices (skip / inter mvd / intra-in-P) through the engine,
    decoded by us and by libavcodec, all bit-exact with the encoder DPB."""
    from tests.test_golden_pframe import moving_sequence
    from tpuh264.engine.decoder import DecoderSession
    from tpuh264.engine.encoder import EncoderSession

    frames = moving_sequence(48, 64, 5, seed=11)
    enc = EncoderSession(width=64, height=48, qp=28, cabac=True, gop_size=5)
    dec = DecoderSession()
    full = bytearray()
    recons = []
    for (y, u, v) in frames:
        f = enc.encode_frame_yuv(y[None], u[None], v[None])
        recons.append(np.asarray(enc.recon[0][0])[:48, :64])
        out = dec.decode(f[0].data)
        assert out is not None and not dec.needs_keyframe
        np.testing.assert_array_equal(out[0], recons[-1])
        full += f[0].data
    if libav_available():
        lv = decode_with_libav(bytes(full))
        assert len(lv) == len(frames)
        for i, fr in enumerate(lv):
            np.testing.assert_array_equal(fr[0], recons[i])


def test_engine_cabac_ippp_deblock_temporal():
    from tests.test_golden_pframe import moving_sequence
    from tpuh264.engine.decoder import DecoderSession
    from tpuh264.engine.encoder import EncoderSession

    enc = EncoderSession(width=64, height=48, qp=30, cabac=True, gop_size=8,
                         deblock=True, temporal_layers=2)
    dec = DecoderSession()
    full = bytearray()
    recs = []
    for (y, u, v) in moving_sequence(48, 64, 6, seed=3):
        f = enc.encode_frame_yuv(y[None], u[None], v[None])
        recs.append(np.asarray(enc.recon[0][0])[:48, :64])
        out = dec.decode(f[0].data)
        np.testing.assert_array_equal(out[0], recs[-1])
        full += f[0].data
    if libav_available():
        lv = decode_with_libav(bytes(full))
        for i, fr in enumerate(lv):
            np.testing.assert_array_equal(fr[0], recs[i])


@pytest.mark.skipif(not libav_available(), reason="libavcodec not available")
def test_cabac_i44_under_high_profile_pps():
    """I_NxN under a transform_8x8 PPS must code transform_size_8x8_flag
    (7.3.5) -- the packer used to omit it, making any
    cabac+transform8x8+intra44 session stream non-conformant the moment
    an I_4x4 MB was chosen.  libavcodec decoding cleanly (no concealment)
    and the pack/parse inverse both pin the fix."""
    from tpuh264.core.params import PROFILE_HIGH

    mbw, mbh = 5, 3
    n = mbw * mbh
    mb_info = np.zeros((n, 4), np.int32)
    mb_info[:, 0] = 2          # I16 DC
    mb_info[::2, 0] = 4        # alternate I_NxN
    i4m = np.full((n, 16), 2, np.int32)
    ldc = np.zeros((n, 16), np.int64)
    lac = np.zeros((n, 16, 16), np.int64)
    cdc = np.zeros((n, 2, 4), np.int64)
    cac = np.zeros((n, 2, 4, 15), np.int64)
    sps_c = SPS.for_size(80, 48, profile_idc=PROFILE_HIGH)
    pps_c = PPS(entropy_coding_mode_flag=1, transform_8x8_mode_flag=1)
    stream = cabac_pack.pack_iframe(
        mb_info, ldc, lac, cdc, cac, sps_c, pps_c, 30, i4modes=i4m
    )
    ref = decode_with_libav(stream)
    assert len(ref) == 1
    ours = codec.decode_annexb_seq(stream)
    for o, a in zip(ours[0], ref[0]):
        np.testing.assert_array_equal(o, np.asarray(a))
    parsed = cabac_pack.parse_iframe(stream)
    np.testing.assert_array_equal(parsed[3], mb_info)
    np.testing.assert_array_equal(parsed[8][::2], i4m[::2])
