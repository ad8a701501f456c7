"""TPU P-frame path must match the golden P codec bit-exactly."""

import numpy as np
import pytest

from tpuh264.core import nal
from tpuh264.core.bitstream import BitReader
from tpuh264.core.params import PPS, SPS
from tpuh264.core.sliceheader import SliceHeader
from tpuh264.entropy import packp
from tpuh264.golden import codec
from tpuh264.kernels import iframe, pframe
from tests.test_golden_pframe import moving_sequence
from tests.test_golden_codec import psnr


def tpu_encode_sequence(frames, qp):
    """IPPP encode via the TPU kernels + host packers; returns stream."""
    h, w = frames[0][0].shape
    sps = SPS.for_size(w, h)
    pps = PPS()
    n = sps.mb_width * sps.mb_height
    out = bytearray()
    ref = None
    recons = []
    for t, (y, u, v) in enumerate(frames):
        yb = np.asarray(y, np.int32)[None]
        ub = np.asarray(u, np.int32)[None]
        vb = np.asarray(v, np.int32)[None]
        if t == 0:
            symbols, recon = iframe.encode_iframe_rows(yb, ub, vb, qp)
            from tpuh264.entropy import pack

            mb_info = np.stack(
                [
                    np.asarray(symbols.mode[0]).reshape(n),
                    np.asarray(symbols.cmode[0]).reshape(n),
                    np.asarray(symbols.cbp_luma[0]).reshape(n),
                    np.asarray(symbols.cbp_chroma[0]).reshape(n),
                ],
                axis=1,
            ).astype(np.int32)
            out += pack.pack_iframe(
                mb_info,
                np.asarray(symbols.luma_dc[0]).reshape(n, 16),
                np.asarray(symbols.luma_ac[0]).reshape(n, 16, 16),
                np.asarray(symbols.chroma_dc[0]).reshape(n, 2, 4),
                np.asarray(symbols.chroma_ac[0]).reshape(n, 2, 4, 15),
                sps, pps, qp, slice_mode="rows",
            )
        else:
            symbols, recon, _motion = pframe.encode_pframe_rows(
                yb, ub, vb, ref[0], ref[1], ref[2], qp
            )
            s = symbols
            mb_info = np.zeros((n, 8), np.int32)
            mb_info[:, 0] = np.asarray(s.kind[0]).reshape(n)
            mb_info[:, 1] = np.asarray(s.mode[0]).reshape(n)
            mb_info[:, 2] = np.asarray(s.cmode[0]).reshape(n)
            mb_info[:, 3] = np.asarray(s.cbp_luma[0]).reshape(n)
            mb_info[:, 4] = np.asarray(s.cbp_chroma[0]).reshape(n)
            mb_info[:, 5] = np.asarray(s.mvdx[0]).reshape(n)
            mb_info[:, 6] = np.asarray(s.mvdy[0]).reshape(n)
            out += packp.pack_pframe(
                mb_info,
                np.asarray(s.luma_dc[0]).reshape(n, 16),
                np.asarray(s.luma_ac[0]).reshape(n, 16, 16),
                np.asarray(s.chroma_dc[0]).reshape(n, 2, 4),
                np.asarray(s.chroma_ac[0]).reshape(n, 2, 4, 15),
                sps, pps, qp, slice_mode="rows", frame_num=t,
            )
        ref = tuple(r.astype(np.int32) for r in recon)
        recons.append(tuple(np.asarray(r[0]) for r in recon))
    return bytes(out), recons


@pytest.mark.parametrize("qp", [24, 34])
def test_tpu_pframe_matches_golden_stream(qp):
    frames = moving_sequence(48, 64, 3, seed=5)
    golden_stream, golden_recons = codec.encode_sequence(frames, qp=qp)
    tpu_stream, tpu_recons = tpu_encode_sequence(frames, qp)
    for t in range(3):
        np.testing.assert_array_equal(tpu_recons[t][0], golden_recons[t][0])
        np.testing.assert_array_equal(tpu_recons[t][1], golden_recons[t][1])
        np.testing.assert_array_equal(tpu_recons[t][2], golden_recons[t][2])
    assert tpu_stream == golden_stream


def test_tpu_pframe_decode_roundtrip():
    frames = moving_sequence(48, 64, 3, seed=6)
    stream, recons = tpu_encode_sequence(frames, 28)
    # golden decoder agrees
    decoded = codec.decode_annexb_seq(stream)
    for t in range(3):
        np.testing.assert_array_equal(decoded[t][0], recons[t][0])
    # TPU decoder agrees: parse P symbols and reconstruct on device
    sps = pps = None
    ref = None
    t = 0
    pslices = []
    for _, ntype, rbsp in nal.split_annexb(stream):
        if ntype == nal.NAL_SPS:
            sps = SPS.parse(BitReader(rbsp))
        elif ntype == nal.NAL_PPS:
            pps = PPS.parse(BitReader(rbsp))
        elif ntype == nal.NAL_SLICE_IDR:
            if not pslices:
                t = 0
        elif ntype == nal.NAL_SLICE_NON_IDR:
            r = BitReader(rbsp)
            h = SliceHeader.parse(r, sps, pps, False)
            pslices.append((h.frame_num, rbsp, r.bit_position, h.first_mb_in_slice))
    rr, cc = sps.mb_height, sps.mb_width
    ref = tuple(np.asarray(x)[None].astype(np.int32) for x in recons[0])
    for fn in sorted(set(p[0] for p in pslices)):
        group = [(rbsp, bit, fm) for f, rbsp, bit, fm in pslices if f == fn]
        mb_info, ldc, lac, cdc, cac = packp.parse_pframe_slices(group, sps, pps)
        symbols = pframe.MBSymbolsP(
            kind=mb_info[:, 0].reshape(1, rr, cc),
            mode=mb_info[:, 1].reshape(1, rr, cc),
            cmode=mb_info[:, 2].reshape(1, rr, cc),
            cbp_luma=mb_info[:, 3].reshape(1, rr, cc),
            cbp_chroma=mb_info[:, 4].reshape(1, rr, cc),
            mvdx=mb_info[:, 5].reshape(1, rr, cc),
            mvdy=mb_info[:, 6].reshape(1, rr, cc),
            luma_dc=ldc.reshape(1, rr, cc, 16),
            luma_ac=lac.reshape(1, rr, cc, 16, 16),
            chroma_dc=cdc.reshape(1, rr, cc, 2, 4),
            chroma_ac=cac.reshape(1, rr, cc, 2, 4, 15),
        )
        (dy, du, dv), _m = pframe.decode_pframe_rows(symbols, ref[0], ref[1], ref[2], 28)
        np.testing.assert_array_equal(np.asarray(dy[0]), recons[fn][0])
        np.testing.assert_array_equal(np.asarray(du[0]), recons[fn][1])
        np.testing.assert_array_equal(np.asarray(dv[0]), recons[fn][2])
        ref = (np.asarray(dy).astype(np.int32),
               np.asarray(du).astype(np.int32),
               np.asarray(dv).astype(np.int32))


def test_tpu_pframe_libav_conformance():
    frames = moving_sequence(48, 64, 4, seed=7)
    stream, recons = tpu_encode_sequence(frames, 30)
    from tpuh264.conformance import decode_with_libav, libav_available

    if not libav_available():
        pytest.skip("no libav")
    libav = decode_with_libav(stream)
    assert len(libav) == 4
    for t in range(4):
        np.testing.assert_array_equal(libav[t][0], recons[t][0])


@pytest.mark.parametrize("qp", [28])
def test_tpu_pframe_no_intra_matches_golden(qp):
    """intra_in_p=False (the RTC speed preset that removes the encoder's
    last column scan) must match golden encode_pframe(intra_in_p=False)
    bit-exactly, and the stream must stay conformant."""
    frames = moving_sequence(48, 64, 3, seed=9)
    # frame 2 is a scene change: with intra allowed these MBs would pick
    # intra16, so the flag demonstrably changes the encoder's choices
    y2, u2, v2 = frames[2]
    frames[2] = (255 - y2, u2[::-1, :].copy(), v2[:, ::-1].copy())
    h, w = frames[0][0].shape
    sps, pps = SPS.for_size(w, h), PPS()
    n = sps.mb_width * sps.mb_height

    # golden chain
    g_stream = bytearray()
    g_out, g_recon = codec.encode_iframe(*frames[0], qp=qp)
    g_stream += g_out
    ref = g_recon
    for t in (1, 2):
        g_out, g_recon = codec.encode_pframe(
            *frames[t], ref, qp=qp, frame_num=t, intra_in_p=False
        )
        g_stream += g_out
        ref = g_recon

    # kernel chain
    k_stream = bytearray()
    from tpuh264.entropy import pack

    yb, ub, vb = (np.asarray(p, np.int32)[None] for p in frames[0])
    symbols, recon = iframe.encode_iframe_rows(yb, ub, vb, qp)
    mb_info = np.stack(
        [np.asarray(symbols.mode[0]).reshape(n),
         np.asarray(symbols.cmode[0]).reshape(n),
         np.asarray(symbols.cbp_luma[0]).reshape(n),
         np.asarray(symbols.cbp_chroma[0]).reshape(n)], axis=1
    ).astype(np.int32)
    k_stream += pack.pack_iframe(
        mb_info,
        np.asarray(symbols.luma_dc[0]).reshape(n, 16),
        np.asarray(symbols.luma_ac[0]).reshape(n, 16, 16),
        np.asarray(symbols.chroma_dc[0]).reshape(n, 2, 4),
        np.asarray(symbols.chroma_ac[0]).reshape(n, 2, 4, 15),
        sps, pps, qp, slice_mode="rows",
    )
    kref = recon
    for t in (1, 2):
        yb, ub, vb = (np.asarray(p, np.int32)[None] for p in frames[t])
        s_, recon, _m = pframe.encode_pframe_rows_multi(
            yb, ub, vb, kref[0][None], kref[1][None], kref[2][None], qp,
            intra_in_p=False,
        )
        assert int(np.asarray(s_.kind).max()) <= 1  # no intra MBs
        mb_info = np.zeros((n, 8), np.int32)
        for j, k in enumerate(
            ("kind", "mode", "cmode", "cbp_luma", "cbp_chroma",
             "mvdx", "mvdy")
        ):
            mb_info[:, j] = np.asarray(getattr(s_, k)[0]).reshape(n)
        k_stream += packp.pack_pframe(
            mb_info,
            np.asarray(s_.luma_dc[0]).reshape(n, 16),
            np.asarray(s_.luma_ac[0]).reshape(n, 16, 16),
            np.asarray(s_.chroma_dc[0]).reshape(n, 2, 4),
            np.asarray(s_.chroma_ac[0]).reshape(n, 2, 4, 15),
            sps, pps, qp, slice_mode="rows", frame_num=t,
        )
        kref = tuple(r.astype(np.int32) for r in recon)

    assert bytes(k_stream) == bytes(g_stream)
    # conformance: the golden decoder reconstructs it
    decoded = codec.decode_annexb_seq(bytes(k_stream))
    assert len(decoded) == 3
    np.testing.assert_array_equal(decoded[2][0], np.asarray(kref[0][0]))
