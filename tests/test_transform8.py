"""High-profile 8x8 transform: core bit-exactness, golden conformance
(incl. forced selection to cover the dequant path), CABAC cat-5
residuals, TPU kernel parity, engine drives."""

import types

import numpy as np
import pytest

from tpuh264.golden import codec as gc
from tpuh264.golden import transform8 as T8
from tpuh264.conformance import decode_with_libav, libav_available
from tests.test_golden_pframe import moving_sequence

pytestmark = pytest.mark.skipif(not libav_available(), reason="no libav")


def test_transform8_roundtrip_tracks_qstep():
    rng = np.random.default_rng(0)
    for qp in (0, 12, 24, 36, 51):
        resid = rng.integers(-255, 256, (50, 8, 8)).astype(np.int32)
        z = T8.quant8x8(T8.forward8x8(resid), qp)
        rec = (T8.inverse8x8(T8.dequant8x8(z, qp)) + 32) >> 6
        err = np.abs(rec - resid).max()
        assert err <= 1.3 * 2 ** (qp / 6.0) + 2, (qp, err)
        zz = T8.zigzag8(z)
        np.testing.assert_array_equal(T8.inverse_zigzag8(zz), z)


def _forced_t8_codec():
    code = open("tpuh264/golden/codec.py").read()
    mod = types.ModuleType("gc_forced")
    mod.__dict__["__name__"] = "tpuh264.golden.codec"
    mod.__dict__["__package__"] = "tpuh264.golden"
    exec(compile(code.replace("use_t8 = j8 < j4 and cbp8 > 0",
                              "use_t8 = cbp8 > 0"), "codec.py", "exec"),
         mod.__dict__)
    return mod


@pytest.mark.parametrize("qp", [10, 30, 44])
def test_golden_t8_forced_libav(qp):
    """Every inter MB with coefficients uses the 8x8 transform: full
    coverage of quant/dequant/scan/inverse + CAVLC interleave."""
    mod = _forced_t8_codec()
    frames = moving_sequence(48, 64, 3, seed=5)
    stream, recons = mod.encode_sequence(frames, qp=qp, transform8x8=True)
    lv = decode_with_libav(stream)
    for d, r in zip(lv, recons):
        np.testing.assert_array_equal(d[0], r[0][:48, :64])
    ours = gc.decode_annexb_seq(stream)
    for o, r in zip(ours, recons):
        np.testing.assert_array_equal(o[0], r[0][:48, :64])


def test_golden_t8_forced_deblock_libav():
    mod = _forced_t8_codec()
    frames = moving_sequence(48, 64, 3, seed=9)
    stream, recons = mod.encode_sequence(frames, qp=36, transform8x8=True,
                                         deblock=True)
    lv = decode_with_libav(stream)
    for d, r in zip(lv, recons):
        np.testing.assert_array_equal(d[0], r[0][:48, :64])


def test_golden_t8_rd_selection_libav():
    frames = moving_sequence(48, 64, 5, seed=5)
    for qp in (26, 42):
        stream, recons = gc.encode_sequence(frames, qp=qp, transform8x8=True)
        lv = decode_with_libav(stream)
        for d, r in zip(lv, recons):
            np.testing.assert_array_equal(d[0], r[0][:48, :64])


def _engine_drive_t8(**kw):
    from tpuh264.engine import CodecConfig, EncoderSession
    from tpuh264.engine.decoder import DecoderSession

    frames = moving_sequence(48, 64, 7, seed=11)
    enc = EncoderSession(CodecConfig(width=64, height=48, qp=28,
                                     gop_size=30, cabac=True,
                                     transform8x8=True, **kw))
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


def test_engine_t8():
    _engine_drive_t8()


def test_engine_t8_deblock_multiref():
    _engine_drive_t8(deblock=True, num_ref_frames=2)


def test_cabac_t8_single_coefficient_probes():
    """Hand-built single-coefficient 8x8 MBs: pins the scan mapping and
    dequant scale against libavcodec (the calibration oracle)."""
    from tpuh264.core.params import SPS, PPS, PROFILE_HIGH
    from tpuh264.entropy import cabac_pack
    from tpuh264.kernels import pframe as KP
    import jax.numpy as jnp

    H, W = 48, 64
    sps = SPS.for_size(W, H, profile_idc=PROFILE_HIGH)
    pps = PPS(entropy_coding_mode_flag=1, transform_8x8_mode_flag=1)
    qp = 30
    n = sps.mb_width * sps.mb_height
    rng = np.random.default_rng(3)
    flat = np.full((H, W), 128, np.int32)
    ref = (flat, np.full((H // 2, W // 2), 128, np.int32),
           np.full((H // 2, W // 2), 128, np.int32))
    for scanpos in (0, 1, 7, 30, 63):
        mb_info = np.zeros((n, 8), np.int32)
        mb_info[0] = (1, 0, 0, 15, 0, 0, 0, 0)
        luma_ac = np.zeros((n, 16, 16), np.int16)
        for i8 in range(4):
            luma_ac[0].reshape(256)[64 * i8 + scanpos] = 3 + i8
        t8f = np.zeros(n, np.int32)
        t8f[0] = 1
        sp = cabac_pack.pack_pframe(
            mb_info, np.zeros((n, 16), np.int16), luma_ac,
            np.zeros((n, 2, 4), np.int16), np.zeros((n, 2, 4, 15), np.int16),
            sps, pps, qp, frame_num=1, num_ref_active=1, t8flags=t8f)
        # our TPU decode of the same payload
        rr, cc = sps.mb_height, sps.mb_width
        sy = KP.MBSymbolsP(
            kind=mb_info[:, 0].reshape(1, rr, cc),
            mode=mb_info[:, 1].reshape(1, rr, cc),
            cmode=mb_info[:, 2].reshape(1, rr, cc),
            cbp_luma=mb_info[:, 3].reshape(1, rr, cc),
            cbp_chroma=mb_info[:, 4].reshape(1, rr, cc),
            mvdx=mb_info[:, 5].reshape(1, rr, cc),
            mvdy=mb_info[:, 6].reshape(1, rr, cc),
            luma_dc=np.zeros((1, rr, cc, 16), np.int16),
            luma_ac=luma_ac.reshape(1, rr, cc, 16, 16),
            chroma_dc=np.zeros((1, rr, cc, 2, 4), np.int16),
            chroma_ac=np.zeros((1, rr, cc, 2, 4, 15), np.int16),
            refidx=mb_info[:, 7].reshape(1, rr, cc),
            t8=t8f.reshape(1, rr, cc),
        )
        (dy, du, dv), _ = KP.decode_pframe_rows_multi(
            sy, jnp.asarray(ref[0])[None, None], jnp.asarray(ref[1])[None, None],
            jnp.asarray(ref[2])[None, None], jnp.int32(qp), t8=True)
        # libav decode (IDR flat frame first, CABAC to match the PPS)
        from tpuh264.kernels import iframe as KI
        from tpuh264.entropy import cabac_pack as CB
        sym, recon = KI.encode_iframe_rows(
            jnp.asarray(flat)[None], jnp.asarray(ref[1])[None],
            jnp.asarray(ref[2])[None], jnp.int32(qp))
        mbi = np.stack([np.asarray(sym.mode[0]).reshape(n),
                        np.asarray(sym.cmode[0]).reshape(n),
                        np.asarray(sym.cbp_luma[0]).reshape(n),
                        np.asarray(sym.cbp_chroma[0]).reshape(n)], 1)
        si = CB.pack_iframe(
            mbi.astype(np.int32), np.asarray(sym.luma_dc[0]).reshape(n, 16),
            np.asarray(sym.luma_ac[0]).reshape(n, 16, 16),
            np.asarray(sym.chroma_dc[0]).reshape(n, 2, 4),
            np.asarray(sym.chroma_ac[0]).reshape(n, 2, 4, 15),
            sps, pps, qp)
        # the P frame references our I recon, not the flat source
        sy2 = sy._replace()
        (dy2, _, _), _ = KP.decode_pframe_rows_multi(
            sy2, recon[0][None].astype(jnp.int32),
            recon[1][None].astype(jnp.int32),
            recon[2][None].astype(jnp.int32), jnp.int32(qp), t8=True)
        lv = decode_with_libav(si + sp)
        np.testing.assert_array_equal(lv[1][0], np.asarray(dy2[0])[:H, :W])
