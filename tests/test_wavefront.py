"""Wavefront single-slice TPU kernel: bit-exact vs golden 'single' mode,
decode roundtrip, engine integration, libavcodec conformance."""

import numpy as np
import jax.numpy as jnp
import pytest

from tpuh264.core.params import PPS, SPS
from tpuh264.entropy import pack
from tpuh264.golden import codec
from tpuh264.kernels import iframe, wavefront
from tpuh264.conformance import decode_with_libav, libav_available
from tests.test_golden_codec import synth_frame


def _encode(y, u, v, qp):
    h, w = y.shape
    sps, pps = SPS.for_size(w, h), PPS()
    n = sps.mb_width * sps.mb_height
    sym, recon = wavefront.encode_iframe_single(
        jnp.asarray(y, jnp.int32)[None], jnp.asarray(u, jnp.int32)[None],
        jnp.asarray(v, jnp.int32)[None], jnp.int32(qp))
    mb_info = np.stack([np.asarray(sym.mode[0]).reshape(n),
                        np.asarray(sym.cmode[0]).reshape(n),
                        np.asarray(sym.cbp_luma[0]).reshape(n),
                        np.asarray(sym.cbp_chroma[0]).reshape(n)],
                       1).astype(np.int32)
    stream = pack.pack_iframe(
        mb_info,
        np.asarray(sym.luma_dc[0]).reshape(n, 16),
        np.asarray(sym.luma_ac[0]).reshape(n, 16, 16),
        np.asarray(sym.chroma_dc[0]).reshape(n, 2, 4),
        np.asarray(sym.chroma_ac[0]).reshape(n, 2, 4, 15),
        sps, pps, qp, slice_mode="single")
    return stream, tuple(np.asarray(p[0]) for p in recon)


@pytest.mark.parametrize("qp,kind", [(20, "gradient"), (28, "gradient"),
                                     (35, "noise"), (48, "noise")])
def test_wavefront_matches_golden_single(qp, kind):
    y, u, v = synth_frame(48, 80, seed=qp, kind=kind)
    gs, (gy, gu, gv) = codec.encode_iframe(y, u, v, qp=qp,
                                           slice_mode="single")
    ts, (ty, tu, tv) = _encode(y, u, v, qp)
    np.testing.assert_array_equal(ty, gy)
    np.testing.assert_array_equal(tu, gu)
    np.testing.assert_array_equal(tv, gv)
    assert ts == gs


def test_wavefront_decode_roundtrip():
    y, u, v = synth_frame(64, 96, seed=7, kind="gradient")
    stream, (ry, ru, rv) = _encode(y, u, v, 30)
    sps, pps, qp, mbi, ldc, lac, cdc, cac, i4m = pack.parse_iframe(stream)
    r, c = sps.mb_height, sps.mb_width
    symbols = iframe.MBSymbols(
        mode=jnp.asarray(mbi[:, 0].reshape(1, r, c)),
        cmode=jnp.asarray(mbi[:, 1].reshape(1, r, c)),
        cbp_luma=jnp.asarray(mbi[:, 2].reshape(1, r, c)),
        cbp_chroma=jnp.asarray(mbi[:, 3].reshape(1, r, c)),
        luma_dc=jnp.asarray(ldc.reshape(1, r, c, 16)),
        luma_ac=jnp.asarray(lac.reshape(1, r, c, 16, 16)),
        chroma_dc=jnp.asarray(cdc.reshape(1, r, c, 2, 4)),
        chroma_ac=jnp.asarray(cac.reshape(1, r, c, 2, 4, 15)),
    )
    dy, du, dv = wavefront.decode_iframe_single(symbols, jnp.int32(qp))
    np.testing.assert_array_equal(np.asarray(dy[0]), ry)
    np.testing.assert_array_equal(np.asarray(du[0]), ru)
    np.testing.assert_array_equal(np.asarray(dv[0]), rv)


def test_engine_single_mode_conformant():
    """Regression: single-slice engine streams previously reconstructed
    with row-slice prediction and diverged at the decoder."""
    from tpuh264.engine import CodecConfig, EncoderSession
    from tpuh264.engine.decoder import DecoderSession

    y, u, v = synth_frame(96, 128, seed=1, kind="gradient")
    enc = EncoderSession(CodecConfig(width=128, height=96, qp=30,
                                     gop_size=1, slice_mode="single"))
    f = enc.encode_frame_yuv(y[None], u[None], v[None])
    rec = np.asarray(enc.recon[0][0])[:96, :128]
    dec = DecoderSession()
    out = dec.decode(f[0].data)
    np.testing.assert_array_equal(out[0], rec)
    if libav_available():
        lv = decode_with_libav(f[0].data)
        np.testing.assert_array_equal(lv[0][0], rec)


def test_engine_single_cabac():
    from tpuh264.engine import CodecConfig, EncoderSession
    from tpuh264.engine.decoder import DecoderSession

    y, u, v = synth_frame(64, 96, seed=3, kind="noise")
    enc = EncoderSession(CodecConfig(width=96, height=64, qp=26, gop_size=1,
                                     slice_mode="single", cabac=True))
    f = enc.encode_frame_yuv(y[None], u[None], v[None])
    rec = np.asarray(enc.recon[0][0])[:64, :96]
    out = DecoderSession().decode(f[0].data)
    np.testing.assert_array_equal(out[0], rec)
    if libav_available():
        lv = decode_with_libav(f[0].data)
        np.testing.assert_array_equal(lv[0][0], rec)


def test_single_beats_rows_on_gradients():
    """V/Plane modes + no per-row headers: single mode should cost fewer
    bits at equal QP on smooth content."""
    y, u, v = synth_frame(96, 128, seed=5, kind="gradient")
    ss, (ry, _, _) = codec.encode_iframe(y, u, v, qp=30, slice_mode="single")
    rs, (ry2, _, _) = codec.encode_iframe(y, u, v, qp=30, slice_mode="rows")
    assert len(ss) < len(rs)
