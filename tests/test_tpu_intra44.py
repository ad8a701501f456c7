"""TPU Intra_4x4: the kernel path (kernels/intra44.py + iframe scan with
intra44=True) must be bit-exact with the golden codec and decode
bit-exactly in libavcodec; engine sessions round-trip through the native
entropy engine."""

import numpy as np
import jax.numpy as jnp
import pytest

from tpuh264.core.params import PPS, SPS
from tpuh264.entropy import native, pack
from tpuh264.golden import codec
from tpuh264.golden import intra44 as g44
from tpuh264.kernels import iframe
from tpuh264.kernels import intra44 as k44
from tests.test_golden_codec import psnr, synth_frame


def test_pred_tables_match_oracle():
    rng = np.random.default_rng(7)
    for _ in range(100):
        L = rng.integers(0, 256, 4).astype(np.int32)
        T = rng.integers(0, 256, 4).astype(np.int32)
        TR = rng.integers(0, 256, 4).astype(np.int32)
        X = int(rng.integers(0, 256))
        n = np.concatenate([L, [X], T, TR]).astype(np.int32)
        for l_ok in (False, True):
            for t_ok in (False, True):
                got = k44.pred_all_np(n, l_ok, t_ok)
                for m in g44.available_modes(l_ok, t_ok):
                    want = g44.pred4(m, L, T, TR, X, l_ok, t_ok)
                    np.testing.assert_array_equal(got[m], want)


def _tpu_i44_encode(y, u, v, qp):
    h, w = y.shape
    sps, pps = SPS.for_size(w, h), PPS()
    n = sps.mb_width * sps.mb_height
    sym, recon = iframe.encode_iframe_scan(
        jnp.asarray(y, jnp.int32)[None], jnp.asarray(u, jnp.int32)[None],
        jnp.asarray(v, jnp.int32)[None], jnp.int32(qp), intra44=True,
    )
    mb_info = np.stack(
        [np.asarray(sym.mode[0]).reshape(n),
         np.asarray(sym.cmode[0]).reshape(n),
         np.asarray(sym.cbp_luma[0]).reshape(n),
         np.asarray(sym.cbp_chroma[0]).reshape(n)], axis=1
    ).astype(np.int32)
    args = (
        mb_info,
        np.asarray(sym.luma_dc[0]).reshape(n, 16),
        np.asarray(sym.luma_ac[0]).reshape(n, 16, 16),
        np.asarray(sym.chroma_dc[0]).reshape(n, 2, 4),
        np.asarray(sym.chroma_ac[0]).reshape(n, 2, 4, 15),
    )
    i4m = np.asarray(sym.i4modes[0]).reshape(n, 16)
    stream = pack.pack_iframe(
        *args, sps, pps, qp, slice_mode="rows", i4modes=i4m
    )
    return stream, tuple(np.asarray(p[0]) for p in recon), (args, i4m, sps, pps)


@pytest.mark.parametrize("qp", [20, 32, 44])
def test_tpu_i44_matches_golden_stream(qp):
    y, u, v = synth_frame(48, 80, seed=qp + 3, kind="gradient")
    g_stream, (gy, gu, gv) = codec.encode_iframe(
        y, u, v, qp=qp, slice_mode="rows", intra44=True
    )
    t_stream, (ty, tu, tv), _ = _tpu_i44_encode(y, u, v, qp)
    np.testing.assert_array_equal(ty, gy)
    np.testing.assert_array_equal(tu, gu)
    np.testing.assert_array_equal(tv, gv)
    assert t_stream == g_stream


def test_tpu_i44_noise_content():
    y, u, v = synth_frame(64, 64, seed=9, kind="noise")
    g_stream, _ = codec.encode_iframe(
        y, u, v, qp=30, slice_mode="rows", intra44=True
    )
    t_stream, _, _ = _tpu_i44_encode(y, u, v, 30)
    assert t_stream == g_stream


def test_tpu_i44_decode_roundtrip():
    y, u, v = synth_frame(48, 64, seed=1, kind="gradient")
    stream, (ry, ru, rv), _ = _tpu_i44_encode(y, u, v, 28)
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
        i4modes=jnp.asarray(i4m.reshape(1, r, c, 16)),
    )
    dy, du, dv = iframe.decode_iframe_scan(symbols, jnp.int32(qp),
                                           intra44=True)
    np.testing.assert_array_equal(np.asarray(dy[0]), ry)
    np.testing.assert_array_equal(np.asarray(du[0]), ru)
    np.testing.assert_array_equal(np.asarray(dv[0]), rv)


@pytest.mark.skipif(not native.available(), reason="no toolchain")
def test_native_i44_pack_parse():
    y, u, v = synth_frame(48, 80, seed=12, kind="noise")
    stream, _, (args, i4m, sps, pps) = _tpu_i44_encode(y, u, v, 26)
    nstream = native.pack_iframe(
        *args, sps, pps, 26, slice_mode="rows", i4modes=i4m
    )
    assert nstream == stream
    py = pack.parse_iframe(stream)
    nat = native.parse_iframe(stream)
    for a, b in zip(py[3:], nat[3:]):
        np.testing.assert_array_equal(a, b)


def test_engine_session_i44():
    from tpuh264.engine.decoder import DecoderSession
    from tpuh264.engine.encoder import EncoderSession

    y, u, v = synth_frame(64, 96, seed=4, kind="gradient")
    enc = EncoderSession(width=96, height=64, qp=30, intra44=True,
                         gop_size=1)
    frames = enc.encode_frame_yuv(y[None], u[None], v[None])
    dec = DecoderSession()
    out = dec.decode(frames[0].data)
    assert out is not None and not dec.needs_keyframe
    recon = np.asarray(enc.recon[0][0])[:64, :96]
    np.testing.assert_array_equal(out[0], recon)
    # with the richer mode set, quality at a fixed QP must not regress
    enc16 = EncoderSession(width=96, height=64, qp=30, intra44=False,
                           gop_size=1)
    enc16.encode_frame_yuv(y[None], u[None], v[None])
    r16 = np.asarray(enc16.recon[0][0])[:64, :96]
    assert psnr(recon, y) >= psnr(r16, y) - 0.01


def test_tpu_i44_libav_bit_exact():
    from tpuh264.conformance import decode_with_libav, libav_available

    if not libav_available():
        pytest.skip("libavcodec not available")
    y, u, v = synth_frame(48, 64, seed=77, kind="gradient")
    stream, (ry, ru, rv), _ = _tpu_i44_encode(y, u, v, 33)
    libav = decode_with_libav(stream)
    np.testing.assert_array_equal(libav[0][0], ry[:48, :64])
    np.testing.assert_array_equal(libav[0][1], ru[:24, :32])
    np.testing.assert_array_equal(libav[0][2], rv[:24, :32])
