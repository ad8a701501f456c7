"""The JAX encoder must be bit-exact with the golden codec: same streams,
same reconstructions, and streams must still pass libavcodec conformance."""

import numpy as np
import pytest

from tpuh264.core.params import PPS, SPS
from tpuh264.entropy import pack
from tpuh264.golden import codec
from tpuh264.kernels import iframe
from tests.test_golden_codec import synth_frame


def jax_encode_stream(y, u, v, qp):
    """Encode one frame via the TPU path; returns (annexb, recon planes)."""
    h, w = y.shape
    sps = SPS.for_size(w, h)
    pps = PPS()
    yb = np.asarray(y, np.int32)[None]
    ub = np.asarray(u, np.int32)[None]
    vb = np.asarray(v, np.int32)[None]
    symbols, recon = iframe.encode_iframe_rows(yb, ub, vb, qp)
    n = sps.mb_width * sps.mb_height
    mb_info = np.stack(
        [
            np.asarray(symbols.mode[0]).reshape(n),
            np.asarray(symbols.cmode[0]).reshape(n),
            np.asarray(symbols.cbp_luma[0]).reshape(n),
            np.asarray(symbols.cbp_chroma[0]).reshape(n),
        ],
        axis=1,
    ).astype(np.int32)
    stream = pack.pack_iframe(
        mb_info,
        np.asarray(symbols.luma_dc[0]).reshape(n, 16),
        np.asarray(symbols.luma_ac[0]).reshape(n, 16, 16),
        np.asarray(symbols.chroma_dc[0]).reshape(n, 2, 4),
        np.asarray(symbols.chroma_ac[0]).reshape(n, 2, 4, 15),
        sps,
        pps,
        qp,
        slice_mode="rows",
    )
    return stream, tuple(np.asarray(p[0]) for p in recon)


@pytest.mark.parametrize("qp", [0, 18, 28, 40, 51])
def test_jax_encoder_matches_golden_stream(qp):
    y, u, v = synth_frame(48, 80, seed=qp, kind="gradient")
    golden_stream, (gy, gu, gv) = codec.encode_iframe(
        y, u, v, qp=qp, slice_mode="rows"
    )
    jax_stream, (jy, ju, jv) = jax_encode_stream(y, u, v, qp)
    np.testing.assert_array_equal(jy, gy)
    np.testing.assert_array_equal(ju, gu)
    np.testing.assert_array_equal(jv, gv)
    assert jax_stream == golden_stream


def test_jax_encoder_matches_golden_noise():
    y, u, v = synth_frame(32, 48, seed=3, kind="noise")
    golden_stream, _ = codec.encode_iframe(y, u, v, qp=24, slice_mode="rows")
    jax_stream, _ = jax_encode_stream(y, u, v, qp=24)
    assert jax_stream == golden_stream


@pytest.mark.parametrize("qp", [10, 30])
def test_parse_then_tpu_decode_roundtrip(qp):
    y, u, v = synth_frame(48, 64, seed=qp + 1)
    stream, (ry, ru, rv) = codec.encode_iframe(y, u, v, qp=qp, slice_mode="rows")
    sps, pps, qp2, mb_info, ldc, lac, cdc, cac, i4m = pack.parse_iframe(stream)
    assert qp2 == qp
    r, c = sps.mb_height, sps.mb_width
    symbols = iframe.MBSymbols(
        mode=mb_info[:, 0].reshape(1, r, c),
        cmode=mb_info[:, 1].reshape(1, r, c),
        cbp_luma=mb_info[:, 2].reshape(1, r, c),
        cbp_chroma=mb_info[:, 3].reshape(1, r, c),
        luma_dc=ldc.reshape(1, r, c, 16),
        luma_ac=lac.reshape(1, r, c, 16, 16),
        chroma_dc=cdc.reshape(1, r, c, 2, 4),
        chroma_ac=cac.reshape(1, r, c, 2, 4, 15),
    )
    dy, du, dv = iframe.decode_iframe_rows(symbols, qp)
    np.testing.assert_array_equal(np.asarray(dy[0]), ry)
    np.testing.assert_array_equal(np.asarray(du[0]), ru)
    np.testing.assert_array_equal(np.asarray(dv[0]), rv)


def test_pack_parse_inverse():
    y, u, v = synth_frame(48, 64, seed=5)
    stream, _ = codec.encode_iframe(y, u, v, qp=26, slice_mode="rows")
    sps, pps, qp, mb_info, ldc, lac, cdc, cac, i4m = pack.parse_iframe(stream)
    restream = pack.pack_iframe(mb_info, ldc, lac, cdc, cac, sps, pps, qp)
    assert restream == stream


def test_batched_streams_identical():
    # batching over S streams must not change per-stream results
    frames = [synth_frame(32, 48, seed=i) for i in range(3)]
    yb = np.stack([f[0] for f in frames]).astype(np.int32)
    ub = np.stack([f[1] for f in frames]).astype(np.int32)
    vb = np.stack([f[2] for f in frames]).astype(np.int32)
    symbols, recon = iframe.encode_iframe_rows(yb, ub, vb, 28)
    for i, (y, u, v) in enumerate(frames):
        s1, r1 = iframe.encode_iframe_rows(y[None].astype(np.int32),
                                           u[None].astype(np.int32),
                                           v[None].astype(np.int32), 28)
        np.testing.assert_array_equal(np.asarray(recon[0][i]), np.asarray(r1[0][0]))
        np.testing.assert_array_equal(
            np.asarray(symbols.luma_dc[i]), np.asarray(s1.luma_dc[0])
        )
