"""In-loop deblocking: our filtered reconstruction must match libavcodec
bit-exactly (libav applies the normative 8.7 filter)."""

import numpy as np
import pytest

from tpuh264.golden import codec
from tpuh264.conformance import decode_with_libav, libav_available
from tests.test_golden_codec import psnr, synth_frame
from tests.test_golden_pframe import moving_sequence

pytestmark = pytest.mark.skipif(not libav_available(), reason="no libav")


@pytest.mark.parametrize("qp", [24, 32, 40])
@pytest.mark.parametrize("slice_mode", ["rows", "single"])
def test_iframe_deblock_libav_bit_exact(qp, slice_mode):
    y, u, v = synth_frame(48, 64, seed=qp, kind="gradient")
    stream, (ry, ru, rv) = codec.encode_iframe(
        y, u, v, qp=qp, slice_mode=slice_mode, deblock=True
    )
    libav = decode_with_libav(stream)
    np.testing.assert_array_equal(libav[0][0], ry[:48, :64])
    np.testing.assert_array_equal(libav[0][1], ru[:24, :32])
    np.testing.assert_array_equal(libav[0][2], rv[:24, :32])


def test_ippp_deblock_libav_bit_exact():
    frames = moving_sequence(48, 64, 4, seed=9)
    stream, recons = codec.encode_sequence(frames, qp=30, deblock=True)
    libav = decode_with_libav(stream)
    assert len(libav) == 4
    for t in range(4):
        np.testing.assert_array_equal(libav[t][0], recons[t][0][:48, :64])
        np.testing.assert_array_equal(libav[t][1], recons[t][1][:24, :32])
        np.testing.assert_array_equal(libav[t][2], recons[t][2][:24, :32])


def test_our_decoder_matches_deblocked():
    frames = moving_sequence(48, 64, 3, seed=10)
    stream, recons = codec.encode_sequence(frames, qp=34, deblock=True)
    decoded = codec.decode_annexb_seq(stream)
    for t in range(3):
        np.testing.assert_array_equal(decoded[t][0], recons[t][0][:48, :64])


def test_deblock_improves_quality_at_high_qp():
    y, u, v = synth_frame(64, 96, seed=1, kind="gradient")
    _, (ry0, _, _) = codec.encode_iframe(y, u, v, qp=40, deblock=False)
    _, (ry1, _, _) = codec.encode_iframe(y, u, v, qp=40, deblock=True)
    assert not np.array_equal(ry0, ry1)  # the filter actually ran


def test_tc0_high_qp_ippp_libav():
    """Regression: Table 8-18 tc0 rows for qp>=42 (bS 1/2 columns) were
    mistranscribed; only P-frame inter edges at high QP exercise them."""
    import numpy as np
    from tpuh264.conformance import decode_with_libav, libav_available
    from tpuh264.engine import CodecConfig, EncoderSession
    from tpuh264.engine.sources import yuv_frame

    if not libav_available():
        import pytest
        pytest.skip("libavcodec not available")
    frames = [yuv_frame(320, 192, t, seed=0) for t in range(3)]
    for qp in (42, 48, 51):
        enc = EncoderSession(CodecConfig(width=320, height=192, qp=qp,
                                         gop_size=30, deblock=True))
        stream = bytearray()
        recs = []
        for y, u, v in frames:
            stream += enc.encode_frame_yuv(y[None], u[None], v[None])[0].data
            recs.append(np.asarray(enc.recon[0][0])[:192, :320])
        lv = decode_with_libav(bytes(stream))
        for d, r in zip(lv, recs):
            np.testing.assert_array_equal(d[0], r)
