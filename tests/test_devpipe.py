"""Device-resident pipelines end-to-end on the CPU backend.

These drive the same fused programs bench.py runs on the chip (XLA
entropy backend on CPU; the Pallas backend is bit-identity-tested in
test_pallas_entropy / on hardware) and verify the emitted annex-B
against libavcodec and the golden decoder.
"""

import numpy as np
import pytest

from tpuh264.engine import CodecConfig
from tpuh264.engine.devpipe import DevicePipeline, GOPDevicePipeline
from tpuh264.golden import codec as gcodec

try:
    from tpuh264.conformance.ffdec import decode_with_libav

    _HAVE_AV = True
except Exception:  # pragma: no cover
    _HAVE_AV = False


def test_device_pipeline_iframe_stream_decodes():
    pipe = DevicePipeline(CodecConfig(width=64, height=48, qp=30, streams=2))
    for _ in range(2):
        pipe.pump_frame()
    stream = pipe.last_stream
    oy, ou, ov = gcodec.decode_annexb(stream)
    assert oy.shape == (48, 64)
    assert pipe.last_psnr_y > 30
    if _HAVE_AV:
        av = decode_with_libav(stream)
        np.testing.assert_array_equal(np.asarray(av[0][0]), oy)
        np.testing.assert_array_equal(np.asarray(av[0][1]), ou)
        np.testing.assert_array_equal(np.asarray(av[0][2]), ov)


def test_gop_pipeline_ippp_bitexact():
    """12 frames (IDR+P..., crossing a GOP boundary), 2 streams: every
    frame of every stream decodes bit-exactly in the golden decoder and
    libavcodec; deblocking + quarter-pel ME in-loop."""
    pipe = GOPDevicePipeline(
        CodecConfig(width=64, height=48, qp=28, streams=2), gop_size=8
    )
    for _ in range(3):  # dispatches: IDR+3P | 4P | IDR+3P
        pipe.pump_frame()
    assert pipe.last_psnr_y > 30
    n_frames = len(pipe.frame_streams)
    assert n_frames == 12
    for si in range(2):
        stream = pipe.stream_bytes(si)
        ours = gcodec.decode_annexb_seq(stream)
        assert len(ours) == 12
        if _HAVE_AV:
            av = decode_with_libav(stream)
            assert len(av) == 12
            for fi, ((ay, au, av_), (oy, ou, ov)) in enumerate(
                zip(av, ours)
            ):
                np.testing.assert_array_equal(
                    np.asarray(ay), np.asarray(oy), err_msg=f"s{si} f{fi} Y"
                )
                np.testing.assert_array_equal(
                    np.asarray(au), np.asarray(ou), err_msg=f"s{si} f{fi} U"
                )
                np.testing.assert_array_equal(
                    np.asarray(av_), np.asarray(ov), err_msg=f"s{si} f{fi} V"
                )


def test_gop_pipeline_streams_independent():
    """Streams carry different content (per-stream source phase)."""
    pipe = GOPDevicePipeline(
        CodecConfig(width=64, height=48, qp=28, streams=2), gop_size=8
    )
    pipe.pump_frame()
    s0 = pipe.stream_bytes(0)
    s1 = pipe.stream_bytes(1)
    assert s0 != s1
    y0 = gcodec.decode_annexb_seq(s0)[-1][0]
    y1 = gcodec.decode_annexb_seq(s1)[-1][0]
    assert not np.array_equal(y0, y1)


def test_device_pipeline_overflow_host_fallback():
    """QP-0 noise overflows the device entropy bit caps; the pipeline
    must fall back to the host packer and still emit a conformant
    stream (VERDICT r1 next-round item 5)."""
    pipe = DevicePipeline(
        CodecConfig(width=96, height=64, qp=0, streams=1),
        source_kind="noise",
    )
    pipe.pump_frame()
    stream = pipe.last_stream
    assert pipe.fallback_packs > 0, "overflow path was not exercised"
    assert len(pipe.frame_streams) == pipe.FRAMES_PER_DISPATCH
    y, u, v = gcodec.decode_annexb(stream)
    if _HAVE_AV:
        (ay, au, av_), = decode_with_libav(stream)
        np.testing.assert_array_equal(ay, y)
        np.testing.assert_array_equal(au, u)
        np.testing.assert_array_equal(av_, v)


def test_gop_pipeline_overflow_host_fallback():
    """Same for the IPPP GOP pipeline: IDR + P frames repacked on host."""
    pipe = GOPDevicePipeline(
        CodecConfig(width=96, height=64, qp=0, streams=2),
        gop_size=8, source_kind="noise",
    )
    pipe.pump_frame()
    pipe.pump_frame()  # P-only dispatch too
    assert pipe.fallback_packs == 2, "overflow path was not exercised"
    for si in range(2):
        stream = pipe.stream_bytes(si)
        ours = gcodec.decode_annexb_seq(stream)
        assert len(ours) == 8
        if _HAVE_AV:
            av = decode_with_libav(stream)
            assert len(av) == 8
            for fi, ((ay, au, av_), (oy, ou, ov)) in enumerate(zip(av, ours)):
                np.testing.assert_array_equal(ay, oy, err_msg=f"s{si} f{fi} Y")
                np.testing.assert_array_equal(au, ou, err_msg=f"s{si} f{fi} U")
                np.testing.assert_array_equal(av_, ov, err_msg=f"s{si} f{fi} V")
