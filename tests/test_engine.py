import numpy as np
import pytest

from tpuh264.engine import (
    CodecConfig,
    DecoderPool,
    EncoderSession,
    FrameRing,
    Pipeline,
    sources,
)
from tpuh264.kernels import color


def psnr(a, b):
    mse = np.mean((np.asarray(a, np.float64) - np.asarray(b, np.float64)) ** 2)
    return 99.0 if mse == 0 else 10 * np.log10(255.0**2 / mse)


def test_encode_decode_session_roundtrip():
    cfg = CodecConfig(width=64, height=48, qp=24)
    enc = EncoderSession(cfg)
    y, u, v = sources.yuv_frame(64, 48, 0)
    frames = enc.encode_frame_yuv(y, u, v)
    assert len(frames) == 1 and frames[0].is_idr
    pool = DecoderPool()
    pool.init_decoder(0)
    out = pool.decode(0, frames[0].data)
    assert out is not None
    dy, du, dv = out
    assert dy.shape == (48, 64)
    assert psnr(dy, y) > 35
    # recon returned by encoder must equal decoder output (enc-dec symmetry)
    np.testing.assert_array_equal(dy, np.asarray(enc.recon[0][0]))


def test_encoder_rgba_path():
    cfg = CodecConfig(width=64, height=48, qp=20)
    enc = EncoderSession(cfg)
    rgba = sources.rgba_frame(64, 48, 0)
    frames = enc.encode_frame(rgba)
    pool = DecoderPool()
    pool.init_decoder(0)
    out = pool.decode(0, frames[0].data)
    y_ref, _, _ = color.rgba_to_yuv420_ref(rgba)
    assert psnr(out[0], y_ref) > 32


def test_color_conversion_matches_scalar_reference():
    rng = np.random.default_rng(0)
    rgba = rng.integers(0, 256, (2, 32, 48, 4)).astype(np.uint8)
    y, u, v = color.rgba_to_yuv420(rgba)
    yr, ur, vr = color.rgba_to_yuv420_ref(rgba)
    np.testing.assert_array_equal(np.asarray(y), yr)
    np.testing.assert_array_equal(np.asarray(u), ur)
    np.testing.assert_array_equal(np.asarray(v), vr)


def test_decoder_pool_limits_and_concealment():
    pool = DecoderPool(max_decoders=32)
    with pytest.raises(IndexError):
        pool.init_decoder(32)
    pool.init_decoder(3)
    # garbage data -> concealment path; no previous frame -> None
    assert pool.decode(3, b"\x00\x00\x01\x65garbage") is None
    assert pool[3].needs_keyframe


def test_frame_ring_sab_semantics():
    ring = FrameRing(pool_size=2, max_frame_size=1024)
    c1 = ring.try_publish(b"frame1", fanout=2)
    assert c1 is not None
    slot, gen = c1
    assert ring.read(slot, gen) == b"frame1"
    c2 = ring.try_publish(b"frame2", fanout=1)
    assert c2 is not None
    # pool wraps to slot 0 which still has refcount 2 -> drop
    assert ring.try_publish(b"frame3", fanout=1) is None
    assert ring.dropped == 1
    ring.release(slot, gen)
    ring.release(slot, gen)
    with pytest.raises(RuntimeError):
        ring.release(slot, gen)  # release without claim
    ring.release(*c2)
    # round-robin advanced past slot 0 on the dropped publish (reference
    # behavior: encoder_worker.js:175-183 increments before the check)
    c3 = ring.try_publish(b"frame4", fanout=1)
    assert c3 is not None and c3 == (1, 2)
    with pytest.raises(RuntimeError):
        ring.release(slot, gen)  # released claim reused -> detected
    with pytest.raises(ValueError):
        ring.try_publish(b"x" * 2048, fanout=1)


def test_pipeline_fanout_and_stats():
    cfg = CodecConfig(width=64, height=48, qp=28, streams=3)
    pipe = Pipeline(cfg)
    for _ in range(4):
        assert pipe.pump_frame()
    assert set(pipe.last_outputs) == {0, 1, 2}
    # all streams decode the same access unit -> identical outputs
    np.testing.assert_array_equal(
        pipe.last_outputs[0][0], pipe.last_outputs[2][0]
    )
    snap = pipe.stats.snapshot(cfg.streams)
    assert snap["input_fps"] > 0
    assert snap["avg_decode_ms"] > 0
    assert pipe.ring.produced == 4


def test_rate_control_converges():
    cfg = CodecConfig(width=64, height=48, bitrate=150_000, fps=30, qp=None)
    enc = EncoderSession(cfg)
    sizes = []
    for t in range(40):
        f = enc.encode_frame_yuv(*sources.yuv_frame(64, 48, t))[0]
        sizes.append(len(f.data))
    target_bpf = cfg.bitrate / cfg.fps / 8
    avg_late = np.mean(sizes[25:])
    assert 0.4 * target_bpf < avg_late < 2.5 * target_bpf, (avg_late, target_bpf)


def test_forced_keyframe_routing():
    cfg = CodecConfig(width=64, height=48, qp=30, streams=1)
    pipe = Pipeline(cfg)
    pipe.pump_frame()
    pipe.decoders[0].needs_keyframe = True
    pipe.pump_frame()
    assert pipe.encoder._force_idr is False  # consumed by the next encode


def test_config_axes():
    cfg = CodecConfig.from_params({"res": "720p", "streams": "8", "threads": "4"})
    assert (cfg.width, cfg.height) == (1280, 720)
    assert cfg.streams == 8 and cfg.threads == 4
    assert cfg.effective_threads() <= 8
    assert CodecConfig(width=854, height=480).resolution_name == "480p"


def test_gop_ippp_roundtrip():
    cfg = CodecConfig(width=64, height=48, qp=26, gop_size=4)
    enc = EncoderSession(cfg)
    from tpuh264.engine import DecoderPool

    pool = DecoderPool()
    pool.init_decoder(0)
    kinds = []
    for t in range(6):
        y, u, v = sources.yuv_frame(64, 48, t)
        f = enc.encode_frame_yuv(y, u, v)[0]
        kinds.append(f.is_idr)
        out = pool.decode(0, f.data)
        assert out is not None and not pool[0].needs_keyframe
        # decoder tracks encoder recon exactly (drift-free loop)
        np.testing.assert_array_equal(out[0], np.asarray(enc._dpb[0][0][0]))
        assert psnr(out[0], y) > 28
    # IDR at t=0 and t=4 (gop_size=4), P frames elsewhere
    assert kinds == [True, False, False, False, True, False]


def test_gop_deblock_roundtrip_libav():
    from tpuh264.conformance import decode_with_libav, libav_available

    cfg = CodecConfig(width=64, height=48, qp=30, gop_size=4, deblock=True)
    enc = EncoderSession(cfg)
    pool = DecoderPool()
    pool.init_decoder(0)
    stream = bytearray()
    outs = []
    for t in range(5):
        y, u, v = sources.yuv_frame(64, 48, t)
        f = enc.encode_frame_yuv(y, u, v)[0]
        stream += f.data
        out = pool.decode(0, f.data)
        assert out is not None and not pool[0].needs_keyframe
        np.testing.assert_array_equal(out[0], np.asarray(enc._dpb[0][0][0]))
        outs.append(out)
    if libav_available():
        libav = decode_with_libav(bytes(stream))
        assert len(libav) == 5
        for t in range(5):
            np.testing.assert_array_equal(libav[t][0], outs[t][0])


def test_temporal_layers_engine_roundtrip():
    from tpuh264.conformance import decode_with_libav, libav_available

    cfg = CodecConfig(width=64, height=48, qp=30, gop_size=6,
                      temporal_layers=2, deblock=True)
    enc = EncoderSession(cfg)
    pool = DecoderPool()
    pool.init_decoder(0)
    stream = bytearray()
    outs = []
    for t in range(6):
        y, u, v = sources.yuv_frame(64, 48, t)
        f = enc.encode_frame_yuv(y, u, v)[0]
        stream += f.data
        out = pool.decode(0, f.data)
        assert out is not None and not pool[0].needs_keyframe
        outs.append(out)
    if libav_available():
        libav = decode_with_libav(bytes(stream))
        assert len(libav) == 6
        for t in range(6):
            np.testing.assert_array_equal(libav[t][0], outs[t][0])


def test_pipeline_libav_impl():
    """impl="libav" runs the same fan-out loop on libx264/libavcodec
    host sessions (the reference's selectable-backend axis,
    app.js:616-692); skipped when libavcodec lacks libx264."""
    import pytest

    from tpuh264.engine import libav_backend
    from tpuh264.engine.pipeline import Pipeline

    if not libav_backend.available():
        pytest.skip("libx264/libavcodec unavailable")
    pipe = Pipeline(CodecConfig(width=128, height=96, streams=2, qp=30),
                    impl="libav")
    ok = 0
    for _ in range(4):
        ok += bool(pipe.pump_frame())
    assert ok == 4
    out = pipe.last_outputs[0]
    assert out is not None and out[0].shape == (96, 128)
    assert pipe.last_outputs[1][0].shape == (96, 128)
    assert pipe.decoders[0].frames_decoded == 4
    snap = pipe.stats.snapshot(2)
    assert snap["bitrate_bps"] > 0


def test_decode_batch_ippp_fanout():
    """P access units batch across the fan-out: every stream's decode of
    an IPPP sequence through decode_batch matches per-session decode
    bit-for-bit (VERDICT r2 item 5: one device call per tick)."""
    import numpy as np

    from tpuh264.engine import CodecConfig
    from tpuh264.engine.decoder import DecoderPool
    from tpuh264.engine.encoder import EncoderSession
    from tpuh264.engine import sources

    cfg = CodecConfig(width=96, height=64, qp=30, gop_size=8)
    enc = EncoderSession(cfg)
    aus = []
    for t in range(4):
        y, u, v = sources.yuv_frame(cfg.width, cfg.height, t, kind="rigid")
        aus.append(enc.encode_frame_yuv(y, u, v)[0].data)

    n_streams = 3
    pool = DecoderPool(8)
    ref = DecoderPool(8)
    for i in range(n_streams):
        pool.init_decoder(i)
    ref.init_decoder(0)

    for au in aus:
        serial = ref.decode(0, au)
        batched = pool.decode_batch([(i, au) for i in range(n_streams)])
        for i in range(n_streams):
            out = batched[i]
            assert out is not None
            for p in range(3):
                np.testing.assert_array_equal(out[p], serial[p])
    assert all(pool[i].frames_decoded == 4 for i in range(n_streams))


def test_decoder_mv_range_guard_falls_back_to_golden():
    """A conformant stream whose MV exceeds the fast-path window bound
    (advisor r3 medium: x264's default ME range is 16 pel; ours is
    ~9.75) must divert to the golden StreamDecoder instead of silently
    motion-compensating from a zeroed window."""
    from tpuh264.engine.decoder import DecoderSession
    from tpuh264.entropy import packp
    from tpuh264.golden import codec as gcodec
    from tpuh264.core.params import PPS, SPS

    w, h = 96, 64
    y, u, v = sources.yuv_frame(w, h, 0)
    i_bytes, _rec = gcodec.encode_iframe(
        np.asarray(y, np.int32), np.asarray(u, np.int32),
        np.asarray(v, np.int32), qp=28,
    )
    sps, pps = SPS.for_size(w, h), PPS()
    r, c = sps.mb_height, sps.mb_width
    n = r * c
    mb_info = np.zeros((n, 8), np.int32)
    mb_info[:, 0] = 1                 # all inter
    mb_info[0, 5] = 4 * 20            # 20-pel MV: beyond the +-10 window
    p_bytes = packp.pack_pframe(
        mb_info,
        np.zeros((n, 16), np.int32), np.zeros((n, 16, 16), np.int32),
        np.zeros((n, 2, 4), np.int32), np.zeros((n, 2, 4, 15), np.int32),
        sps, pps, 28, slice_mode="rows", frame_num=1, deblock_idc=1,
    )
    sess = DecoderSession()
    out_i = sess.decode(i_bytes)
    assert out_i is not None
    out_p = sess.decode(p_bytes)      # must not raise, must not corrupt
    assert out_p is not None
    # golden oracle decode of the same bytes
    exp = gcodec.decode_annexb_seq(i_bytes + p_bytes)[-1]
    np.testing.assert_array_equal(out_p[0], exp[0])
    np.testing.assert_array_equal(out_p[1], exp[1])
    np.testing.assert_array_equal(out_p[2], exp[2])


def test_scene_cut_forces_idr():
    """A P-frame bits spike under rate control restarts the GOP at the
    next dispatch (scene-cut IDR; ForceIntraFrame analog) -- the
    recovery path the RTC preset relies on instead of intra-in-P MBs."""
    from tpuh264.engine.devpipe import GOPDevicePipeline
    from tpuh264.engine.ratecontrol import RateController

    # unit: detector fires on a spike and the spike does not poison the
    # rolling average
    rc = RateController(CodecConfig(qp=None, bitrate=1_000_000))
    assert not rc.p_frame_is_scene_cut(1000)
    for _ in range(5):
        assert not rc.p_frame_is_scene_cut(1100)
    assert rc.p_frame_is_scene_cut(1100 * 10)
    assert not rc.p_frame_is_scene_cut(1100)

    # pipeline: host-fed frames with a hard scene change mid-GOP
    cfg = CodecConfig(width=96, height=64, streams=1, qp=None,
                      bitrate=400_000, intra_in_p=False)
    pipe = GOPDevicePipeline(cfg, gop_size=16, source_kind="host")
    k = pipe.FRAMES_PER_DISPATCH

    def batch(t0, invert=False):
        fr = [sources.yuv_frame(96, 64, t0 + i) for i in range(k)]
        out = []
        for i in range(3):
            p = np.stack([f[i] for f in fr])[:, None]
            out.append(255 - p if invert else p)
        return tuple(out)

    pipe.pump_host_frames(*batch(0))      # IDR + 3P (GOP start)
    pipe.pump_host_frames(*batch(4))      # interior P: learns the avg
    assert pipe._gop_pos == 2
    pipe.pump_host_frames(*batch(8, invert=True))  # scene change
    assert pipe.rc.scene_cuts > 0
    assert pipe._gop_pos == 0             # next dispatch restarts the GOP
    pipe.pump_host_frames(*batch(12, invert=True))
    # the restart dispatch is an IDR access unit (starts with SPS NAL)
    from tpuh264.core import nal as nal_mod

    first_nal_types = [t for _, t, _ in
                       nal_mod.split_annexb(pipe.frame_streams[-4][0])]
    assert nal_mod.NAL_SPS in first_nal_types
