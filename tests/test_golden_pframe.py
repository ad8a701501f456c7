"""Golden P-frame codec: internal round-trip + libavcodec conformance."""

import numpy as np
import pytest

from tpuh264.golden import codec
from tpuh264.conformance import decode_with_libav, libav_available
from tests.test_golden_codec import psnr, synth_frame


def moving_sequence(h, w, n, seed=0):
    """Frames with real motion: a shifting gradient + moving blocks."""
    rng = np.random.default_rng(seed)
    base_y, base_u, base_v = synth_frame(h + 32, w + 32, seed=seed)
    frames = []
    for t in range(n):
        dx, dy = 2 * t, t
        y = base_y[dy : dy + h, dx : dx + w].copy()
        # moving square
        sx, sy = 8 + 3 * t, 4 + 2 * t
        y[sy : sy + 12, sx : sx + 12] = 30 + 10 * (t % 3)
        u = base_u[dy // 2 : dy // 2 + h // 2, dx // 2 : dx // 2 + w // 2]
        v = base_v[dy // 2 : dy // 2 + h // 2, dx // 2 : dx // 2 + w // 2]
        frames.append((y, u.copy(), v.copy()))
    return frames


@pytest.mark.parametrize("slice_mode", ["rows", "single"])
def test_pframe_roundtrip(slice_mode):
    frames = moving_sequence(48, 64, 4, seed=1)
    stream, recons = codec.encode_sequence(frames, qp=26, slice_mode=slice_mode)
    decoded = codec.decode_annexb_seq(stream)
    assert len(decoded) == 4
    for t, (dy, du, dv) in enumerate(decoded):
        np.testing.assert_array_equal(dy, recons[t][0][:48, :64])
        np.testing.assert_array_equal(du, recons[t][1][:24, :32])
        np.testing.assert_array_equal(dv, recons[t][2][:24, :32])
        assert psnr(dy, frames[t][0]) > 30


@pytest.mark.skipif(not libav_available(), reason="libavcodec unavailable")
@pytest.mark.parametrize("slice_mode,qp", [("rows", 26), ("single", 30), ("rows", 38)])
def test_pframe_libav_conformance(slice_mode, qp):
    frames = moving_sequence(48, 64, 5, seed=2)
    stream, recons = codec.encode_sequence(frames, qp=qp, slice_mode=slice_mode)
    libav_frames = decode_with_libav(stream)
    assert len(libav_frames) == 5
    ours = codec.decode_annexb_seq(stream)
    for t in range(5):
        np.testing.assert_array_equal(libav_frames[t][0], ours[t][0])
        np.testing.assert_array_equal(libav_frames[t][1], ours[t][1])
        np.testing.assert_array_equal(libav_frames[t][2], ours[t][2])


def test_pframe_compression_beats_iframe():
    frames = moving_sequence(64, 96, 4, seed=3)
    p_stream, _ = codec.encode_sequence(frames, qp=30)
    i_stream = b"".join(
        codec.encode_iframe(*f, qp=30, include_ps=(t == 0))[0]
        for t, f in enumerate(frames)
    )
    # IPPP must be much smaller than all-I on motion-coherent content
    assert len(p_stream) < 0.85 * len(i_stream), (len(p_stream), len(i_stream))


def test_static_scene_is_mostly_skip():
    y, u, v = synth_frame(48, 64, seed=4)
    # first encode an I-frame, then feed its own reconstruction as the
    # following frames: residual is exactly zero => all-skip P slices
    _, (ry, ru, rv) = codec.encode_iframe(y, u, v, qp=30)
    frames = [(y, u, v), (ry, ru, rv), (ry, ru, rv)]
    stream, _ = codec.encode_sequence(frames, qp=30)
    decoded = codec.decode_annexb_seq(stream)
    np.testing.assert_array_equal(decoded[0][0], decoded[2][0])
    # all-skip P slices are a few bytes (header + skip run)
    sizes = []
    from tpuh264.core import nal as nal_mod

    for _, t, rbsp in nal_mod.split_annexb(stream):
        if t == nal_mod.NAL_SLICE_NON_IDR:
            sizes.append(len(rbsp))
    assert sizes and max(sizes) < 16, sizes
