import numpy as np
import pytest

from tpuh264.golden import codec


def synth_frame(h, w, seed=0, kind="gradient"):
    rng = np.random.default_rng(seed)
    if kind == "gradient":
        yy, xx = np.mgrid[0:h, 0:w]
        y = ((xx * 255) // max(w - 1, 1) + (yy * 64) // max(h - 1, 1)) % 256
        y = (y + rng.integers(0, 12, (h, w))).clip(0, 255)
    elif kind == "noise":
        y = rng.integers(0, 256, (h, w))
    elif kind == "flat":
        y = np.full((h, w), 128) + rng.integers(-2, 3, (h, w))
    else:
        raise ValueError(kind)
    u = rng.integers(96, 160, (h // 2, w // 2))
    v = rng.integers(96, 160, (h // 2, w // 2))
    return y.astype(np.int32), u.astype(np.int32), v.astype(np.int32)


def psnr(a, b):
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return 99.0 if mse == 0 else 10 * np.log10(255.0**2 / mse)


@pytest.mark.parametrize("slice_mode", ["rows", "single"])
@pytest.mark.parametrize("qp", [10, 24, 32, 44])
def test_roundtrip_gradient(qp, slice_mode):
    y, u, v = synth_frame(48, 80, seed=qp, kind="gradient")
    stream, (ry, ru, rv) = codec.encode_iframe(y, u, v, qp=qp, slice_mode=slice_mode)
    dy, du, dv = codec.decode_annexb(stream)
    np.testing.assert_array_equal(dy, ry[:48, :80])
    np.testing.assert_array_equal(du, ru[:24, :40])
    np.testing.assert_array_equal(dv, rv[:24, :40])
    # quality sanity: recon should approximate the source at low QP
    if qp <= 24:
        assert psnr(dy, y) > 38, psnr(dy, y)


@pytest.mark.parametrize("kind", ["noise", "flat"])
def test_roundtrip_extreme_content(kind):
    y, u, v = synth_frame(32, 32, seed=7, kind=kind)
    for qp in (0, 16, 40, 51):
        stream, (ry, ru, rv) = codec.encode_iframe(y, u, v, qp=qp)
        dy, du, dv = codec.decode_annexb(stream)
        np.testing.assert_array_equal(dy, ry)
        np.testing.assert_array_equal(du, ru)
        np.testing.assert_array_equal(dv, rv)


def test_roundtrip_cropped_size():
    # non-multiple-of-16 dims exercise SPS cropping + padding
    y, u, v = synth_frame(34, 50, seed=3)
    stream, _ = codec.encode_iframe(y, u, v, qp=28)
    dy, du, dv = codec.decode_annexb(stream)
    assert dy.shape == (34, 50) and du.shape == (17, 25)


def test_lossless_at_qp0_flat():
    # QP0 on smooth content should be near-lossless
    y, u, v = synth_frame(32, 48, seed=1, kind="flat")
    stream, _ = codec.encode_iframe(y, u, v, qp=0)
    dy, du, dv = codec.decode_annexb(stream)
    assert psnr(dy, y) > 48
