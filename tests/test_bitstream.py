import numpy as np
import pytest

from tpuh264.core.bitstream import BitReader, BitWriter
from tpuh264.core import nal
from tpuh264.core.params import PPS, SPS
from tpuh264.core.sliceheader import SliceHeader


def test_u_roundtrip_random():
    rng = np.random.default_rng(0)
    fields = []
    w = BitWriter()
    for _ in range(1000):
        n = int(rng.integers(1, 25))
        v = int(rng.integers(0, 1 << n))
        fields.append((n, v))
        w.u(n, v)
    w.rbsp_trailing_bits()
    r = BitReader(w.get_bytes())
    for n, v in fields:
        assert r.u(n) == v


def test_ue_se_roundtrip():
    w = BitWriter()
    ues = list(range(0, 300)) + [2**16 - 1, 2**20]
    ses = list(range(-150, 150))
    for v in ues:
        w.ue(v)
    for v in ses:
        w.se(v)
    w.rbsp_trailing_bits()
    r = BitReader(w.get_bytes())
    for v in ues:
        assert r.ue() == v
    for v in ses:
        assert r.se() == v


def test_ue_known_codewords():
    # H.264 9.1 Table 9-1: 0->1, 1->010, 2->011, 3->00100 ...
    for value, bits in [(0, "1"), (1, "010"), (2, "011"), (3, "00100"),
                        (4, "00101"), (5, "00110"), (6, "00111"), (7, "0001000")]:
        w = BitWriter()
        w.ue(value)
        w.u((8 - w.bit_length % 8) % 8, 0)
        got = "".join(f"{b:08b}" for b in w.get_bytes())
        assert got.startswith(bits), (value, got, bits)


def test_rbsp_escape_roundtrip():
    cases = [
        b"\x00\x00\x00",
        b"\x00\x00\x01\x02\x03",
        b"\x00\x00\x02",
        b"\x00\x00\x03\x00\x00\x00",
        bytes(range(256)) * 3,
        b"\x00" * 10,
    ]
    for rbsp in cases:
        esc = nal.escape_rbsp(rbsp)
        # escaped stream must not contain 00 00 0x with x<=3
        for i in range(len(esc) - 2):
            assert not (esc[i] == 0 and esc[i + 1] == 0 and esc[i + 2] <= 2), esc
        assert nal.unescape_rbsp(esc) == rbsp


def test_nal_wrap_split():
    # Real RBSPs always end with the rbsp stop bit => last byte nonzero.
    payloads = [(nal.NAL_SPS, b"\x42\x00\x1e\x00\x00\x01"),
                (nal.NAL_PPS, b"\x00\x00\x00\x80"),
                (nal.NAL_SLICE_IDR, b"\x88\x00\x00\x02\x01\x80")]
    stream = b"".join(nal.wrap_nal(t, p) for t, p in payloads)
    out = list(nal.split_annexb(stream))
    assert [(t, p) for _, t, p in out] == payloads


def test_sps_roundtrip():
    sps = SPS.for_size(854, 480)
    assert sps.mb_width == 54 and sps.mb_height == 30
    assert sps.width == 854 and sps.height == 480
    w = BitWriter()
    sps.write(w)
    parsed = SPS.parse(BitReader(w.get_bytes()))
    assert parsed == sps


def test_sps_high_profile_roundtrip():
    sps = SPS.for_size(1920, 1080, profile_idc=100)
    w = BitWriter()
    sps.write(w)
    parsed = SPS.parse(BitReader(w.get_bytes()))
    assert parsed == sps
    assert parsed.height == 1080 and parsed.crop_bottom == 8


def test_pps_roundtrip():
    pps = PPS(pic_init_qp_minus26=-4, chroma_qp_index_offset=2)
    w = BitWriter()
    pps.write(w)
    assert PPS.parse(BitReader(w.get_bytes())) == pps


@pytest.mark.parametrize("slice_type,idr", [(2, True), (2, False), (0, False)])
def test_slice_header_roundtrip(slice_type, idr):
    sps = SPS.for_size(640, 360)
    pps = PPS()
    h = SliceHeader(
        first_mb_in_slice=40, slice_type=slice_type, frame_num=3 if not idr else 0,
        slice_qp_delta=2,
    )
    w = BitWriter()
    h.write(w, sps, pps, idr)
    w.rbsp_trailing_bits()
    parsed = SliceHeader.parse(BitReader(w.get_bytes()), sps, pps, idr)
    assert parsed == h
