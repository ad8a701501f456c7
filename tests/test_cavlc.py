import numpy as np
import pytest

from tpuh264.core.bitstream import BitReader, BitWriter
from tpuh264.entropy.cavlc import decode_residual_block, encode_residual_block
from tpuh264.entropy import cavlc_tables


def roundtrip(coeffs, nC, max_coeffs):
    w = BitWriter()
    encode_residual_block(w, coeffs, nC, max_coeffs)
    w.rbsp_trailing_bits()
    r = BitReader(w.get_bytes())
    out = decode_residual_block(r, nC, max_coeffs)
    assert out == list(coeffs)[:max_coeffs], (coeffs, out, nC)
    return w


def test_empty_block():
    for nC in (-1, 0, 1, 2, 3, 4, 7, 8, 16):
        mx = 4 if nC == -1 else 16
        roundtrip([0] * mx, nC, mx)


def test_known_simple_blocks():
    # single trailing one in position 0, nC=0: coeff_token T=1,T1=1 -> '01',
    # sign '0', no total_zeros needed? T<max so total_zeros coded: tz=0 -> '1'.
    w = roundtrip([1] + [0] * 15, 0, 16)
    assert w.bit_length == 8  # 01 0 1 + stop bit 1 + pad -> 5 bits -> 1 byte


def test_dense_block():
    coeffs = [3, -2, 5, 1, -1, 1, 0, 0, 2, 0, 0, 0, 1, 0, -4, 2]
    for nC in (-1, 0, 2, 4, 8):
        mx = 4 if nC == -1 else 16
        roundtrip(coeffs[:mx], nC, mx)


def test_full_blocks():
    rng = np.random.default_rng(1)
    for nC, mx in [(0, 16), (2, 16), (5, 15), (9, 16), (-1, 4)]:
        coeffs = rng.integers(1, 5, mx) * rng.choice([-1, 1], mx)
        roundtrip(list(map(int, coeffs)), nC, mx)


def test_large_levels():
    # exercise escape codes incl. prefix >= 16
    for level in (2, 14, 15, 16, 30, 100, 2048, 4127, 4128, 8000, 20000):
        for nC in (0, 4):
            roundtrip([level, 0, -level] + [0] * 13, nC, 16)


@pytest.mark.parametrize("nC,max_coeffs", [(-1, 4), (0, 16), (1, 16), (2, 16),
                                           (3, 16), (4, 16), (7, 15), (8, 16),
                                           (20, 16), (0, 15)])
def test_fuzz_roundtrip(nC, max_coeffs):
    rng = np.random.default_rng(42 + nC * 31 + max_coeffs)
    for trial in range(400):
        density = rng.uniform(0, 1)
        mask = rng.uniform(0, 1, max_coeffs) < density
        mags = rng.choice(
            [1, 1, 1, 2, 3, 7, 30, 200], size=max_coeffs, p=[.35, .2, .15, .1, .08, .06, .04, .02]
        )
        signs = rng.choice([-1, 1], max_coeffs)
        coeffs = (mask * mags * signs).astype(int).tolist()
        roundtrip(coeffs, nC, max_coeffs)


def test_dense_tables_consistency():
    ct = cavlc_tables.coeff_token_dense()
    assert ct[0, 0, 0] == (1 << 16) | 1
    assert ct[3, 16, 3] == (6 << 16) | 63
    assert ct[4, 4, 3] == (7 << 16) | 0
    tz = cavlc_tables.total_zeros_dense()
    assert tz[0, 0] == (1 << 16) | 1
    rb = cavlc_tables.run_before_dense()
    assert rb[0, 0] == (1 << 16) | 1
    assert rb[6, 14] == (11 << 16) | 1


def test_codes_are_prefix_free():
    # every VLC table must be prefix-free or decoding is ambiguous
    def check(codes):
        codes = [(ln, bits) for ln, bits in codes]
        for i, (l1, b1) in enumerate(codes):
            for j, (l2, b2) in enumerate(codes):
                if i == j:
                    continue
                if l1 <= l2 and (b2 >> (l2 - l1)) == b1:
                    raise AssertionError(f"{(l1, b1)} prefixes {(l2, b2)}")

    for table in cavlc_tables.COEFF_TOKEN_TABLES[:3] + (cavlc_tables.COEFF_TOKEN_TABLES[4],):
        check(table.values())
    for row in cavlc_tables.TOTAL_ZEROS:
        check(row)
    for row in cavlc_tables.TOTAL_ZEROS_CHROMA_DC:
        check(row)
    for row in cavlc_tables.RUN_BEFORE:
        check(row)
