"""Pallas CAVLC pack kernel vs the XLA block_slots/pack_slots reference.

Runs in interpret mode on CPU; on TPU hardware the same kernel compiles
natively (exercised by the devpipe/bench path).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from tpuh264.kernels import cavlc_pallas, entropy_tpu


def _reference(levels, nc, maxc, hdr_len, hdr_val, n_w):
    sl, sv, _ = entropy_tpu.block_slots(levels, nc, maxc)
    sl = jnp.concatenate([jnp.asarray(hdr_len), sl], axis=-1)
    sv = jnp.concatenate([jnp.asarray(hdr_val), sv], axis=-1)
    return entropy_tpu.pack_slots(sl, sv, n_w)


def _rand_case(rng, n, maxc_choices=(16, 15, 4), sparse=0.8, amp=6):
    levels = rng.integers(-amp, amp + 1, size=(n, 16)).astype(np.int32)
    levels[rng.random((n, 16)) < sparse] = 0
    maxc = rng.choice(maxc_choices, size=(n,)).astype(np.int32)
    for i in range(n):
        levels[i, maxc[i]:] = 0
    nc = rng.integers(0, 17, size=(n,)).astype(np.int32)
    nc[maxc == 4] = -1
    hdr_len = rng.integers(0, 10, size=(n, 3)).astype(np.int32)
    hdr_val = np.where(
        hdr_len > 0, rng.integers(0, 1 << 9, size=(n, 3)), 0
    ).astype(np.int32)
    hdr_val &= (1 << hdr_len) - 1
    return levels, nc, maxc, hdr_len, hdr_val


@pytest.mark.parametrize("amp,sparse", [(6, 0.8), (40, 0.5), (2000, 0.6)])
def test_pack_blocks_matches_xla(amp, sparse):
    rng = np.random.default_rng(1234 + amp)
    n = 257  # deliberately not a multiple of the 1024-lane tile
    levels, nc, maxc, hl, hv = _rand_case(rng, n, sparse=sparse, amp=amp)
    ref_w, ref_b = _reference(levels, nc, maxc, hl, hv, 20)
    got_w, got_b = cavlc_pallas.pack_blocks(
        levels, nc, maxc, hl, hv, 20, 3, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(ref_b), np.asarray(got_b))
    # overflowing lanes (bitlen > 32*n_w) have unspecified garbage words
    ok = np.asarray(ref_b) <= 32 * 20
    np.testing.assert_array_equal(
        np.asarray(ref_w)[ok], np.asarray(got_w)[ok]
    )


def test_pack_blocks_stale_header_values_dropped():
    """Zero-length header slots with nonzero values (the P-frame layout)
    must not leak bits."""
    rng = np.random.default_rng(7)
    n = 64
    levels, nc, maxc, hl, hv = _rand_case(rng, n)
    hl[:, 1] = 0
    hv[:, 1] = 0x1FF  # stale value under a dead slot
    ref_w, ref_b = _reference(levels, nc, maxc, hl, np.where(hl > 0, hv, 0), 20)
    got_w, got_b = cavlc_pallas.pack_blocks(
        levels, nc, maxc, hl, hv, 20, 3, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(ref_b), np.asarray(got_b))
    np.testing.assert_array_equal(np.asarray(ref_w), np.asarray(got_w))


def test_pack_blocks_multidim_lead():
    rng = np.random.default_rng(99)
    n = 2 * 3 * 5
    levels, nc, maxc, hl, hv = _rand_case(rng, n)
    ref_w, ref_b = _reference(levels, nc, maxc, hl, hv, 20)
    got_w, got_b = cavlc_pallas.pack_blocks(
        levels.reshape(2, 3, 5, 16), nc.reshape(2, 3, 5),
        maxc.reshape(2, 3, 5), hl.reshape(2, 3, 5, 3),
        hv.reshape(2, 3, 5, 3), 20, 3, interpret=True
    )
    np.testing.assert_array_equal(
        np.asarray(ref_b), np.asarray(got_b).reshape(-1)
    )
    np.testing.assert_array_equal(
        np.asarray(ref_w), np.asarray(got_w).reshape(-1, 20)
    )
