"""Pallas stage-A ME kernel vs the exact XLA/numpy SAD table.

The kernel (kernels/me_pallas.py) replaced both the XLA scan path (CPU)
and the retired XLA-TPU einsum path -- the latter was found to
accumulate its row reduction at effective-bf16 precision on the MXU,
silently drifting up to +-14 from the exact table.  These tests pin the
kernel (interpret mode) and the surviving XLA path to numpy ground
truth, and the nc-layout winner selection to the reference layout.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import tpuh264.kernels.pframe as P
from tpuh264.kernels import me_pallas

SR = P.SEARCH_RANGE
PE = P._PE


def _truth(src2, g, h, w):
    """numpy ground-truth SAD table [S,R,C,NN] (dy-major, dx-minor)."""
    s = src2.shape[0]
    r, c = h // 16, w // 16
    nn = (2 * SR + 1) ** 2
    out = np.zeros((s, r, c, nn), np.int64)
    k = 0
    for dy in range(-SR, SR + 1):
        for dx in range(-SR, SR + 1):
            r2 = g[:, PE + dy:PE + dy + h:2, PE + dx:PE + dx + w:2]
            d = np.abs(src2 - r2)
            out[..., k] = d.reshape(s, r, 8, c, 8).sum((2, 4))
            k += 1
    return out


def _case(s, h, w, seed=0):
    rng = np.random.default_rng(seed)
    y = rng.integers(0, 256, (s, h, w)).astype(np.int32)
    g = np.asarray(P.build_halfpel_planes(jnp.asarray(y))[0])
    return y, g


@pytest.mark.parametrize("s,h,w", [(1, 48, 80), (2, 64, 128)])
def test_pallas_kernel_matches_truth(s, h, w):
    y, g = _case(s, h, w, seed=s)
    got = np.asarray(me_pallas.sad_field(
        jnp.asarray(y), jnp.asarray(g), h, w, interpret=True
    ))  # [S, R, NN, C]
    ref = _truth(y[:, ::2, ::2], g, h, w)
    np.testing.assert_array_equal(got.transpose(0, 1, 3, 2), ref)


def test_xla_scan_path_matches_truth():
    y, g = _case(2, 64, 128, seed=7)
    got = np.asarray(P._sad_field(
        jnp.asarray(y[:, ::2, ::2]), jnp.asarray(g), 64, 128
    ))
    np.testing.assert_array_equal(got, _truth(y[:, ::2, ::2], g, 64, 128))


def test_int_winner_nc_layout_equivalent():
    rng = np.random.default_rng(3)
    s, r, c = 2, 3, 5
    nn = (2 * SR + 1) ** 2
    sads = jnp.asarray(
        rng.integers(0, 5000, (s, r, c, nn)).astype(np.int32)
    )
    lam = P._LAM_ME[30]
    ref = P._int_winner(sads, lam)
    got = P._int_winner(sads.transpose(0, 1, 3, 2), lam, nc=True)
    for a, b in zip(ref, got):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
