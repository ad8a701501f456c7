"""TPU deblocking must match the golden filter bit-exactly."""

import numpy as np
import jax.numpy as jnp
import pytest

from tpuh264.golden import codec, deblock as gdeblock
from tpuh264.kernels import deblock as kdeblock, iframe, pframe
from tests.test_golden_codec import synth_frame
from tests.test_golden_pframe import moving_sequence


def test_iframe_deblock_tpu_matches_golden():
    y, u, v = synth_frame(48, 64, seed=3, kind="gradient")
    # golden: encode with deblock (rows) -> filtered recon
    stream, (gy, gu, gv) = codec.encode_iframe(
        y, u, v, qp=32, slice_mode="rows", deblock=True
    )
    # TPU: encode (unfiltered) then TPU filter
    symbols, recon = iframe.encode_iframe_rows(
        np.asarray(y)[None].astype(np.int32),
        np.asarray(u)[None].astype(np.int32),
        np.asarray(v)[None].astype(np.int32),
        jnp.int32(32),
    )
    s, r, c = symbols.mode.shape
    kind = jnp.full((s, r, c), 2, jnp.int32)  # all intra
    zeros = jnp.zeros((s, r, c), jnp.int32)
    nnz = jnp.zeros((s, r, c, 4, 4), jnp.int32)
    fy, fu, fv = kdeblock.deblock_frame_rows(
        recon[0], recon[1], recon[2], kind, zeros, zeros, nnz, jnp.int32(32)
    )
    np.testing.assert_array_equal(np.asarray(fy[0]), gy)
    np.testing.assert_array_equal(np.asarray(fu[0]), gu)
    np.testing.assert_array_equal(np.asarray(fv[0]), gv)


def test_pframe_deblock_tpu_matches_golden():
    frames = moving_sequence(48, 64, 2, seed=12)
    # golden IPPP with deblock
    stream, recons = codec.encode_sequence(frames, qp=30, deblock=True)

    # TPU: frame 0 intra + filter
    def to_b(f):
        return tuple(np.asarray(p)[None].astype(np.int32) for p in f)

    y0, u0, v0 = to_b(frames[0])
    sym0, rec0 = iframe.encode_iframe_rows(y0, u0, v0, jnp.int32(30))
    s, r, c = sym0.mode.shape
    kind0 = jnp.full((s, r, c), 2, jnp.int32)
    zeros = jnp.zeros((s, r, c), jnp.int32)
    nnz0 = jnp.zeros((s, r, c, 4, 4), jnp.int32)
    f0 = kdeblock.deblock_frame_rows(
        rec0[0], rec0[1], rec0[2], kind0, zeros, zeros, nnz0, jnp.int32(30)
    )
    np.testing.assert_array_equal(np.asarray(f0[0][0]), recons[0][0])

    # TPU P frame vs golden (reference = filtered frame 0)
    y1, u1, v1 = to_b(frames[1])
    ref = tuple(x.astype(jnp.int32) for x in f0)
    sym1, rec1, motion = pframe.encode_pframe_rows(
        y1, u1, v1, ref[0], ref[1], ref[2], jnp.int32(30)
    )
    nnz1 = jnp.count_nonzero(
        sym1.luma_ac.astype(jnp.int32), axis=-1
    ).reshape(s, r, c, 4, 4)
    f1 = kdeblock.deblock_frame_rows(
        rec1[0], rec1[1], rec1[2], sym1.kind, motion[0], motion[1],
        nnz1, jnp.int32(30),
    )
    np.testing.assert_array_equal(np.asarray(f1[0][0]), recons[1][0])
    np.testing.assert_array_equal(np.asarray(f1[1][0]), recons[1][1])
    np.testing.assert_array_equal(np.asarray(f1[2][0]), recons[1][2])
