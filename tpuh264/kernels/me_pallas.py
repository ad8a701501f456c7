"""Pallas stage-A motion-search kernel: the full-grid SAD table in VMEM.

The integer motion search's first stage evaluates SAD at every offset of
the +-SEARCH_RANGE grid on the stride-2 subsample (the normative search
pattern, golden/inter.py motion_search).  The XLA formulation issues 289
shifted abs-diff + reduction pairs through HBM -- every candidate
re-reads the source and reference, ~6x over the bandwidth roofline at
1080p -- and any XLA-side stride-2 deinterleave of the reference costs
another ~18 ms/frame in lane shuffles.  This kernel avoids both:

  * the reference plane arrives at FULL resolution, split once into
    its two row parities (cheap row-strided slices); one grid step
    (one stream x one MB row) DMAs a 24-row strip of each parity into
    VMEM and every candidate reads from there;
  * the stride-2 COLUMN subsample never materializes: candidates are
    evaluated on full-resolution rows and the per-MB reduction matmul's
    indicator weights are zero on odd lanes, so the MXU does the
    masking for free;
  * the 17 dx candidates of one dy ride the contraction's M axis
    ((17*8, W) @ (W, C) instead of 17 separate M=8 contractions), so
    the MXU runs near full occupancy;
  * |a-b| on 8-bit samples is exact in bfloat16 (values <= 255) and the
    f32 accumulation is exact (sums <= 16320), so the table is
    bit-identical to the int32 reference (tests/test_me_pallas.py).

The former XLA-TPU einsum path this replaces accumulated its row
reduction at effective-bf16 precision on the MXU, drifting up to +-14
from the exact table -- a silent TPU-vs-CPU divergence of the motion
search this kernel also fixes.

This is the codec-interior hot loop the reference outsources to
libopenh264.a's SIMD ME (openh264_wrapper.cpp:351 EncodeFrame); the
candidate grid and rate bias are defined in golden/inter.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..golden.inter import SEARCH_PAD, SEARCH_RANGE

_PE = SEARCH_PAD + 1  # half-pel plane pad (13)
_N = 2 * SEARCH_RANGE + 1  # 17
_NN = _N * _N  # 289


def _kernel(w: int, src_ref, redw_ref, ph_ref, out_ref, strip, dbuf, sem):
    """One (stream, MB row): 289-candidate SAD table [NN, C].

    src_ref [1, 8, w] bf16 (this MB row's even source rows);
    redw_ref [w, C] bf16 (even-lane 8-sample block indicator);
    ph_ref [2, S, HH, WG] int32 in HBM (row-parity split of the G
    plane, parity-major so the hot minor dims keep natural tiling);
    out_ref [1, 1, NN, C] int32.
    """
    s = pl.program_id(0)
    r = pl.program_id(1)
    # the only HBM reads of the whole search: one 24-row strip per row
    # parity (start 8*r keeps the DMAs tile-aligned)
    for par in range(2):
        dma = pltpu.make_async_copy(
            ph_ref.at[par, s, pl.ds(8 * r, 24), :], strip.at[par],
            sem.at[par],
        )
        dma.start()
    for par in range(2):
        pltpu.make_async_copy(
            ph_ref.at[par, s, pl.ds(8 * r, 24), :], strip.at[par],
            sem.at[par],
        ).wait()
    src = src_ref[0]  # [8, w] bf16
    for dy in range(_N):
        oy = _PE - SEARCH_RANGE + dy  # 5..21
        par, r0 = oy & 1, oy >> 1  # r0 in [2, 10], strip-relative
        rows = strip[par, r0:r0 + 8, :].astype(jnp.bfloat16)  # [8, WG]
        # dbuf is DOUBLE-BUFFERED over dy: Mosaic overlaps the MXU
        # contraction of iteration dy with the VPU abs-diff writes of
        # dy+1 WITHOUT proving the write-after-read dependency on a
        # shared buffer (observed as +1-row corruption in the table);
        # alternating buffers makes the overlap safe instead of racy.
        hb = dy % 2
        for dx in range(_N):
            ox = _PE - SEARCH_RANGE + dx
            dbuf[hb, 8 * dx:8 * dx + 8, :] = jnp.abs(
                src - rows[:, ox:ox + w]
            )
        # all 17 dx ride the M axis of one contraction; odd lanes carry
        # |src - ref| garbage that redw's zero weights discard
        t = jnp.dot(dbuf[hb], redw_ref[:],
                    preferred_element_type=jnp.float32)  # [136, C]
        c = t.shape[1]
        red = t.reshape(_N, 8, c).sum(axis=1)  # [17, C]
        out_ref[0, 0, _N * dy:_N * dy + _N, :] = red.astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("h", "w", "interpret"))
def sad_field(y, gplane, h: int, w: int, interpret: bool = False):
    """Stage-A SAD table [S, R, NN, C] from the stride-2 subsample.

    y [S, h, w] int (the FULL-RES source; the kernel reads its even
    rows/columns, so no stride-2 subsample is ever materialized);
    gplane [S, h+2*_PE, w+2*_PE] int (the G half-pel plane, edge-padded
    by _PE).  Bit-identical to the int32 XLA scan formulation in
    kernels/pframe.py _sad_field (which returns [S,R,C,NN]; here the
    candidate axis stays in sublanes and _int_winner(nc=True) consumes
    it directly, avoiding a 37 MB transpose).
    """
    s = y.shape[0]
    r, c = h // 16, w // 16
    h26 = h + 2 * _PE
    wg = (w + 2 * _PE + 127) // 128 * 128  # DMA lane alignment
    # the last MB row's strip DMA reads row-pairs up to 8*(R-1)+24 =
    # h/2+16, three past the plane's h/2+13 -- pad 6 full-res rows so
    # every 24-row DMA stays in bounds (padding rows are never used)
    hh = h // 2 + 16
    g32 = jnp.pad(
        gplane.astype(jnp.int32),
        ((0, 0), (0, 2 * hh - h26), (0, wg - (w + 2 * _PE))),
    )
    # parity-MAJOR split: a [.., 2, W] parity view would put the size-2
    # axis in the sublane-tiled slot (8x padded layout, ~4x the HBM);
    # row-only strided slices keep (rows, lanes) minor and cost ~2.6 ms
    ph = jnp.stack([g32[:, 0::2, :], g32[:, 1::2, :]])  # [2,S,HH,WG]
    # even-lane, per-MB block indicator: lane l contributes to MB l//16
    # iff l is even (the stride-2 column subsample, done by the MXU)
    lanes = np.arange(w)
    red_w = jnp.asarray(
        ((lanes[:, None] // 16) == np.arange(c)[None, :])
        & (lanes[:, None] % 2 == 0),
        jnp.bfloat16,
    )
    y_even = y[:, ::2, :].astype(jnp.bfloat16)  # [S, h/2, w]
    out = pl.pallas_call(
        functools.partial(_kernel, w),
        grid=(s, r),
        in_specs=[
            pl.BlockSpec((1, 8, w), lambda si, ri: (si, ri, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((w, c), lambda si, ri: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((1, 1, _NN, c),
                               lambda si, ri: (si, ri, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((s, r, _NN, c), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((2, 24, wg), jnp.int32),
            pltpu.VMEM((2, 8 * _N, w), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(y_even, red_w, ph)
    return out  # [S, R, NN, C]
