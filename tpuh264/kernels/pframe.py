"""TPU P-frame encoder/decoder core (row-slice parallel, rate-biased ME).

Extends the I-frame scan (kernels/iframe.py) with inter prediction against
a device-resident reference frame -- the DPB lives in HBM and never
crosses the host link (BASELINE.json north star: reference pages stay on
chip).

TPU-first structure (the round-3 redesign): everything inter is computed
BATCHED over all macroblocks at once -- no per-candidate gathers inside a
column scan:

  1. integer motion search = a rate-biased SAD field over the full
     +-SEARCH_RANGE offset grid, evaluated as static shifted-plane
     slices on the stride-2 subsample (pure VPU work, zero gathers),
     then a 3x3 full-resolution refine from per-MB windows;
  2. per-MB reference windows are extracted from statically-built
     3MBx3MB band tensors with two `take_along_axis` calls (measured
     ~free on TPU; the bands are 9 shifted reshapes of the plane);
  3. half/quarter refinement evaluates all 49 reachable quarter-pel
     positions as STATIC window slices (each qpel sample is the average
     of two of the 4 half-pel planes, H.264 8.4.2.2.1) into a cost
     table; the normative two-stage half->quarter selection then runs
     as pure arithmetic on that table;
  4. motion compensation, transforms, quant and inter reconstruction
     are batched [S, R, C] tensor ops;
  5. only the intra-in-P path (left-neighbor reconstruction chain) and
     the final mode selection remain a `lax.scan` over MB columns,
     unrolled several columns per step to amortize loop overhead.

The search criterion is SAD + lambda*rate(mv) (golden/inter.py
LAMBDA_ME/mv_rate_bits): decisions are bit-identical to
tpuh264.golden.codec's P path (tests enforce stream equality via the
shared entropy packers), and the rate bias keeps flat-content ties on
the zero vector so P_Skip stays reachable.

Skip and MV prediction use the row-slice degenerate forms of H.264
8.4.1: with no top neighbors, P_Skip's MV is always zero and the
predictor is the left MB's MV.  The decoder resolves the MV chain with
an associative scan (mv_c = g_c * mv_{c-1} + g_c * mvd_c), so decode MC
is fully batched too.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import transform as T
from . import transform8 as T8
from .iframe import _LAMBDA8, _rate_bits
from .iframe import (
    _blocks_to_mb,
    _cblocks_to_mb,
    _chroma_blocks,
    _encode_luma,
    _luma_blocks,
    _mb_view,
    _mbs_to_plane,
    _pred_chroma,
    _pred_luma,
    _sad,
    _subst_dc,
    _unscan,
)
from ..golden.inter import (
    LAMBDA_ME,
    OFFSETS_HALF,
    OFFSETS_QUARTER,
    QPEL_TBL,
    REFINE_RANGE,
    SEARCH_PAD,
    SEARCH_RANGE,
    mv_rate_bits,
    ref_idx_bits,
)

KIND_SKIP = 0
KIND_INTER = 1
KIND_INTRA = 2

_PE = SEARCH_PAD + 1  # half-pel plane pad (13)
_LAM_ME = jnp.asarray(LAMBDA_ME, jnp.int32)


class MBSymbolsP(NamedTuple):
    """Per-MB P-slice symbols (layout shared with entropy/packp.py)."""

    kind: jnp.ndarray        # [S, R, C] int32 0 skip / 1 inter / 2 intra
    mode: jnp.ndarray        # [S, R, C] int32 intra luma mode
    cmode: jnp.ndarray       # [S, R, C] int32 intra chroma mode
    cbp_luma: jnp.ndarray    # [S, R, C] int32 (intra 0/1, inter 4-bit)
    cbp_chroma: jnp.ndarray  # [S, R, C] int32 0..2
    mvdx: jnp.ndarray        # [S, R, C] int32 quarter-pel
    mvdy: jnp.ndarray        # [S, R, C] int32
    luma_dc: jnp.ndarray     # [S, R, C, 16] int16
    luma_ac: jnp.ndarray     # [S, R, C, 16, 16] int16
    chroma_dc: jnp.ndarray   # [S, R, C, 2, 4] int16
    chroma_ac: jnp.ndarray   # [S, R, C, 2, 4, 15] int16
    refidx: Optional[jnp.ndarray] = None  # [S, R, C] int32 (multi-ref DPB)
    t8: Optional[jnp.ndarray] = None      # [S, R, C] transform_size_8x8


def _tap6(a, b, c, d, e, f):
    return a - 5 * b + 20 * c + 20 * d - 5 * e + f


def build_halfpel_planes(ref: jnp.ndarray, pad: int = SEARCH_PAD):
    """jnp port of golden.inter.build_halfpel_planes: [S,H,W] ->
    4 planes [S, H+2(pad+1), W+2(pad+1)] (G, b, h, j), bit-exact."""
    p_eff = pad + 1
    p3 = p_eff + 3
    r = jnp.pad(ref.astype(jnp.int32), ((0, 0), (p3, p3), (p3, p3)),
                mode="edge")
    b1 = _tap6(r[:, :, :-5], r[:, :, 1:-4], r[:, :, 2:-3], r[:, :, 3:-2],
               r[:, :, 4:-1], r[:, :, 5:])
    h1 = _tap6(r[:, :-5, :], r[:, 1:-4, :], r[:, 2:-3, :], r[:, 3:-2, :],
               r[:, 4:-1, :], r[:, 5:, :])
    j1 = _tap6(b1[:, :-5, :], b1[:, 1:-4, :], b1[:, 2:-3, :], b1[:, 3:-2, :],
               b1[:, 4:-1, :], b1[:, 5:, :])
    g_p = r[:, 3:-3, 3:-3]
    b_p = jnp.clip((b1[:, 3:-3, 1:] + 16) >> 5, 0, 255)
    h_p = jnp.clip((h1[:, 1:, 3:-3] + 16) >> 5, 0, 255)
    j_p = jnp.clip((j1[:, 1:, 1:] + 512) >> 10, 0, 255)
    h2 = ref.shape[1] + 2 * p_eff
    w2 = ref.shape[2] + 2 * p_eff
    return tuple(pl[:, :h2, :w2] for pl in (g_p, b_p, h_p, j_p))


def _pad_ref(plane: jnp.ndarray, pad: int) -> jnp.ndarray:
    """Edge-replicate pad [S, H, W] by `pad` on every side (the normative
    Clip3 sample clamp of 8.4.2.2, materialized once)."""
    return jnp.pad(plane.astype(jnp.int32), ((0, 0), (pad, pad), (pad, pad)),
                   mode="edge")


# vertical reach of inter prediction into a reference, in rows: the halo
# a row-sharded DPB must exchange with each neighbor shard (ICI ppermute)
HALO_Y = SEARCH_PAD + 1   # 13: ME range + refine + subpel + 6-tap margin
HALO_C = SEARCH_PAD // 2 + 2  # 8: chroma eighth-pel reach


def build_halfpel_planes_ext(ref_ext: jnp.ndarray, pad: int = SEARCH_PAD):
    """build_halfpel_planes for a vertically pre-extended reference.

    ref_ext [S, H + 2*(pad+1), W] already carries pad+1 real (or
    edge-replicated) rows above and below the frame -- the halo a
    row-sharded DPB exchanges over ICI.  Only the 6-tap margin is added
    vertically; horizontally the full edge pad is applied as usual.
    Bit-identical to build_halfpel_planes(ref) when the halo rows equal
    the edge-replicated/real continuation rows of the full frame."""
    p_eff = pad + 1
    p3 = p_eff + 3
    r = jnp.pad(ref_ext.astype(jnp.int32), ((0, 0), (3, 3), (p3, p3)),
                mode="edge")
    b1 = _tap6(r[:, :, :-5], r[:, :, 1:-4], r[:, :, 2:-3], r[:, :, 3:-2],
               r[:, :, 4:-1], r[:, :, 5:])
    h1 = _tap6(r[:, :-5, :], r[:, 1:-4, :], r[:, 2:-3, :], r[:, 3:-2, :],
               r[:, 4:-1, :], r[:, 5:, :])
    j1 = _tap6(b1[:, :-5, :], b1[:, 1:-4, :], b1[:, 2:-3, :], b1[:, 3:-2, :],
               b1[:, 4:-1, :], b1[:, 5:, :])
    g_p = r[:, 3:-3, 3:-3]
    b_p = jnp.clip((b1[:, 3:-3, 1:] + 16) >> 5, 0, 255)
    h_p = jnp.clip((h1[:, 1:, 3:-3] + 16) >> 5, 0, 255)
    j_p = jnp.clip((j1[:, 1:, 1:] + 512) >> 10, 0, 255)
    h2 = ref_ext.shape[1]
    w2 = ref_ext.shape[2] + 2 * p_eff
    return tuple(pl[:, :h2, :w2] for pl in (g_p, b_p, h_p, j_p))


def _pad_ref_ext(plane_ext: jnp.ndarray, pad: int) -> jnp.ndarray:
    """Horizontal-only edge pad for a vertically pre-extended chroma
    reference [S, H/2 + 2*pad, W/2]."""
    return jnp.pad(plane_ext.astype(jnp.int32),
                   ((0, 0), (0, 0), (pad, pad)), mode="edge")


# ---------------------------------------------------------------------------
# Banded window machinery: per-MB reference windows without scan gathers.
# ---------------------------------------------------------------------------


def _mb_bands(pl: jnp.ndarray, mb: int) -> jnp.ndarray:
    """[S, (R+2)*mb, (C+2)*mb] plane -> [S, R, C, 3mb, 3mb] per-MB bands.

    Band (r, c) covers the MB tile plus one full tile of margin on every
    side; built from 9 statically shifted reshapes (no gathers)."""
    s = pl.shape[0]
    r = pl.shape[1] // mb - 2
    c = pl.shape[2] // mb - 2
    rows = jnp.concatenate(
        [
            pl[:, mb * k : mb * k + mb * r, :].reshape(s, r, mb, -1)
            for k in range(3)
        ],
        axis=2,
    )  # [S, R, 3mb, Wp]
    cols = jnp.concatenate(
        [
            rows[..., mb * k : mb * k + mb * c].reshape(s, r, 3 * mb, c, mb)
            for k in range(3)
        ],
        axis=-1,
    )  # [S, R, 3mb, C, 3mb]
    return cols.transpose(0, 1, 3, 2, 4)


def _luma_bands(plane: jnp.ndarray, r: int, c: int):
    """Half-pel plane (pad _PE=13) -> [S, R, C, 48, 48] uint8 band.

    The extra 3-sample zero pad lifts the plane to a 16-aligned pad; the
    fabricated samples are never read within the legal MV range
    (|mv| <= SEARCH_RANGE + REFINE_RANGE + 3/4 qpel)."""
    pl = jnp.pad(
        plane.astype(jnp.uint8),
        ((0, 0), (16 - _PE, 16 - _PE), (16 - _PE, 16 - _PE)),
    )
    return _mb_bands(pl, 16)


def _window(band: jnp.ndarray, j0: jnp.ndarray, i0: jnp.ndarray, win: int,
            j_range=None, i_range=None):
    """Per-MB window extraction: band [S,R,C,B,B], j0/i0 [S,R,C] ->
    [S,R,C,win,win] int16.

    TPU-native formulation: a masked sum of STATIC shifted slices over
    the (small, known) offset range, one axis at a time -- XLA fuses
    the whole expression into one pass over the band.  General gathers
    (take_along_axis) measure ~100x slower on TPU for this shape; the
    offset ranges here are 10-20 values, so shift enumeration wins."""
    b = band.shape[-1]
    jlo, jhi = j_range if j_range is not None else (0, b - win)
    ilo, ihi = i_range if i_range is not None else (0, b - win)
    zero = jnp.zeros((), band.dtype)
    # selection stays in the band's (uint8) dtype -- the masks are
    # disjoint, so the sums never overflow and traffic stays 1 B/sample
    rows = sum(
        jnp.where((j0 == d)[..., None, None], band[..., d : d + win, :],
                  zero)
        for d in range(jlo, jhi + 1)
    )  # [S,R,C,win,B]
    # int16 output: window samples are 8-bit, and every consumer (SAD,
    # qpel averaging, MC select) is exact in int16 -- the extracted
    # window tensors are the biggest intermediates of the inter path
    # (w2 at 1080p x4 is 85 MB vs 170 MB in int32), so the dtype IS the
    # HBM bill
    return sum(
        jnp.where((i0 == d)[..., None, None], rows[..., :, d : d + win],
                  zero)
        for d in range(ilo, ihi + 1)
    ).astype(jnp.int16)


_POW2_8 = jnp.asarray([1, 2, 4, 8, 16, 32, 64, 128], jnp.int32)


def _rate_q(vx: jnp.ndarray, vy: jnp.ndarray) -> jnp.ndarray:
    """Vectorized golden.inter.mv_rate_bits (ue(2|v|) lengths summed).
    Exact for |v| <= 127 qpel (the global-MV-relative offsets reach
    ~71)."""

    def one(v):
        x = 2 * jnp.abs(v) + 1
        bl = (x[..., None] >= _POW2_8).sum(-1)
        return 2 * bl - 1

    return one(vx) + one(vy)


# ---------------------------------------------------------------------------
# Motion search (normative pattern defined in golden/inter.py).
# ---------------------------------------------------------------------------


_NN = (2 * SEARCH_RANGE + 1) ** 2
_CAND_D = np.stack(
    np.meshgrid(
        np.arange(-SEARCH_RANGE, SEARCH_RANGE + 1),
        np.arange(-SEARCH_RANGE, SEARCH_RANGE + 1),
        indexing="ij",
    ),
    -1,
).reshape(_NN, 2)  # [NN, (dy, dx)] raster order
_CAND_DY = jnp.asarray(_CAND_D[:, 0])
_CAND_DX = jnp.asarray(_CAND_D[:, 1])
_RATE0 = jnp.asarray(
    [mv_rate_bits(4 * int(dx), 4 * int(dy)) for dy, dx in _CAND_D],
    jnp.int32,
)


def _sad_field(src2, gplane, h, w):
    """Stage-A SAD table: stride-2 SAD at every offset of the
    +-SEARCH_RANGE grid -> [S, R, C, NN] int32, candidate raster order.

    TPU: static shift enumeration over PRE-SPLIT stride-2 phase planes
    (strided slices at 289 offsets lower to pathological copies), with
    the per-MB 8x8-sample reduction as two block-indicator matmuls on
    the MXU -- exact, since |diffs| <= 255 are bf16-representable and
    accumulation is f32.  CPU: a lax.scan over the dy rows (the LLVM
    pipeline chokes on hundreds of sibling strided-slice reductions)."""
    s = src2.shape[0]
    r, c = h // 16, w // 16
    n = 2 * SEARCH_RANGE + 1

    # On TPU the encode path uses the Pallas kernel (me_pallas.sad_field)
    # instead of this function.  The former XLA-TPU einsum branch here
    # was RETIRED in round 5: its row-reduction matmul accumulated at
    # effective-bf16 precision on the MXU, drifting up to +-14 from the
    # exact table (silent TPU-vs-CPU ME divergence; caught by a numpy
    # ground-truth audit, tests/test_me_pallas.py).  The scan
    # formulation below is exact on every backend.

    def body(_, iy):
        rows = jax.lax.dynamic_slice_in_dim(gplane, _PE - SEARCH_RANGE + iy,
                                            h, axis=1)[:, ::2]
        out = []
        for dx in range(-SEARCH_RANGE, SEARCH_RANGE + 1):
            r2 = rows[:, :, _PE + dx : _PE + dx + w : 2]
            out.append(
                jnp.abs(src2 - r2).reshape(s, r, 8, c, 8).sum((2, 4))
            )
        return None, jnp.stack(out, axis=-1)  # [S,R,C,n]

    _, sads = jax.lax.scan(body, None, jnp.arange(n))  # [n,S,R,C,n]
    return jnp.moveaxis(sads, 0, 3).reshape(s, r, c, n * n)


def _int_winner(sads, lam, axis_name=None, nc: bool = False):
    """Two-phase stage-A selection on the SAD table [S,R,C,NN].

    nc=True: the table arrives as [S,R,NN,C] (the Pallas kernel's
    native layout, me_pallas.sad_field) and the selection runs with the
    candidate axis at position 2 -- same results, no 37 MB transpose.

    Phase 1: zero-anchored rate bias -> per-MB winner; per-stream
    global MV = mode of winners (argmax = raster-earliest on ties).
    Phase 2: re-select with the rate measured relative to the global
    vector, so near-tie MBs land on one coherent vector and the mvd
    field costs ~nothing (golden/inter.py global_mv / motion_search).
    Returns (iy0, ix0 [S,R,C], gy, gx [S]).

    axis_name: mesh axis the MB rows are sharded over (dist/mesh.py
    sharded_gop_step).  The winner mode is a FRAME-global statistic, so
    a row-sharded call must psum the candidate counts over that axis --
    otherwise each shard derives its own global MV and the rate-relative
    phase-2 selection diverges from the unsharded encode."""
    cand_ax = 2 if nc else -1
    rate0 = _RATE0[:, None] if nc else _RATE0
    cost1 = 4 * sads + lam * rate0
    win1 = jnp.argmin(cost1, axis=cand_ax)  # [S,R,C]; first min on ties
    counts = (
        win1[..., None] == jnp.arange(_NN, dtype=win1.dtype)
    ).sum((1, 2))  # [S, NN] -- one fused one-hot reduce, not NN passes
    if axis_name is not None:
        counts = jax.lax.psum(counts, axis_name)
    gidx = jnp.argmax(counts, axis=-1)  # first max on ties
    n = 2 * SEARCH_RANGE + 1
    gy = gidx // n - SEARCH_RANGE
    gx = gidx % n - SEARCH_RANGE
    rate_rel = _rate_q(
        4 * (_CAND_DX[None, :] - gx[:, None]),
        4 * (_CAND_DY[None, :] - gy[:, None]),
    )  # [S, NN]
    if nc:
        cost2 = 4 * sads + lam * rate_rel[:, None, :, None]
    else:
        cost2 = 4 * sads + lam * rate_rel[:, None, None, :]
    win = jnp.argmin(cost2, axis=cand_ax)
    return (
        win // n - SEARCH_RANGE,
        win % n - SEARCH_RANGE,
        gy,
        gx,
    )


def _int_refine(band_g, src_mbs, iy0, ix0, lam, gqx, gqy):
    """Stage B: 3x3 full-resolution refine around the stage-A winner
    (raster order, strict <; rate relative to the global vector).
    gq* are [S,1,1] quarter-pel.  Returns (iy, ix)."""
    rng = (15 - SEARCH_RANGE, 15 + SEARCH_RANGE)
    w19 = _window(band_g, 15 + iy0, 15 + ix0, 16 + 2 * REFINE_RANGE + 1,
                  j_range=rng, i_range=rng)
    best_cost = biy = bix = None
    for oy in range(2 * REFINE_RANGE + 1):
        for ox in range(2 * REFINE_RANGE + 1):
            pred = w19[..., oy : oy + 16, ox : ox + 16]
            sad = jnp.abs(src_mbs - pred).sum((-1, -2))
            my = iy0 - REFINE_RANGE + oy
            mx = ix0 - REFINE_RANGE + ox
            cost = sad + lam * _rate_q(4 * mx - gqx, 4 * my - gqy)
            if best_cost is None:
                best_cost, biy, bix = cost, my, mx
            else:
                better = cost < best_cost
                best_cost = jnp.where(better, cost, best_cost)
                biy = jnp.where(better, my, biy)
                bix = jnp.where(better, mx, bix)
    return biy, bix


# component table: id -> (plane, dy, dx); ids are golden.inter QPEL_TBL's
# [G00 b00 h00 j00 G10 G01 b01 h10]
_COMP_PL = (0, 1, 2, 3, 0, 0, 1, 2)
_COMP_DY = (0, 0, 0, 0, 0, 1, 1, 0)
_COMP_DX = (0, 0, 0, 0, 1, 0, 0, 1)


def _comp_slice(w2, k: int, y_int: int, x_int: int):
    """Static 16x16 component read from the 18x18 4-plane window stack
    (int sample (0,0) of the winner sits at [1,1])."""
    dy = 1 + y_int + _COMP_DY[k]
    dx = 1 + x_int + _COMP_DX[k]
    return w2[..., _COMP_PL[k], dy : dy + 16, dx : dx + 16]


def _extract_w2(bands, iy, ix, lo: int = -9, hi: int = 9):
    """[S,R,C,4,18,18] half-pel plane windows at integer winner (iy,ix);
    (lo, hi) bound the per-MB integer offsets (encode: refine range;
    decode: the emitted MV's integer span)."""
    rng = (15 + lo, 15 + hi)
    return jnp.stack(
        [_window(b, 15 + iy, 15 + ix, 18, j_range=rng, i_range=rng)
         for b in bands],
        axis=3,
    )


def _subpel_refine(w2, src_mbs, iy, ix, lam, gqx, gqy):
    """Stages C/D: all 49 reachable quarter-pel positions as static
    window slices -> cost/SAD tables, then the normative half->quarter
    two-stage selection as table arithmetic.  Rate relative to the
    global vector (gq* [S,1,1] quarter-pel).

    Returns (mvx_q, mvy_q, sad, cost) absolute quarter-pel MVs."""
    costs, sads = [], []
    for py in range(-3, 4):
        y_int, yf = py >> 2, py & 3
        for px in range(-3, 4):
            x_int, xf = px >> 2, px & 3
            c1, c2 = QPEL_TBL[(xf, yf)]
            a = _comp_slice(w2, c1, y_int, x_int)
            b = _comp_slice(w2, c2, y_int, x_int)
            pred = (a + b + 1) >> 1
            sad = jnp.abs(src_mbs - pred).sum((-1, -2))
            cost = sad + lam * _rate_q(
                4 * ix + px - gqx, 4 * iy + py - gqy
            )
            costs.append(cost)
            sads.append(sad)
    cost49 = jnp.stack(costs, axis=-1)  # [S,R,C,49]
    sad49 = jnp.stack(sads, axis=-1)

    best_cost = cost49[..., 24]  # center (0,0)
    by = jnp.zeros_like(iy)
    bx = jnp.zeros_like(ix)
    for hy, hx in OFFSETS_HALF:
        if (hy, hx) == (0, 0):
            continue
        cand = cost49[..., (3 + hy) * 7 + 3 + hx]
        better = cand < best_cost
        best_cost = jnp.where(better, cand, best_cost)
        by = jnp.where(better, hy, by)
        bx = jnp.where(better, hx, bx)
    base_y, base_x = by, bx
    for qy, qx in OFFSETS_QUARTER:
        if (qy, qx) == (0, 0):
            continue
        idxd = (3 + base_y + qy) * 7 + (3 + base_x + qx)
        cand = jnp.take_along_axis(cost49, idxd[..., None], axis=-1)[..., 0]
        better = cand < best_cost
        best_cost = jnp.where(better, cand, best_cost)
        by = jnp.where(better, base_y + qy, by)
        bx = jnp.where(better, base_x + qx, bx)
    fidx = (3 + by) * 7 + 3 + bx
    sad = jnp.take_along_axis(sad49, fidx[..., None], axis=-1)[..., 0]
    return 4 * ix + bx, 4 * iy + by, sad, best_cost


def _mc_from_window(w2, py, px):
    """Quarter-pel luma MC from the 18x18 window stack: per-MB
    FRACTIONAL position (py, px) in [0, 3] against the window's [1,1]
    integer sample.  A masked select over the 16 static fractional
    predictions -- each is two static component slices averaged -- since
    general gathers are ~100x slower than static slices on TPU."""
    pred = None
    for fy in range(4):
        for fx in range(4):
            c1, c2 = QPEL_TBL[(fx, fy)]
            a = _comp_slice(w2, c1, 0, 0)
            b = _comp_slice(w2, c2, 0, 0)
            p = (a + b + 1) >> 1
            m = ((py == fy) & (px == fx))[..., None, None]
            pred = p if pred is None else jnp.where(m, p, pred)
    return pred


def _mc_chroma_bands(band_c, mvx_q, mvy_q):
    """Eighth-pel bilinear chroma MC (8.4.2.2.2) from per-MB band24:
    mv in luma quarter-pel units; returns [S,R,C,8,8]."""
    cy = mvy_q >> 3
    cx = mvx_q >> 3
    yf = mvy_q & 7
    xf = mvx_q & 7
    rng = (8 - 6, 8 + 5)  # |mv| <= 9.75 pel -> chroma int in [-6, 5]
    w9 = _window(band_c, 8 + cy, 8 + cx, 9, j_range=rng, i_range=rng)
    a = w9[..., :8, :8]
    b = w9[..., :8, 1:9]
    c = w9[..., 1:9, :8]
    d = w9[..., 1:9, 1:9]
    xf_ = xf[..., None, None]
    yf_ = yf[..., None, None]
    return (
        (8 - xf_) * (8 - yf_) * a
        + xf_ * (8 - yf_) * b
        + (8 - xf_) * yf_ * c
        + xf_ * yf_ * d
        + 32
    ) >> 6


# ---------------------------------------------------------------------------
# Shared transform helpers (batched over arbitrary leading dims).
# ---------------------------------------------------------------------------


def _intra16_costs(left_y, first, ymb):
    pred_dc, pred_h = _pred_luma(left_y, first)
    cost_dc = _sad(ymb, pred_dc)
    cost_h = jnp.where(first, jnp.iinfo(jnp.int32).max, _sad(ymb, pred_h))
    use_dc = cost_dc <= cost_h
    mode = jnp.where(use_dc, 2, 1)
    pred = jnp.where(use_dc[..., None, None], pred_dc, pred_h)
    return mode, pred, jnp.minimum(cost_dc, cost_h)


def _transform_inter_luma(src, pred, qp):
    """Inter luma residual: full 16-coeff blocks; returns (l_zz, cbp4)."""
    w = T.forward4x4(_luma_blocks(src - pred))  # [.,4,4,4,4]
    q_flat = T.quant4x4(w, qp, intra=False).reshape(*w.shape[:-2], 16)
    l_zz = q_flat[..., T._ZZ]  # [., 4,4,16]
    nz = jnp.any(l_zz != 0, axis=-1)  # [., 4, 4] (by, bx)
    g = nz.reshape(*nz.shape[:-2], 2, 2, 2, 2)  # (gy, y2, gx, x2)
    gb = jnp.any(g, axis=(-3, -1))  # [., gy, gx]
    cbp4 = (
        gb[..., 0, 0].astype(jnp.int32)
        | (gb[..., 0, 1].astype(jnp.int32) << 1)
        | (gb[..., 1, 0].astype(jnp.int32) << 2)
        | (gb[..., 1, 1].astype(jnp.int32) << 3)
    )
    return l_zz, q_flat, cbp4


def _recon_inter_luma(pred, q_flat, nzmask8, qp):
    """Recon from flat-raster quantized coeffs, masked by coded 8x8s."""
    dq = T.dequant_flat(jnp.where(nzmask8[..., None], q_flat, 0), qp)
    d = dq.reshape(*dq.shape[:-1], 4, 4)
    return _blocks_to_mb(T.idct_add(_luma_blocks(pred), d))


def _chroma_fwd(src, pred, qpc, intra: bool):
    w = T.forward4x4(_chroma_blocks(src - pred))
    dcq = T.quant_chroma_dc(T.hadamard2x2(w[..., 0, 0]), qpc, intra=intra)
    q_flat = T.quant4x4(w, qpc, intra=intra).reshape(*w.shape[:-2], 16)
    ac_zz = q_flat[..., T._ZZ][..., 1:]
    return dcq, ac_zz, q_flat


def _recon_chroma(pred, dcq, q_flat, cbp_chroma, qpc):
    dc_deq = jnp.where(
        (cbp_chroma >= 1)[..., None, None], T.dequant_chroma_dc(dcq, qpc), 0
    )
    dq = T.dequant_flat(
        jnp.where((cbp_chroma == 2)[..., None, None, None], q_flat, 0), qpc
    )
    d = _subst_dc(dq, dc_deq)
    return _cblocks_to_mb(T.idct_add(_chroma_blocks(pred), d))


def _nzmask8(cbp):
    """4-bit 8x8 CBP -> [., 4, 4] per-4x4-block coded mask."""
    return jnp.repeat(
        jnp.repeat(
            (((cbp[..., None, None] >> jnp.arange(4).reshape(2, 2)) & 1) == 1),
            2, axis=-1,
        ),
        2, axis=-2,
    )


def _unroll_factor(c: int) -> int:
    """Columns per scan step.  The unroll is purely mechanical -- the
    results are bit-identical at any factor -- so it is chosen per
    backend: on TPU, 8 columns per step amortize the sequential-loop
    launch overhead that otherwise dominates the small per-column ops;
    on CPU (the virtual-mesh test environment), unrolling only bloats
    the XLA graph and LLVM compile time, so the scan stays per-column."""
    if jax.default_backend() != "tpu":
        return 1
    for u in (8, 6, 5, 4, 3, 2):
        if c % u == 0:
            return u
    return 1


def _mc_all(bands_l, bands_u, bands_v, mvx, mvy, n_refs, refsel):
    """Luma + chroma MC at per-MB quarter-pel MVs, selecting among
    `n_refs` references by `refsel`.  mv int range [-10, 9]."""
    preds = []
    for n in range(n_refs):
        w2 = _extract_w2(bands_l[n], mvy >> 2, mvx >> 2, lo=-10, hi=9)
        pl = _mc_from_window(w2, mvy - 4 * (mvy >> 2), mvx - 4 * (mvx >> 2))
        pu = _mc_chroma_bands(bands_u[n], mvx, mvy)
        pv = _mc_chroma_bands(bands_v[n], mvx, mvy)
        preds.append((pl, pu, pv))
    out = preds[0]
    for n in range(1, n_refs):
        m = (refsel == n)[..., None, None]
        out = tuple(jnp.where(m, preds[n][i], out[i]) for i in range(3))
    return out


def encode_pframe_rows(y, u, v, ref_y, ref_u, ref_v, qp):
    """Single-reference P encode (the common fast path)."""
    return encode_pframe_rows_multi(
        y, u, v, ref_y[None], ref_u[None], ref_v[None], qp
    )


@functools.partial(
    jax.jit,
    static_argnames=("ref_base", "halo", "t8", "axis_name", "intra_in_p"),
)
def encode_pframe_rows_multi(
    y, u, v, refs_y, refs_u, refs_v, qp, ref_base: int = 0,
    halo: bool = False, t8: bool = False, axis_name: Optional[str] = None,
    intra_in_p: bool = True,
) -> Tuple[MBSymbolsP, Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]]:
    """Encode P-frames [S, H, W] against a device-resident DPB.

    refs_*: [N, S, H, W], newest first (N static).  Per MB, every
    reference is searched; the lowest rate-biased cost wins with ties
    to the smaller index (mirrors golden _encode_mb_p).  ref_idx
    travels in symbols.refidx.  `ref_base` offsets the signaled indices
    when the caller passes a slice of the DPB (forced temporal-layer
    reference); P_Skip requires the TRUE index 0 (the decoder's skip MC
    always reads DPB[0], 8.4.1.1).  With halo=True the references
    arrive vertically pre-extended by (HALO_Y, HALO_C) rows per side --
    real neighbor rows exchanged over ICI by a row-sharded DPB
    (dist/mesh.py) -- and the output is bit-identical to the unsharded
    full-frame encode."""
    qpc = T.chroma_qp_from_luma(qp)
    n_refs = refs_y.shape[0]
    s, h, w = y.shape
    r, c = h // 16, w // 16
    p = SEARCH_PAD
    cp = p // 2 + 2  # chroma pad
    lam = _LAM_ME[jnp.clip(qp, 0, 51)]

    if halo:
        planes_n = [
            build_halfpel_planes_ext(refs_y[n], p) for n in range(n_refs)
        ]
        ref_up_n = [_pad_ref_ext(refs_u[n], cp) for n in range(n_refs)]
        ref_vp_n = [_pad_ref_ext(refs_v[n], cp) for n in range(n_refs)]
    else:
        planes_n = [
            build_halfpel_planes(refs_y[n], p) for n in range(n_refs)
        ]
        ref_up_n = [_pad_ref(refs_u[n], cp) for n in range(n_refs)]
        ref_vp_n = [_pad_ref(refs_v[n], cp) for n in range(n_refs)]

    bands_l = [
        [_luma_bands(pl, r, c) for pl in planes_n[n]] for n in range(n_refs)
    ]
    bands_u = [
        _mb_bands(ref_up_n[n].astype(jnp.uint8), 8) for n in range(n_refs)
    ]
    bands_v = [
        _mb_bands(ref_vp_n[n].astype(jnp.uint8), 8) for n in range(n_refs)
    ]

    y32 = y.astype(jnp.int32)
    src_mbs = y32.reshape(s, r, 16, c, 16).transpose(0, 1, 3, 2, 4)
    on_tpu = jax.default_backend() == "tpu"
    # the stride-2 subsample is only materialized on CPU: the Pallas
    # stage-A kernel consumes the full-res source directly (the XLA
    # strided slice costs real milliseconds on TPU)
    src2 = None if on_tpu else y32[:, ::2, ::2]
    u_mbs = (
        u.astype(jnp.int32).reshape(s, r, 8, c, 8).transpose(0, 1, 3, 2, 4)
    )
    v_mbs = (
        v.astype(jnp.int32).reshape(s, r, 8, c, 8).transpose(0, 1, 3, 2, 4)
    )

    # ---- motion search per reference, batched over all MBs ----
    # TPU: the stage-A table comes from the VMEM-resident Pallas kernel
    # (kernels/me_pallas.py) -- exact int32 arithmetic, ~5x the XLA
    # formulation's speed, and consumed in its native [S,R,NN,C] layout.
    # (The retired XLA TPU path also accumulated the row reduction
    # through an effectively-bf16 matmul, drifting up to +-14 from the
    # exact table; the kernel restored CPU/TPU bit equality of the ME.)
    if on_tpu:
        from . import me_pallas
    mvx = mvy = inter_sad = inter_cost = refsel = None
    for n in range(n_refs):
        if on_tpu:
            sads = me_pallas.sad_field(y32, planes_n[n][0], h, w)
            iy0, ix0, gy, gx = _int_winner(sads, lam, axis_name, nc=True)
        else:
            sads = _sad_field(src2, planes_n[n][0], h, w)
            iy0, ix0, gy, gx = _int_winner(sads, lam, axis_name)
        gqx = (4 * gx)[:, None, None]
        gqy = (4 * gy)[:, None, None]
        iy, ix = _int_refine(bands_l[n][0], src_mbs, iy0, ix0, lam,
                             gqx, gqy)
        w2 = _extract_w2(bands_l[n], iy, ix)
        mvx_n, mvy_n, sad_n, cost_n = _subpel_refine(
            w2, src_mbs, iy, ix, lam, gqx, gqy
        )
        # reference signaling rate bias (golden ref_idx_bits): the
        # selection must stay bit-identical to golden _encode_mb_p
        cost_n = cost_n + lam * ref_idx_bits(n + ref_base,
                                             ref_base + n_refs)
        if n == 0:
            mvx, mvy, inter_sad, inter_cost = mvx_n, mvy_n, sad_n, cost_n
            refsel = jnp.zeros_like(sad_n)
        else:
            better = cost_n < inter_cost
            mvx = jnp.where(better, mvx_n, mvx)
            mvy = jnp.where(better, mvy_n, mvy)
            inter_sad = jnp.where(better, sad_n, inter_sad)
            inter_cost = jnp.where(better, cost_n, inter_cost)
            refsel = jnp.where(better, n, refsel)

    # ---- inter MC + transforms, batched ----
    predl, predcu, predcv = _mc_all(
        bands_l, bands_u, bands_v, mvx, mvy, n_refs, refsel
    )
    l_zz, ql_flat, cbp4 = _transform_inter_luma(src_mbs, predl, qp)

    if t8:
        resid8 = (
            (src_mbs - predl).reshape(s, r, c, 2, 8, 2, 8).swapaxes(-3, -2)
        )
        z8 = T8.quant8x8(T8.forward8x8(resid8), qp, intra=False)
        zz8 = T8.zigzag8(z8)  # [S,R,C,2,2,64]
        nz8 = jnp.any(zz8 != 0, -1)
        cbp8 = (
            nz8[..., 0, 0].astype(jnp.int32)
            | (nz8[..., 0, 1].astype(jnp.int32) << 1)
            | (nz8[..., 1, 0].astype(jnp.int32) << 2)
            | (nz8[..., 1, 1].astype(jnp.int32) << 3)
        )
        pred8 = predl.reshape(s, r, c, 2, 8, 2, 8).swapaxes(-3, -2)
        rec8 = T8.idct8_add(pred8, T8.dequant8x8(z8, qp))
        rec8 = rec8.swapaxes(-3, -2).reshape(s, r, c, 16, 16)

    rec_y_inter = _recon_inter_luma(predl, ql_flat, _nzmask8(cbp4), qp)

    if t8:
        lam8 = _LAMBDA8[jnp.clip(qp, 0, 51)]
        d4 = rec_y_inter - src_mbs
        d8 = rec8 - src_mbs
        j4 = 8 * jnp.sum(d4 * d4, (-1, -2)) + lam8 * _rate_bits(
            l_zz, (-1, -2, -3)
        )
        j8 = 8 * jnp.sum(d8 * d8, (-1, -2)) + lam8 * (
            _rate_bits(zz8, (-1, -2, -3)) + 1
        )
        use_t8 = (j8 < j4) & (cbp8 > 0)
        cbp_l_inter = jnp.where(use_t8, cbp8, cbp4)
        rec_y_inter = jnp.where(use_t8[..., None, None], rec8, rec_y_inter)
        lzz_sel = jnp.where(
            use_t8[..., None, None, None],
            zz8.reshape(s, r, c, 4, 64).reshape(s, r, c, 4, 4, 16),
            l_zz,
        )
    else:
        use_t8 = jnp.zeros(cbp4.shape, bool)
        cbp_l_inter = cbp4
        lzz_sel = l_zz

    dcu_i, acu_i, qu_i = _chroma_fwd(u_mbs, predcu, qpc, intra=False)
    dcv_i, acv_i, qv_i = _chroma_fwd(v_mbs, predcv, qpc, intra=False)
    any_ac_i = (
        jnp.any(acu_i != 0, (-1, -2, -3)) | jnp.any(acv_i != 0, (-1, -2, -3))
    )
    any_dc_i = jnp.any(dcu_i != 0, (-1, -2)) | jnp.any(dcv_i != 0, (-1, -2))
    cbp_c_i = jnp.where(any_ac_i, 2, jnp.where(any_dc_i, 1, 0))
    rec_u_inter = _recon_chroma(predcu, dcu_i, qu_i, cbp_c_i, qpc)
    rec_v_inter = _recon_chroma(predcv, dcv_i, qv_i, cbp_c_i, qpc)

    skip_pre = (
        (cbp_l_inter == 0) & (cbp_c_i == 0)
        & (mvx == 0) & (mvy == 0) & (refsel + ref_base == 0)
    )
    cdc_i = jnp.stack(
        [dcu_i.reshape(s, r, c, 4), dcv_i.reshape(s, r, c, 4)], -2
    )
    cac_i = jnp.stack(
        [acu_i.reshape(s, r, c, 4, 15), acv_i.reshape(s, r, c, 4, 15)], -3
    )

    # ---- intra_in_p=False: the whole frame is already batched ----
    # With intra candidates disabled (the RTC speed-preset analog: the
    # reference's encoder runs LOW_COMPLEXITY with scene-change
    # detection off, /root/reference/openh264_wrapper.cpp:216-220, and
    # recovers via the GOP IDR cadence), nothing in the P encode
    # depends on a left-neighbor reconstruction chain: the MV predictor
    # is the left MB's MV (row-slice 8.4.1.3 degenerate form), which is
    # a static shift of the batched MV field, so mvd, skip and all
    # symbol tensors assemble without the column scan -- the last
    # sequential piece of the encoder (VERDICT r3 item 5).
    if not intra_in_p:
        kind = jnp.where(skip_pre, KIND_SKIP, KIND_INTER)
        pmvx = jnp.pad(mvx, ((0, 0), (0, 0), (1, 0)))[..., :-1]
        pmvy = jnp.pad(mvy, ((0, 0), (0, 0), (1, 0)))[..., :-1]
        zero = jnp.zeros_like(mvx)
        symbols = MBSymbolsP(
            kind=kind.astype(jnp.int32),
            mode=zero, cmode=zero,
            cbp_luma=cbp_l_inter.astype(jnp.int32),
            cbp_chroma=cbp_c_i.astype(jnp.int32),
            mvdx=(mvx - pmvx).astype(jnp.int32),
            mvdy=(mvy - pmvy).astype(jnp.int32),
            luma_dc=jnp.zeros((s, r, c, 16), jnp.int16),
            luma_ac=lzz_sel.reshape(s, r, c, 16, 16).astype(jnp.int16),
            chroma_dc=cdc_i.astype(jnp.int16),
            chroma_ac=cac_i.astype(jnp.int16),
            refidx=jnp.where(skip_pre, 0, refsel + ref_base)
            .astype(jnp.int32),
            t8=jnp.where(skip_pre, 0, use_t8).astype(jnp.int32),
        )
        recon = (
            _mbs_to_plane(rec_y_inter.astype(jnp.uint8)),
            _mbs_to_plane(rec_u_inter.astype(jnp.uint8)),
            _mbs_to_plane(rec_v_inter.astype(jnp.uint8)),
        )
        return symbols, recon, (mvx.astype(jnp.int32),
                                mvy.astype(jnp.int32))

    # ---- intra-in-P + mode selection: light column scan ----
    uf = _unroll_factor(c)

    def to_scan(x):
        return jnp.moveaxis(x, 2, 0).reshape(c // uf, uf, *x.shape[:2],
                                             *x.shape[3:])

    xs_fields = [
        src_mbs, u_mbs, v_mbs, inter_sad, skip_pre.astype(jnp.int32),
        mvx, mvy, refsel, use_t8.astype(jnp.int32),
        rec_y_inter, rec_u_inter, rec_v_inter,
        lzz_sel.astype(jnp.int32), cbp_l_inter, cbp_c_i,
        cdc_i, cac_i,
    ]
    xs = tuple(to_scan(x) for x in xs_fields) + (
        jnp.arange(c).reshape(c // uf, uf),
    )

    def substep(carry, x, col):
        left_y, left_u, left_v, lmvx, lmvy, lkind = carry
        (ymb, umb, vmb, sad_i, skip_p, mx, my, refs_, t8f,
         ry_i, ru_i, rv_i, lzz, cbp_li, cbp_ci, cdc_x, cac_x) = x
        first = jnp.broadcast_to(col == 0, (s, r))

        imode, ipred, intra_sad = _intra16_costs(left_y, first, ymb)
        use_intra = intra_sad < sad_i
        dc_zz, iac_zz, icbp, rec_y_intra = _encode_luma(ymb, ipred, qp)

        pu_dc, pu_h = _pred_chroma(left_u, first)
        pv_dc, pv_h = _pred_chroma(left_v, first)
        ccost_dc = _sad(umb, pu_dc) + _sad(vmb, pv_dc)
        ccost_h = jnp.where(
            first, jnp.iinfo(jnp.int32).max,
            _sad(umb, pu_h) + _sad(vmb, pv_h),
        )
        use_cdc = ccost_dc <= ccost_h
        icmode = jnp.where(use_cdc, 0, 1)
        ipredu = jnp.where(use_cdc[..., None, None], pu_dc, pu_h)
        ipredv = jnp.where(use_cdc[..., None, None], pv_dc, pv_h)
        dcu_a, acu_a, qu_a = _chroma_fwd(umb, ipredu, qpc, intra=True)
        dcv_a, acv_a, qv_a = _chroma_fwd(vmb, ipredv, qpc, intra=True)
        any_ac_a = (
            jnp.any(acu_a != 0, (-1, -2, -3))
            | jnp.any(acv_a != 0, (-1, -2, -3))
        )
        any_dc_a = (
            jnp.any(dcu_a != 0, (-1, -2)) | jnp.any(dcv_a != 0, (-1, -2))
        )
        cbp_c_a = jnp.where(any_ac_a, 2, jnp.where(any_dc_a, 1, 0))
        rec_u_intra = _recon_chroma(ipredu, dcu_a, qu_a, cbp_c_a, qpc)
        rec_v_intra = _recon_chroma(ipredv, dcv_a, qv_a, cbp_c_a, qpc)

        is_skip = (~use_intra) & (skip_p == 1)
        kind = jnp.where(
            use_intra, KIND_INTRA, jnp.where(is_skip, KIND_SKIP, KIND_INTER)
        )
        sel = use_intra[..., None, None]
        rec_y = jnp.where(sel, rec_y_intra, ry_i)
        rec_u = jnp.where(sel, rec_u_intra, ru_i)
        rec_v = jnp.where(sel, rec_v_intra, rv_i)

        left_ok = ~first
        pmvx = jnp.where(left_ok & (lkind != KIND_INTRA), lmvx, 0)
        pmvy = jnp.where(left_ok & (lkind != KIND_INTRA), lmvy, 0)
        mvdx = jnp.where(use_intra, 0, mx - pmvx)
        mvdy = jnp.where(use_intra, 0, my - pmvy)
        out_mvx = jnp.where(use_intra, 0, mx)
        out_mvy = jnp.where(use_intra, 0, my)
        out_ref = jnp.where(
            use_intra | is_skip, 0, refs_ + ref_base
        ).astype(jnp.int32)
        out_t8 = jnp.where(use_intra | is_skip, 0, t8f)

        sel1 = use_intra[..., None]
        sel3 = use_intra[..., None, None, None]
        luma_dc = jnp.where(sel1, dc_zz, 0)
        luma_ac = jnp.where(sel3, iac_zz, lzz)
        cbp_luma = jnp.where(use_intra, icbp.astype(jnp.int32), cbp_li)
        cbp_chroma = jnp.where(use_intra, cbp_c_a, cbp_ci)
        sel2 = use_intra[..., None, None]
        cdc = jnp.where(
            sel2,
            jnp.stack(
                [dcu_a.reshape(s, r, 4), dcv_a.reshape(s, r, 4)], -2
            ),
            cdc_x,
        )
        cac = jnp.where(
            sel3,
            jnp.stack(
                [acu_a.reshape(s, r, 4, 15), acv_a.reshape(s, r, 4, 15)], -3
            ),
            cac_x,
        )

        new_carry = (
            rec_y[..., :, 15], rec_u[..., :, 7], rec_v[..., :, 7],
            out_mvx, out_mvy, kind,
        )
        out = (
            kind.astype(jnp.int32),
            jnp.where(use_intra, imode, 0).astype(jnp.int32),
            jnp.where(use_intra, icmode, 0).astype(jnp.int32),
            cbp_luma.astype(jnp.int32),
            cbp_chroma.astype(jnp.int32),
            mvdx.astype(jnp.int32),
            mvdy.astype(jnp.int32),
            luma_dc.astype(jnp.int16),
            luma_ac.reshape(s, r, 16, 16).astype(jnp.int16),
            cdc.astype(jnp.int16),
            cac.astype(jnp.int16),
            rec_y.astype(jnp.uint8),
            rec_u.astype(jnp.uint8),
            rec_v.astype(jnp.uint8),
            out_mvx.astype(jnp.int32),
            out_mvy.astype(jnp.int32),
            out_ref,
            out_t8,
        )
        return new_carry, out

    def step(carry, x):
        *fields, cols = x
        outs = []
        for uu in range(uf):
            carry, o = substep(
                carry, tuple(f[uu] for f in fields), cols[uu]
            )
            outs.append(o)
        return carry, tuple(
            jnp.stack([o[i] for o in outs]) for i in range(len(outs[0]))
        )

    carry0 = (
        jnp.zeros((s, r, 16), jnp.int32),
        jnp.zeros((s, r, 8), jnp.int32),
        jnp.zeros((s, r, 8), jnp.int32),
        jnp.zeros((s, r), jnp.int32),
        jnp.zeros((s, r), jnp.int32),
        jnp.full((s, r), KIND_INTRA, jnp.int32),
    )
    _, outs = jax.lax.scan(step, carry0, xs)
    outs = tuple(
        o.reshape(c, *o.shape[2:]) for o in outs
    )
    (kind, mode, cmode, cbp_l, cbp_c, mvdx, mvdy,
     ldc, lac, cdc, cac, ry, ru, rv, amvx, amvy, refi, t8f) = outs

    symbols = MBSymbolsP(
        kind=_unscan(kind), mode=_unscan(mode), cmode=_unscan(cmode),
        cbp_luma=_unscan(cbp_l), cbp_chroma=_unscan(cbp_c),
        mvdx=_unscan(mvdx), mvdy=_unscan(mvdy),
        luma_dc=_unscan(ldc), luma_ac=_unscan(lac),
        chroma_dc=_unscan(cdc), chroma_ac=_unscan(cac),
        refidx=_unscan(refi), t8=_unscan(t8f),
    )
    recon = (
        _mbs_to_plane(_unscan(ry)),
        _mbs_to_plane(_unscan(ru)),
        _mbs_to_plane(_unscan(rv)),
    )
    motion = (_unscan(amvx), _unscan(amvy))
    return symbols, recon, motion


def decode_pframe_rows(symbols: MBSymbolsP, ref_y, ref_u, ref_v, qp):
    """Single-reference P decode (the common fast path)."""
    return decode_pframe_rows_multi(
        symbols, ref_y[None], ref_u[None], ref_v[None], qp
    )


@functools.partial(jax.jit, static_argnames=("halo", "t8"))
def decode_pframe_rows_multi(
    symbols: MBSymbolsP, refs_y, refs_u, refs_v, qp, halo: bool = False,
    t8: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Reconstruct P-frames from parsed symbols + a device DPB
    (refs_* [N, S, H, W], newest first; per-MB symbols.refidx).
    halo=True: vertically pre-extended references (row-sharded DPB).

    The MV chain (left-neighbor prediction, 8.4.1.3 row-slice form) is
    an affine recurrence mv_c = g_c*(mv_{c-1} + mvd_c), resolved with
    jax.lax.associative_scan; MC and residual reconstruction are then
    fully batched.  Only intra-in-P MBs reconstruct in a (light,
    unrolled) column scan."""
    qpc = T.chroma_qp_from_luma(qp)
    n_refs = refs_y.shape[0]
    s, r, c = symbols.kind.shape
    p = SEARCH_PAD
    cp = p // 2 + 2

    if halo:
        planes_n = [
            build_halfpel_planes_ext(refs_y[n], p) for n in range(n_refs)
        ]
        ref_up_n = [_pad_ref_ext(refs_u[n], cp) for n in range(n_refs)]
        ref_vp_n = [_pad_ref_ext(refs_v[n], cp) for n in range(n_refs)]
    else:
        planes_n = [
            build_halfpel_planes(refs_y[n], p) for n in range(n_refs)
        ]
        ref_up_n = [_pad_ref(refs_u[n], cp) for n in range(n_refs)]
        ref_vp_n = [_pad_ref(refs_v[n], cp) for n in range(n_refs)]

    bands_l = [
        [_luma_bands(pl, r, c) for pl in planes_n[n]] for n in range(n_refs)
    ]
    bands_u = [
        _mb_bands(ref_up_n[n].astype(jnp.uint8), 8) for n in range(n_refs)
    ]
    bands_v = [
        _mb_bands(ref_vp_n[n].astype(jnp.uint8), 8) for n in range(n_refs)
    ]

    kind = symbols.kind.astype(jnp.int32)
    refidx = (
        symbols.refidx.astype(jnp.int32) if symbols.refidx is not None
        else jnp.zeros_like(kind)
    )
    t8flags = (
        symbols.t8.astype(jnp.int32) if symbols.t8 is not None
        else jnp.zeros_like(kind)
    )
    is_intra = kind == KIND_INTRA
    is_skip = kind == KIND_SKIP

    # ---- MV chain: affine associative scan along columns ----
    g = (kind == KIND_INTER).astype(jnp.int32)

    def comb(l, rgt):
        a1, bx1, by1 = l
        a2, bx2, by2 = rgt
        return a1 * a2, bx1 * a2 + bx2, by1 * a2 + by2

    _, mvx, mvy = jax.lax.associative_scan(
        comb,
        (g, g * symbols.mvdx.astype(jnp.int32),
         g * symbols.mvdy.astype(jnp.int32)),
        axis=2,
    )

    # ---- batched MC + inter residual reconstruction ----
    predl, predcu, predcv = _mc_all(
        bands_l, bands_u, bands_v, mvx, mvy, n_refs, refidx
    )
    inter_cbp = jnp.where(is_skip, 0, symbols.cbp_luma.astype(jnp.int32))
    ac = symbols.luma_ac.astype(jnp.int32)
    ac4 = ac.reshape(s, r, c, 4, 4, 16)
    q_flat = T.inverse_zigzag(ac4).reshape(s, r, c, 4, 4, 16)
    rec_y_inter = _recon_inter_luma(
        predl, q_flat, _nzmask8(inter_cbp), qp
    )
    if t8:
        zz8 = ac.reshape(s, r, c, 4, 64).reshape(s, r, c, 2, 2, 64)
        pred8 = predl.reshape(s, r, c, 2, 8, 2, 8).swapaxes(-3, -2)
        rec8 = T8.idct8_add(
            pred8, T8.dequant8x8(T8.inverse_zigzag8(zz8), qp)
        ).swapaxes(-3, -2).reshape(s, r, c, 16, 16)
        rec_y_inter = jnp.where(
            (t8flags == 1)[..., None, None], rec8, rec_y_inter
        )

    cbp_c = symbols.cbp_chroma.astype(jnp.int32)
    ccbp = jnp.where(is_skip, 0, cbp_c)
    cdc = symbols.chroma_dc.astype(jnp.int32)
    cac = symbols.chroma_ac.astype(jnp.int32)
    dcu = cdc[..., 0, :].reshape(s, r, c, 2, 2)
    dcv = cdc[..., 1, :].reshape(s, r, c, 2, 2)

    def q_from_zz(ac_zz15):
        coeffs = jnp.concatenate(
            [jnp.zeros((s, r, c, 2, 2, 1), jnp.int32), ac_zz15], axis=-1
        )
        return T.inverse_zigzag(coeffs).reshape(s, r, c, 2, 2, 16)

    qu = q_from_zz(cac[..., 0, :, :].reshape(s, r, c, 2, 2, 15))
    qv = q_from_zz(cac[..., 1, :, :].reshape(s, r, c, 2, 2, 15))
    rec_u_inter = _recon_chroma(predcu, dcu, qu, ccbp, qpc)
    rec_v_inter = _recon_chroma(predcv, dcv, qv, ccbp, qpc)

    # ---- intra residuals, batched (pred-independent part of 8.5) ----
    cbp_l = symbols.cbp_luma.astype(jnp.int32)
    dc_deq = T.dequant_luma_dc(
        T.inverse_zigzag(symbols.luma_dc.astype(jnp.int32)), qp
    )
    iq = jnp.where((cbp_l == 1)[..., None, None, None], ac4, 0)
    iq_flat = T.inverse_zigzag(iq).reshape(s, r, c, 4, 4, 16)
    d_luma = _subst_dc(T.dequant_flat(iq_flat, qp), dc_deq)
    res_y = (T.inverse4x4(d_luma) + 32) >> 6  # [S,R,C,4,4,4,4]

    def chroma_res(dcq, q_flatc):
        dc_d = jnp.where(
            (cbp_c >= 1)[..., None, None], T.dequant_chroma_dc(dcq, qpc), 0
        )
        dq = jnp.where((cbp_c == 2)[..., None, None, None], q_flatc, 0)
        d = _subst_dc(T.dequant_flat(dq, qpc), dc_d)
        return (T.inverse4x4(d) + 32) >> 6

    res_u = chroma_res(dcu, qu.reshape(s, r, c, 2, 2, 16))
    res_v = chroma_res(dcv, qv.reshape(s, r, c, 2, 2, 16))

    # ---- light intra scan: prediction + residual add + selection ----
    uf = _unroll_factor(c)

    def to_scan(x):
        return jnp.moveaxis(x, 2, 0).reshape(c // uf, uf, *x.shape[:2],
                                             *x.shape[3:])

    xs_fields = [
        kind, symbols.mode.astype(jnp.int32),
        symbols.cmode.astype(jnp.int32),
        mvx, mvy, rec_y_inter, rec_u_inter, rec_v_inter,
        res_y, res_u, res_v,
    ]
    xs = tuple(to_scan(x) for x in xs_fields) + (
        jnp.arange(c).reshape(c // uf, uf),
    )

    def substep(carry, x, col):
        left_y, left_u, left_v = carry
        (k, mode, cmode, mx, my, ry_i, ru_i, rv_i, rsy, rsu, rsv) = x
        first = jnp.broadcast_to(col == 0, (s, r))

        pred_dc, pred_h = _pred_luma(left_y, first)
        ipred = jnp.where((mode == 2)[..., None, None], pred_dc, pred_h)
        rec_y_intra = _blocks_to_mb(
            jnp.clip(_luma_blocks(ipred) + rsy, 0, 255)
        )
        pu_dc, pu_h = _pred_chroma(left_u, first)
        pv_dc, pv_h = _pred_chroma(left_v, first)
        csel = (cmode == 0)[..., None, None]
        ipredu = jnp.where(csel, pu_dc, pu_h)
        ipredv = jnp.where(csel, pv_dc, pv_h)
        rec_u_intra = _cblocks_to_mb(
            jnp.clip(_chroma_blocks(ipredu) + rsu, 0, 255)
        )
        rec_v_intra = _cblocks_to_mb(
            jnp.clip(_chroma_blocks(ipredv) + rsv, 0, 255)
        )

        sel = (k == KIND_INTRA)[..., None, None]
        rec_y = jnp.where(sel, rec_y_intra, ry_i)
        rec_u = jnp.where(sel, rec_u_intra, ru_i)
        rec_v = jnp.where(sel, rec_v_intra, rv_i)

        new_carry = (rec_y[..., :, 15], rec_u[..., :, 7], rec_v[..., :, 7])
        return new_carry, (
            rec_y.astype(jnp.uint8),
            rec_u.astype(jnp.uint8),
            rec_v.astype(jnp.uint8),
        )

    def step(carry, x):
        *fields, cols = x
        outs = []
        for uu in range(uf):
            carry, o = substep(
                carry, tuple(f[uu] for f in fields), cols[uu]
            )
            outs.append(o)
        return carry, tuple(
            jnp.stack([o[i] for o in outs]) for i in range(len(outs[0]))
        )

    carry0 = (
        jnp.zeros((s, r, 16), jnp.int32),
        jnp.zeros((s, r, 8), jnp.int32),
        jnp.zeros((s, r, 8), jnp.int32),
    )
    _, (ry, ru, rv) = jax.lax.scan(step, carry0, xs)
    ry = ry.reshape(c, *ry.shape[2:])
    ru = ru.reshape(c, *ru.shape[2:])
    rv = rv.reshape(c, *rv.shape[2:])
    amvx = jnp.where(is_intra, 0, mvx)
    amvy = jnp.where(is_intra, 0, mvy)
    return (
        _mbs_to_plane(_unscan(ry)),
        _mbs_to_plane(_unscan(ru)),
        _mbs_to_plane(_unscan(rv)),
    ), (amvx, amvy)
