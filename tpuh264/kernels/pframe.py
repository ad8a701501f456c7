"""TPU P-frame encoder/decoder core (row-slice parallel, integer-pel ME).

Extends the I-frame scan (kernels/iframe.py) with inter prediction against
a device-resident reference frame -- the DPB lives in HBM and never
crosses the host link (BASELINE.json north star: reference pages stay on
chip).  Motion search is the fixed-candidate two-stage pattern defined by
tpuh264.golden.inter (bit-identical decisions; fixed-iteration masked
search per SURVEY.md hard part 4).  Skip and MV prediction use the
row-slice degenerate forms of H.264 8.4.1: with no top neighbors,
P_Skip's MV is always zero and the predictor is the left MB's MV.

All decisions/reconstructions are bit-exact with tpuh264.golden.codec's
P path (tests enforce stream equality via the shared entropy packers).
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
    OFFSETS_HALF,
    OFFSETS_QUARTER,
    OFFSETS_S1,
    OFFSETS_S2,
    QPEL_TBL,
    SEARCH_PAD,
    SEARCH_RANGE,
)

KIND_SKIP = 0
KIND_INTER = 1
KIND_INTRA = 2


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


def _qpel_bands(planes, col, r: int):
    """Per-step 41x41 windows for the 4 planes: [4][S,R,41,41].

    Window-local offset (12 + x_int, 12 + y_int) addresses the integer
    sample grid; +1 slices provide the quarter-average neighbors."""
    out = []
    for pl in planes:
        band = jax.lax.dynamic_slice_in_dim(pl, col * 16 + 1, 41, axis=2)
        rows = [band[:, i * 16 + 1 : i * 16 + 42, :] for i in range(r)]
        out.append(jnp.stack(rows, axis=1))
    return out


# component table as arrays: idx1/idx2 [4(xf), 4(yf)] into the 8-component
# stack [G00 b00 h00 j00 G10 G01 b01 h10]
_QTBL1 = np.zeros((4, 4), np.int32)
_QTBL2 = np.zeros((4, 4), np.int32)
for (xf, yf), (c1, c2) in QPEL_TBL.items():
    _QTBL1[xf, yf] = c1
    _QTBL2[xf, yf] = c2
_QTBL1 = jnp.asarray(_QTBL1)
_QTBL2 = jnp.asarray(_QTBL2)


def _mc_qpel(qbands, mvx, mvy):
    """Quarter-pel luma MC: qbands [4][S,R,41,41], mv [S,R] quarter units."""
    x_int = mvx >> 2
    y_int = mvy >> 2
    xf = mvx & 3
    yf = mvy & 3
    wins = [
        _gather_window(b, 12 + y_int, 12 + x_int, 17) for b in qbands
    ]  # 17x17 per plane
    wg, wb, wh, wj = wins
    comps = jnp.stack(
        [
            wg[..., :16, :16], wb[..., :16, :16],
            wh[..., :16, :16], wj[..., :16, :16],
            wg[..., :16, 1:17], wg[..., 1:17, :16],
            wb[..., 1:17, :16], wh[..., :16, 1:17],
        ],
        axis=0,
    )  # [8, S, R, 16, 16]
    i1 = _QTBL1[xf, yf]  # [S, R]
    i2 = _QTBL2[xf, yf]
    k = jnp.arange(8).reshape(8, 1, 1, 1, 1)
    c1 = jnp.sum(jnp.where(k == i1[None, ..., None, None], comps, 0), axis=0)
    c2 = jnp.sum(jnp.where(k == i2[None, ..., None, None], comps, 0), axis=0)
    return (c1 + c2 + 1) >> 1


def _me_subpel(qbands, src, mvx_i, mvy_i, best_sad):
    """Half then quarter refinement around the integer winner (matches
    golden.inter.motion_search_qpel order and tie-breaks)."""
    best_x = 4 * mvx_i
    best_y = 4 * mvy_i
    for offsets in (OFFSETS_HALF, OFFSETS_QUARTER):
        base_x, base_y = best_x, best_y
        for dy, dx in offsets:
            if (dy, dx) == (0, 0):
                continue
            cx = base_x + dx
            cy = base_y + dy
            pred = _mc_qpel(qbands, cx, cy)
            s = jnp.abs(src - pred).sum((-1, -2))
            better = s < best_sad
            best_sad = jnp.where(better, s, best_sad)
            best_x = jnp.where(better, cx, best_x)
            best_y = jnp.where(better, cy, best_y)
    return best_x, best_y, best_sad


def _pad_ref(plane: jnp.ndarray, pad: int) -> jnp.ndarray:
    """Edge-replicate pad [S, H, W] by `pad` on every side (the normative
    Clip3 sample clamp of 8.4.2.2, materialized once)."""
    return jnp.pad(plane.astype(jnp.int32), ((0, 0), (pad, pad), (pad, pad)),
                   mode="edge")


# vertical reach of inter prediction into a reference, in rows: the halo
# a row-sharded DPB must exchange with each neighbor shard (ICI ppermute)
HALO_Y = SEARCH_PAD + 1   # 13: ME clamp + refine + 6-tap margin
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


def _row_windows(band: jnp.ndarray, r: int, mb: int, win: int) -> jnp.ndarray:
    """[S, H+2p, win] -> [S, R, win, win] static per-row windows."""
    rows = [band[:, i * mb : i * mb + win, :] for i in range(r)]
    return jnp.stack(rows, axis=1)


def _gather_window(
    band: jnp.ndarray, y0: jnp.ndarray, x0: jnp.ndarray, size: int
) -> jnp.ndarray:
    """Per-lane window gather: band [S,R,W,W], y0/x0 [S,R] -> [S,R,size,size]."""
    ar = jnp.arange(size)
    rows = y0[..., None] + ar  # [S,R,size]
    t = jnp.take_along_axis(band, rows[..., None], axis=2)  # [S,R,size,W]
    cols = x0[..., None] + ar
    return jnp.take_along_axis(t, cols[..., :, None].swapaxes(-1, -2), axis=3)


def _me_16x16(band: jnp.ndarray, src: jnp.ndarray, pmvx, pmvy):
    """Fixed two-stage integer search (mirrors golden.inter.motion_search).

    band: [S,R,40,40] reference windows centered so offset (0,0) reads
    at [12:28, 12:28]; src: [S,R,16,16].  Returns (dx, dy, sad) int pels.
    """
    p = SEARCH_PAD

    def sad_at(dy, dx):
        win = _gather_window(band, p + dy, p + dx, 16)
        return jnp.abs(src - win).sum((-1, -2))

    c0y = jnp.clip(pmvy >> 2, -SEARCH_RANGE, SEARCH_RANGE)
    c0x = jnp.clip(pmvx >> 2, -SEARCH_RANGE, SEARCH_RANGE)
    zero = jnp.zeros_like(c0y)

    best_dy, best_dx = zero, zero
    best_sad = sad_at(zero, zero)
    for dy_off, dx_off in OFFSETS_S1:
        dy, dx = c0y + dy_off, c0x + dx_off
        s = sad_at(dy, dx)
        better = s < best_sad
        best_sad = jnp.where(better, s, best_sad)
        best_dy = jnp.where(better, dy, best_dy)
        best_dx = jnp.where(better, dx, best_dx)
    base_dy, base_dx = best_dy, best_dx
    for dy_off, dx_off in OFFSETS_S2:
        if (dy_off, dx_off) == (0, 0):
            continue
        dy, dx = base_dy + dy_off, base_dx + dx_off
        s = sad_at(dy, dx)
        better = s < best_sad
        best_sad = jnp.where(better, s, best_sad)
        best_dy = jnp.where(better, dy, best_dy)
        best_dx = jnp.where(better, dx, best_dx)
    return best_dx, best_dy, best_sad


def _mc_luma(band: jnp.ndarray, dx, dy) -> jnp.ndarray:
    return _gather_window(band, SEARCH_PAD + dy, SEARCH_PAD + dx, 16)


def _mc_chroma(cband: jnp.ndarray, mvx_q, mvy_q, cpad: int) -> jnp.ndarray:
    """Eighth-pel bilinear chroma MC (8.4.2.2.2); [S,R,*,*] -> [S,R,8,8]."""
    x_int = mvx_q >> 3
    y_int = mvy_q >> 3
    xf = mvx_q & 7
    yf = mvy_q & 7
    w9 = _gather_window(cband, cpad + y_int, cpad + x_int, 9)
    a = w9[..., :8, :8]
    b = w9[..., :8, 1:9]
    c = w9[..., 1:9, :8]
    d = w9[..., 1:9, 1:9]
    xf_ = xf[..., None, None]
    yf_ = yf[..., None, None]
    out = (
        (8 - xf_) * (8 - yf_) * a
        + xf_ * (8 - yf_) * b
        + (8 - xf_) * yf_ * c
        + xf_ * yf_ * d
        + 32
    ) >> 6
    return out


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
    # 8x8 group (i8): blocks (by in 2i8_y.., z-order): bit i8 = any nonzero
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


def encode_pframe_rows(y, u, v, ref_y, ref_u, ref_v, qp):
    """Single-reference P encode (the common fast path)."""
    return encode_pframe_rows_multi(
        y, u, v, ref_y[None], ref_u[None], ref_v[None], qp
    )


@functools.partial(jax.jit, static_argnames=("ref_base", "halo", "t8"))
def encode_pframe_rows_multi(
    y, u, v, refs_y, refs_u, refs_v, qp, ref_base: int = 0,
    halo: bool = False, t8: bool = False,
) -> Tuple[MBSymbolsP, Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]]:
    """Encode P-frames [S, H, W] against a device-resident DPB.

    refs_*: [N, S, H, W], newest first (N static).  Per MB, every
    reference is searched; lowest SAD wins with ties to the smaller
    index (mirrors golden _encode_mb_p).  ref_idx travels in
    symbols.refidx.  `ref_base` offsets the signaled indices when the
    caller passes a slice of the DPB (forced temporal-layer reference);
    P_Skip requires the TRUE index 0 (the decoder's skip MC always reads
    DPB[0], 8.4.1.1).  With halo=True the references arrive vertically
    pre-extended by (HALO_Y, HALO_C) rows per side -- real neighbor rows
    exchanged over ICI by a row-sharded DPB (dist/mesh.py) -- and the
    output is bit-identical to the unsharded full-frame encode."""
    qpc = T.chroma_qp_from_luma(qp)
    n_refs = refs_y.shape[0]
    s, h, w = y.shape
    r, c = h // 16, w // 16
    p = SEARCH_PAD
    cp = p // 2 + 2  # chroma pad: |dx/2|+1 <= p/2+1

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

    y_mbs = _mb_view(y.astype(jnp.int32), 16)
    u_mbs = _mb_view(u.astype(jnp.int32), 8)
    v_mbs = _mb_view(v.astype(jnp.int32), 8)
    cols = jnp.arange(c)

    def step(carry, xs):
        left_y, left_u, left_v, lmvx, lmvy, lkind = carry
        ymb, umb, vmb, col = xs
        first = jnp.broadcast_to(col == 0, (s, r))

        # per-reference windows for this MB column (4 half-pel planes)
        qbands_n = [_qpel_bands(pl, col, r) for pl in planes_n]
        cband_u_n = [
            _row_windows(
                jax.lax.dynamic_slice_in_dim(rp, col * 8, 8 + 2 * cp, axis=2),
                r, 8, 8 + 2 * cp,
            )
            for rp in ref_up_n
        ]
        cband_v_n = [
            _row_windows(
                jax.lax.dynamic_slice_in_dim(rp, col * 8, 8 + 2 * cp, axis=2),
                r, 8, 8 + 2 * cp,
            )
            for rp in ref_vp_n
        ]

        # MV prediction (row slices: B/C unavailable; ref-independent --
        # the 8.4.1.3 early rule applies when B and C are missing)
        left_ok = ~first
        pmvx = jnp.where(left_ok & (lkind != KIND_INTRA), lmvx, 0)
        pmvy = jnp.where(left_ok & (lkind != KIND_INTRA), lmvy, 0)

        # per-reference ME; lowest SAD wins, ties to the smaller index
        mvx = mvy = inter_sad = refsel = None
        for n in range(n_refs):
            dx_n, dy_n, sad_n = _me_16x16(qbands_n[n][0], ymb, pmvx, pmvy)
            mvx_n, mvy_n, sad_n = _me_subpel(
                qbands_n[n], ymb, dx_n, dy_n, sad_n
            )
            if n == 0:
                mvx, mvy, inter_sad = mvx_n, mvy_n, sad_n
                refsel = jnp.zeros_like(sad_n)
            else:
                better = sad_n < inter_sad
                mvx = jnp.where(better, mvx_n, mvx)
                mvy = jnp.where(better, mvy_n, mvy)
                inter_sad = jnp.where(better, sad_n, inter_sad)
                refsel = jnp.where(better, n, refsel)
        imode, ipred, intra_sad = _intra16_costs(left_y, first, ymb)
        use_intra = intra_sad < inter_sad

        # --- inter path (MC from the selected reference) ---
        def sel_ref(parts):  # list of [S,R,...] per ref -> selected
            out = parts[0]
            for n in range(1, n_refs):
                out = jnp.where(
                    (refsel == n)[..., None, None], parts[n], out
                )
            return out

        predl = sel_ref([_mc_qpel(qb, mvx, mvy) for qb in qbands_n])
        l_zz, ql_flat, cbp4 = _transform_inter_luma(ymb, predl, qp)

        if t8:
            # 8x8 transform trial (High profile, golden-mirrored RD pick)
            resid8 = (ymb - predl).reshape(s, r, 2, 8, 2, 8).swapaxes(-3, -2)
            z8 = T8.quant8x8(T8.forward8x8(resid8), qp, intra=False)
            zz8 = T8.zigzag8(z8)  # [S,R,2,2,64]
            nz8 = jnp.any(zz8 != 0, -1)
            cbp8 = (
                nz8[..., 0, 0].astype(jnp.int32)
                | (nz8[..., 0, 1].astype(jnp.int32) << 1)
                | (nz8[..., 1, 0].astype(jnp.int32) << 2)
                | (nz8[..., 1, 1].astype(jnp.int32) << 3)
            )
            pred8 = predl.reshape(s, r, 2, 8, 2, 8).swapaxes(-3, -2)
            rec8 = T8.idct8_add(pred8, T8.dequant8x8(z8, qp))
            rec8 = rec8.swapaxes(-3, -2).reshape(s, r, 16, 16)
        nzmask8 = jnp.repeat(
            jnp.repeat(
                (((cbp4[..., None, None] >> jnp.arange(4).reshape(2, 2)) & 1) == 1),
                2, axis=-1,
            ),
            2, axis=-2,
        )  # [S,R,4,4] per-block coded flag (wrong order guard: see below)

        predcu = sel_ref([_mc_chroma(cb, mvx, mvy, cp) for cb in cband_u_n])
        predcv = sel_ref([_mc_chroma(cb, mvx, mvy, cp) for cb in cband_v_n])
        dcu_i, acu_i, qu_i = _chroma_fwd(umb, predcu, qpc, intra=False)
        dcv_i, acv_i, qv_i = _chroma_fwd(vmb, predcv, qpc, intra=False)
        any_ac_i = jnp.any(acu_i != 0, (-1, -2, -3)) | jnp.any(acv_i != 0, (-1, -2, -3))
        any_dc_i = jnp.any(dcu_i != 0, (-1, -2)) | jnp.any(dcv_i != 0, (-1, -2))
        cbp_c_i = jnp.where(any_ac_i, 2, jnp.where(any_dc_i, 1, 0))

        rec_y_inter = _recon_inter_luma(predl, ql_flat, nzmask8, qp)

        if t8:
            lam8 = _LAMBDA8[jnp.clip(qp, 0, 51)]
            d4 = rec_y_inter - ymb
            d8 = rec8 - ymb
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
                zz8.reshape(s, r, 4, 64).reshape(s, r, 4, 4, 16),
                l_zz,
            )
        else:
            use_t8 = jnp.zeros(cbp4.shape, bool)
            cbp_l_inter = cbp4
            lzz_sel = l_zz

        is_skip = (
            (~use_intra) & (cbp_l_inter == 0) & (cbp_c_i == 0)
            & (mvx == 0) & (mvy == 0) & (refsel + ref_base == 0)
        )
        rec_u_inter = _recon_chroma(predcu, dcu_i, qu_i, cbp_c_i, qpc)
        rec_v_inter = _recon_chroma(predcv, dcv_i, qv_i, cbp_c_i, qpc)

        # --- intra path (I16x16, as in iframe) ---
        from .iframe import _encode_luma, _pred_chroma as _pc

        dc_zz, iac_zz, icbp, rec_y_intra = _encode_luma(ymb, ipred, qp)
        pu_dc, pu_h = _pc(left_u, first)
        pv_dc, pv_h = _pc(left_v, first)
        ccost_dc = _sad(umb, pu_dc) + _sad(vmb, pv_dc)
        ccost_h = jnp.where(
            first, jnp.iinfo(jnp.int32).max, _sad(umb, pu_h) + _sad(vmb, pv_h)
        )
        use_cdc = ccost_dc <= ccost_h
        icmode = jnp.where(use_cdc, 0, 1)
        ipredu = jnp.where(use_cdc[..., None, None], pu_dc, pu_h)
        ipredv = jnp.where(use_cdc[..., None, None], pv_dc, pv_h)
        dcu_a, acu_a, qu_a = _chroma_fwd(umb, ipredu, qpc, intra=True)
        dcv_a, acv_a, qv_a = _chroma_fwd(vmb, ipredv, qpc, intra=True)
        any_ac_a = jnp.any(acu_a != 0, (-1, -2, -3)) | jnp.any(acv_a != 0, (-1, -2, -3))
        any_dc_a = jnp.any(dcu_a != 0, (-1, -2)) | jnp.any(dcv_a != 0, (-1, -2))
        cbp_c_a = jnp.where(any_ac_a, 2, jnp.where(any_dc_a, 1, 0))
        rec_u_intra = _recon_chroma(ipredu, dcu_a, qu_a, cbp_c_a, qpc)
        rec_v_intra = _recon_chroma(ipredv, dcv_a, qv_a, cbp_c_a, qpc)

        # --- select ---
        kind = jnp.where(
            use_intra, KIND_INTRA, jnp.where(is_skip, KIND_SKIP, KIND_INTER)
        )
        sel = use_intra[..., None, None]
        rec_y = jnp.where(sel, rec_y_intra, rec_y_inter)
        rec_u = jnp.where(sel, rec_u_intra, rec_u_inter)
        rec_v = jnp.where(sel, rec_v_intra, rec_v_inter)

        mvdx = jnp.where(use_intra, 0, mvx - pmvx)
        mvdy = jnp.where(use_intra, 0, mvy - pmvy)
        out_mvx = jnp.where(use_intra, 0, mvx)
        out_mvy = jnp.where(use_intra, 0, mvy)
        out_ref = jnp.where(
            use_intra | is_skip, 0, refsel + ref_base
        ).astype(jnp.int32)
        out_t8 = jnp.where(
            use_intra | is_skip, 0, use_t8.astype(jnp.int32)
        )

        # symbol selection between paths
        sel1 = use_intra[..., None]
        sel3 = use_intra[..., None, None, None]
        luma_dc = jnp.where(sel1, dc_zz, 0)
        # intra AC layout: slot0 zero (set by _encode_luma); inter: full 16
        luma_ac = jnp.where(sel3, iac_zz, lzz_sel)
        cbp_luma = jnp.where(use_intra, icbp.astype(jnp.int32), cbp_l_inter)
        cbp_chroma = jnp.where(use_intra, cbp_c_a, cbp_c_i)
        sel2 = use_intra[..., None, None]
        cdc = jnp.where(
            sel2,
            jnp.stack([dcu_a.reshape(s, r, 4), dcv_a.reshape(s, r, 4)], -2),
            jnp.stack([dcu_i.reshape(s, r, 4), dcv_i.reshape(s, r, 4)], -2),
        )
        cac = jnp.where(
            sel3,
            jnp.stack([acu_a.reshape(s, r, 4, 15), acv_a.reshape(s, r, 4, 15)], -3),
            jnp.stack([acu_i.reshape(s, r, 4, 15), acv_i.reshape(s, r, 4, 15)], -3),
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

    carry0 = (
        jnp.zeros((s, r, 16), jnp.int32),
        jnp.zeros((s, r, 8), jnp.int32),
        jnp.zeros((s, r, 8), jnp.int32),
        jnp.zeros((s, r), jnp.int32),
        jnp.zeros((s, r), jnp.int32),
        jnp.full((s, r), KIND_INTRA, jnp.int32),
    )
    _, outs = jax.lax.scan(step, carry0, (y_mbs, u_mbs, v_mbs, cols))
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
    halo=True: vertically pre-extended references (row-sharded DPB)."""
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

    def to_scan(x):
        return jnp.moveaxis(x.astype(jnp.int32), 2, 0)

    refidx = (
        symbols.refidx if symbols.refidx is not None
        else jnp.zeros_like(symbols.kind)
    )
    t8flags = (
        symbols.t8 if symbols.t8 is not None
        else jnp.zeros_like(symbols.kind)
    )
    fields = [
        symbols.kind, symbols.mode, symbols.cmode, symbols.cbp_luma,
        symbols.cbp_chroma, symbols.mvdx, symbols.mvdy, symbols.luma_dc,
        symbols.luma_ac, symbols.chroma_dc, symbols.chroma_ac, refidx,
        t8flags,
    ]
    xs = tuple(to_scan(x) for x in fields) + (jnp.arange(c),)

    def step(carry, xs):
        left_y, left_u, left_v, lmvx, lmvy, lkind = carry
        (kind, mode, cmode, cbp_l, cbp_c, mvdx, mvdy,
         dc_zz, ac, cdc, cac, refi, t8f, col) = xs
        first = jnp.broadcast_to(col == 0, (s, r))

        qbands_n = [_qpel_bands(pl, col, r) for pl in planes_n]
        cband_u_n = [
            _row_windows(
                jax.lax.dynamic_slice_in_dim(rp, col * 8, 8 + 2 * cp, axis=2),
                r, 8, 8 + 2 * cp,
            )
            for rp in ref_up_n
        ]
        cband_v_n = [
            _row_windows(
                jax.lax.dynamic_slice_in_dim(rp, col * 8, 8 + 2 * cp, axis=2),
                r, 8, 8 + 2 * cp,
            )
            for rp in ref_vp_n
        ]

        def sel_ref(parts):
            out = parts[0]
            for n in range(1, n_refs):
                out = jnp.where((refi == n)[..., None, None], parts[n], out)
            return out

        left_ok = ~first
        pmvx = jnp.where(left_ok & (lkind != KIND_INTRA), lmvx, 0)
        pmvy = jnp.where(left_ok & (lkind != KIND_INTRA), lmvy, 0)
        is_intra = kind == KIND_INTRA
        is_skip = kind == KIND_SKIP
        mvx = jnp.where(is_intra, 0, jnp.where(is_skip, 0, pmvx + mvdx))
        mvy = jnp.where(is_intra, 0, jnp.where(is_skip, 0, pmvy + mvdy))

        # inter recon
        predl = sel_ref([_mc_qpel(qb, mvx, mvy) for qb in qbands_n])
        inter_cbp = jnp.where(is_skip, 0, cbp_l)
        nzmask8 = jnp.repeat(
            jnp.repeat(
                (((inter_cbp[..., None, None] >> jnp.arange(4).reshape(2, 2)) & 1) == 1),
                2, axis=-1,
            ),
            2, axis=-2,
        )
        ac4 = ac.reshape(s, r, 4, 4, 16)
        q_flat = T.inverse_zigzag(ac4).reshape(s, r, 4, 4, 16)
        rec_y_inter = _recon_inter_luma(predl, q_flat, nzmask8, qp)
        if t8:
            zz8 = ac.reshape(s, r, 4, 64).reshape(s, r, 2, 2, 64)
            pred8 = predl.reshape(s, r, 2, 8, 2, 8).swapaxes(-3, -2)
            rec8 = T8.idct8_add(
                pred8, T8.dequant8x8(T8.inverse_zigzag8(zz8), qp)
            ).swapaxes(-3, -2).reshape(s, r, 16, 16)
            rec_y_inter = jnp.where(
                (t8f == 1)[..., None, None], rec8, rec_y_inter
            )

        predcu = sel_ref([_mc_chroma(cb, mvx, mvy, cp) for cb in cband_u_n])
        predcv = sel_ref([_mc_chroma(cb, mvx, mvy, cp) for cb in cband_v_n])
        ccbp = jnp.where(is_skip, 0, cbp_c)
        dcu = cdc[..., 0, :].reshape(s, r, 2, 2)
        dcv = cdc[..., 1, :].reshape(s, r, 2, 2)

        def q_from_zz(ac_zz15):
            coeffs = jnp.concatenate(
                [jnp.zeros((s, r, 2, 2, 1), jnp.int32), ac_zz15], axis=-1
            )
            return T.inverse_zigzag(coeffs).reshape(s, r, 2, 2, 16)

        qu = q_from_zz(cac[..., 0, :, :].reshape(s, r, 2, 2, 15))
        qv = q_from_zz(cac[..., 1, :, :].reshape(s, r, 2, 2, 15))
        rec_u_inter = _recon_chroma(predcu, dcu, qu, ccbp, qpc)
        rec_v_inter = _recon_chroma(predcv, dcv, qv, ccbp, qpc)

        # intra recon (I16x16 in P)
        pred_dc, pred_h = _pred_luma(left_y, first)
        ipred = jnp.where((mode == 2)[..., None, None], pred_dc, pred_h)
        dc_deq = T.dequant_luma_dc(T.inverse_zigzag(dc_zz), qp)
        iq = jnp.where((cbp_l == 1)[..., None, None, None], ac4, 0)
        iq_flat = T.inverse_zigzag(iq).reshape(s, r, 4, 4, 16)
        d = _subst_dc(T.dequant_flat(iq_flat, qp), dc_deq)
        rec_y_intra = _blocks_to_mb(T.idct_add(_luma_blocks(ipred), d))
        pu_dc, pu_h = _pred_chroma(left_u, first)
        pv_dc, pv_h = _pred_chroma(left_v, first)
        csel = (cmode == 0)[..., None, None]
        ipredu = jnp.where(csel, pu_dc, pu_h)
        ipredv = jnp.where(csel, pv_dc, pv_h)
        rec_u_intra = _recon_chroma(ipredu, dcu, qu, cbp_c, qpc)
        rec_v_intra = _recon_chroma(ipredv, dcv, qv, cbp_c, qpc)

        sel = is_intra[..., None, None]
        rec_y = jnp.where(sel, rec_y_intra, rec_y_inter)
        rec_u = jnp.where(sel, rec_u_intra, rec_u_inter)
        rec_v = jnp.where(sel, rec_v_intra, rec_v_inter)

        new_carry = (
            rec_y[..., :, 15], rec_u[..., :, 7], rec_v[..., :, 7],
            mvx, mvy, kind,
        )
        return new_carry, (
            rec_y.astype(jnp.uint8),
            rec_u.astype(jnp.uint8),
            rec_v.astype(jnp.uint8),
            mvx.astype(jnp.int32),
            mvy.astype(jnp.int32),
        )

    carry0 = (
        jnp.zeros((s, r, 16), jnp.int32),
        jnp.zeros((s, r, 8), jnp.int32),
        jnp.zeros((s, r, 8), jnp.int32),
        jnp.zeros((s, r), jnp.int32),
        jnp.zeros((s, r), jnp.int32),
        jnp.full((s, r), KIND_INTRA, jnp.int32),
    )
    _, (ry, ru, rv, amvx, amvy) = jax.lax.scan(step, carry0, xs)
    return (
        _mbs_to_plane(_unscan(ry)),
        _mbs_to_plane(_unscan(ru)),
        _mbs_to_plane(_unscan(rv)),
    ), (_unscan(amvx), _unscan(amvy))
