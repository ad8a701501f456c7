"""In-loop deblocking filter on TPU (H.264 8.7), row-slice mode (idc=2).

Same scan structure as the encode/decode kernels: `lax.scan` over MB
columns, batched over [S, R].  Each step filters the vertical MB-boundary
edge against the previous MB (modifying the carried previous MB's last
columns -- the normative ordering), then the current MB's internal
vertical edges, then its internal horizontal edges.  With idc=2 and
row-slices, horizontal MB-boundary edges sit on slice boundaries and are
not filtered, which is exactly what keeps rows independent.

Bit-exact with tpuh264.golden.deblock (tests), which is bit-exact with
libavcodec.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..golden.deblock import ALPHA, BETA, TC0
from . import transform as T
from .iframe import _mb_view, _unscan, _mbs_to_plane
from .pframe import _unroll_factor

_ALPHA = jnp.asarray(ALPHA)
_BETA = jnp.asarray(BETA)
_TC0 = jnp.asarray(TC0)  # [52, 3]


def _tc0_sel(qp, bs):
    """tc0 by bS via selects: a per-element gather from the [52, 3]
    table lowers pathologically on TPU; three scalar rows + selects are
    pure VPU work."""
    t = _TC0[qp]  # [3], scalar row select
    return jnp.where(bs >= 3, t[2], jnp.where(bs == 2, t[1], t[0]))


def _filter_luma(seg: jnp.ndarray, bs: jnp.ndarray, qp):
    """seg [..., N, 8] rows [p3..p0 q0..q3]; bs [..., N]; returns filtered."""
    a = _ALPHA[qp]
    b = _BETA[qp]
    p3, p2, p1, p0 = (seg[..., i] for i in range(4))
    q0, q1, q2, q3 = (seg[..., i] for i in range(4, 8))
    filt = (
        (bs > 0)
        & (jnp.abs(p0 - q0) < a)
        & (jnp.abs(p1 - p0) < b)
        & (jnp.abs(q1 - q0) < b)
    )
    ap = jnp.abs(p2 - p0) < b
    aq = jnp.abs(q2 - q0) < b

    tc0 = _tc0_sel(qp, bs)
    tc = tc0 + ap.astype(jnp.int32) + aq.astype(jnp.int32)
    delta = jnp.clip(((q0 - p0) * 4 + (p1 - q1) + 4) >> 3, -tc, tc)
    np0 = jnp.clip(p0 + delta, 0, 255)
    nq0 = jnp.clip(q0 - delta, 0, 255)
    np1 = p1 + jnp.clip((p2 + ((p0 + q0 + 1) >> 1) - 2 * p1) >> 1, -tc0, tc0)
    nq1 = q1 + jnp.clip((q2 + ((p0 + q0 + 1) >> 1) - 2 * q1) >> 1, -tc0, tc0)

    strong = jnp.abs(p0 - q0) < ((a >> 2) + 2)
    strongp = ap & strong
    strongq = aq & strong
    sp0 = (p2 + 2 * p1 + 2 * p0 + 2 * q0 + q1 + 4) >> 3
    sp1 = (p2 + p1 + p0 + q0 + 2) >> 2
    sp2 = (2 * p3 + 3 * p2 + p1 + p0 + q0 + 4) >> 3
    wp0 = (2 * p1 + p0 + q1 + 2) >> 2
    sq0 = (q2 + 2 * q1 + 2 * q0 + 2 * p0 + p1 + 4) >> 3
    sq1 = (q2 + q1 + q0 + p0 + 2) >> 2
    sq2 = (2 * q3 + 3 * q2 + q1 + q0 + p0 + 4) >> 3
    wq0 = (2 * q1 + q0 + p1 + 2) >> 2

    is4 = bs == 4
    o_p0 = jnp.where(is4, jnp.where(strongp, sp0, wp0), np0)
    o_p1 = jnp.where(is4, jnp.where(strongp, sp1, p1), jnp.where(ap, np1, p1))
    o_p2 = jnp.where(is4 & strongp, sp2, p2)
    o_q0 = jnp.where(is4, jnp.where(strongq, sq0, wq0), nq0)
    o_q1 = jnp.where(is4, jnp.where(strongq, sq1, q1), jnp.where(aq, nq1, q1))
    o_q2 = jnp.where(is4 & strongq, sq2, q2)

    cols = [
        p3,
        jnp.where(filt, o_p2, p2),
        jnp.where(filt, o_p1, p1),
        jnp.where(filt, o_p0, p0),
        jnp.where(filt, o_q0, q0),
        jnp.where(filt, o_q1, q1),
        jnp.where(filt, o_q2, q2),
        q3,
    ]
    return jnp.stack(cols, axis=-1)


def _filter_chroma(seg: jnp.ndarray, bs: jnp.ndarray, qpc):
    """seg [..., N, 4] = [p1 p0 q0 q1]."""
    a = _ALPHA[qpc]
    b = _BETA[qpc]
    p1, p0, q0, q1 = (seg[..., i] for i in range(4))
    filt = (
        (bs > 0)
        & (jnp.abs(p0 - q0) < a)
        & (jnp.abs(p1 - p0) < b)
        & (jnp.abs(q1 - q0) < b)
    )
    tc = _tc0_sel(qpc, bs) + 1
    delta = jnp.clip(((q0 - p0) * 4 + (p1 - q1) + 4) >> 3, -tc, tc)
    np0 = jnp.clip(p0 + delta, 0, 255)
    nq0 = jnp.clip(q0 - delta, 0, 255)
    wp0 = (2 * p1 + p0 + q1 + 2) >> 2
    wq0 = (2 * q1 + q0 + p1 + 2) >> 2
    is4 = bs == 4
    o_p0 = jnp.where(is4, wp0, np0)
    o_q0 = jnp.where(is4, wq0, nq0)
    return jnp.stack(
        [p1, jnp.where(filt, o_p0, p0), jnp.where(filt, o_q0, q0), q1],
        axis=-1,
    )


def _bs_vertical_internal(intra, nnz_l, nnz_r):
    """bS of an internal vertical edge: nnz_* [S,R,4] block columns."""
    coded = (nnz_l > 0) | (nnz_r > 0)
    bs = jnp.where(coded, 2, 0)
    return jnp.where(intra[..., None], 3, bs)


def deblock_frame_rows(
    y: jnp.ndarray,
    u: jnp.ndarray,
    v: jnp.ndarray,
    kind: jnp.ndarray,   # [S, R, C] 0 skip / 1 inter / 2 intra
    mvx: jnp.ndarray,    # [S, R, C]
    mvy: jnp.ndarray,
    nnz: jnp.ndarray,    # [S, R, C, 4, 4] per-4x4 luma coded-coeff counts
    qp,
    refidx: jnp.ndarray = None,  # [S, R, C] refIdxL0 (multi-ref DPB)
    t8: jnp.ndarray = None,      # [S, R, C] transform_size_8x8_flag
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Filter frames in row-slice (idc=2) mode; returns uint8 planes.

    For t8 MBs the caller must pass `nnz` with 8x8-effective cells (each
    4x4 counts as coded iff its covering 8x8 is); the 4-aligned internal
    luma edges of t8 MBs are not filtered (8.7)."""
    qp = jnp.asarray(qp, jnp.int32)
    qpc = T.chroma_qp_from_luma(qp)
    s, h, w = y.shape
    r, c = h // 16, w // 16
    if refidx is None:
        refidx = jnp.zeros((s, r, c), jnp.int32)
    if t8 is None:
        t8 = jnp.zeros((s, r, c), jnp.int32)

    y_mbs = _mb_view(y.astype(jnp.int32), 16)  # [C, S, R, 16, 16]
    u_mbs = _mb_view(u.astype(jnp.int32), 8)
    v_mbs = _mb_view(v.astype(jnp.int32), 8)

    # several MB columns per scan step: the per-step tensors are small,
    # so the 120-step loop is launch-overhead-bound at 1080p -- unrolling
    # divides that overhead without changing the (sequential) data flow
    uf = _unroll_factor(c)

    def to_scan(x):
        x = jnp.moveaxis(x, 2, 0)
        return x.reshape(c // uf, uf, *x.shape[1:])

    def mb_scan(x):  # _mb_view output is already [C, ...]
        return x.reshape(c // uf, uf, *x.shape[1:])

    xs = (
        mb_scan(y_mbs), mb_scan(u_mbs), mb_scan(v_mbs),
        to_scan(kind.astype(jnp.int32)),
        to_scan(mvx.astype(jnp.int32)),
        to_scan(mvy.astype(jnp.int32)),
        to_scan(nnz.astype(jnp.int32)),
        to_scan(refidx.astype(jnp.int32)),
        to_scan(t8.astype(jnp.int32)),
        jnp.arange(c).reshape(c // uf, uf),
    )

    def vertical_edge(left_cols, right_cols, bs4, is_chroma):
        """left_cols [S,R,N,4], right_cols [S,R,N,4] -> filtered pair."""
        n = left_cols.shape[-2]
        rep = n // 4
        bs = jnp.repeat(bs4, rep, axis=-1)
        if is_chroma:
            seg = jnp.concatenate(
                [left_cols[..., 2:], right_cols[..., :2]], axis=-1
            )
            seg = _filter_chroma(seg, bs, qpc)
            lc = jnp.concatenate([left_cols[..., :2], seg[..., :2]], axis=-1)
            rc = jnp.concatenate([seg[..., 2:], right_cols[..., 2:]], axis=-1)
        else:
            seg = jnp.concatenate([left_cols, right_cols], axis=-1)
            seg = _filter_luma(seg, bs, qp)
            lc = seg[..., :4]
            rc = seg[..., 4:]
        return lc, rc

    def substep(carry, x):
        (prev_y, prev_u, prev_v, pkind, pmvx, pmvy, pnnz, pref,
         pvalid) = carry
        ymb, umb, vmb, k, mx, my, nz, ri, tf, col = x
        intra = k == 2

        # ---- vertical MB-boundary edge (prev | cur) ----
        both_intra = intra | (pkind == 2)
        coded = (pnnz[..., 3] > 0) | (nz[..., 0] > 0)  # [S,R,4] block rows
        mvdiff = (
            (jnp.abs(mx - pmvx) >= 4) | (jnp.abs(my - pmvy) >= 4)
            | (ri != pref)
        )
        bs_edge = jnp.where(
            both_intra[..., None], 4,
            jnp.where(coded, 2, jnp.where(mvdiff[..., None], 1, 0)),
        )
        bs_edge = jnp.where(pvalid[..., None], bs_edge, 0)

        lY, rY = vertical_edge(prev_y[..., 12:16], ymb[..., 0:4], bs_edge, False)
        prev_y = jnp.concatenate([prev_y[..., :12], lY], axis=-1)
        ymb = jnp.concatenate([rY, ymb[..., 4:]], axis=-1)
        lU, rU = vertical_edge(prev_u[..., 4:8], umb[..., 0:4], bs_edge, True)
        prev_u = jnp.concatenate([prev_u[..., :4], lU], axis=-1)
        umb = jnp.concatenate([rU, umb[..., 4:]], axis=-1)
        lV, rV = vertical_edge(prev_v[..., 4:8], vmb[..., 0:4], bs_edge, True)
        prev_v = jnp.concatenate([prev_v[..., :4], lV], axis=-1)
        vmb = jnp.concatenate([rV, vmb[..., 4:]], axis=-1)

        # ---- internal vertical edges x=4,8,12 ----
        for bx in (1, 2, 3):
            bs4 = _bs_vertical_internal(intra, nz[..., bx - 1], nz[..., bx])
            # nnz is [S,R,4(by),4(bx)] -> per-edge block rows use column bx
            bs4 = jnp.where(intra[..., None], 3,
                            jnp.where((nz[..., :, bx - 1] > 0) | (nz[..., :, bx] > 0), 2, 0))
            if bx in (1, 3):  # 8x8 transform: 4-aligned edges unfiltered
                bs4 = jnp.where((tf == 1)[..., None], 0, bs4)
            xe = 4 * bx
            lcols, rcols = vertical_edge(
                ymb[..., xe - 4 : xe], ymb[..., xe : xe + 4], bs4, False
            )
            ymb = jnp.concatenate(
                [ymb[..., : xe - 4], lcols, rcols, ymb[..., xe + 4 :]], axis=-1
            )
            if bx == 2:  # chroma internal vertical edge at x=4
                lc, rc = vertical_edge(umb[..., 0:4], umb[..., 4:8], bs4, True)
                umb = jnp.concatenate([lc, rc], axis=-1)
                lc, rc = vertical_edge(vmb[..., 0:4], vmb[..., 4:8], bs4, True)
                vmb = jnp.concatenate([lc, rc], axis=-1)

        # ---- internal horizontal edges y=4,8,12 (transpose trick) ----
        ymb_t = ymb.swapaxes(-1, -2)
        umb_t = umb.swapaxes(-1, -2)
        vmb_t = vmb.swapaxes(-1, -2)
        for by in (1, 2, 3):
            bs4 = jnp.where(intra[..., None], 3,
                            jnp.where((nz[..., by - 1, :] > 0) | (nz[..., by, :] > 0), 2, 0))
            if by in (1, 3):  # 8x8 transform: 4-aligned edges unfiltered
                bs4 = jnp.where((tf == 1)[..., None], 0, bs4)
            ye = 4 * by
            lrows, rrows = vertical_edge(
                ymb_t[..., ye - 4 : ye], ymb_t[..., ye : ye + 4], bs4, False
            )
            ymb_t = jnp.concatenate(
                [ymb_t[..., : ye - 4], lrows, rrows, ymb_t[..., ye + 4 :]],
                axis=-1,
            )
            if by == 2:
                lc, rc = vertical_edge(umb_t[..., 0:4], umb_t[..., 4:8], bs4, True)
                umb_t = jnp.concatenate([lc, rc], axis=-1)
                lc, rc = vertical_edge(vmb_t[..., 0:4], vmb_t[..., 4:8], bs4, True)
                vmb_t = jnp.concatenate([lc, rc], axis=-1)
        ymb = ymb_t.swapaxes(-1, -2)
        umb = umb_t.swapaxes(-1, -2)
        vmb = vmb_t.swapaxes(-1, -2)

        new_carry = (ymb, umb, vmb, k, mx, my, nz, ri,
                     jnp.ones_like(pvalid))
        del tf
        return new_carry, (prev_y, prev_u, prev_v)

    def step(carry, x):
        outs = []
        for uu in range(uf):
            carry, o = substep(carry, tuple(f[uu] for f in x))
            outs.append(o)
        return carry, tuple(
            jnp.stack([o[i] for o in outs]) for i in range(3)
        )

    zero_mb = jnp.zeros((s, r, 16, 16), jnp.int32)
    zero_c = jnp.zeros((s, r, 8, 8), jnp.int32)
    carry0 = (
        zero_mb, zero_c, zero_c,
        jnp.zeros((s, r), jnp.int32),
        jnp.zeros((s, r), jnp.int32),
        jnp.zeros((s, r), jnp.int32),
        jnp.zeros((s, r, 4, 4), jnp.int32),
        jnp.zeros((s, r), jnp.int32),
        jnp.zeros((s, r), dtype=bool),
    )
    carry, (oy, ou, ov) = jax.lax.scan(step, carry0, xs)
    oy = oy.reshape(c, *oy.shape[2:])
    ou = ou.reshape(c, *ou.shape[2:])
    ov = ov.reshape(c, *ov.shape[2:])
    # outputs are shifted by one step: out[c] = finalized MB c-1; append last
    oy = jnp.concatenate([oy[1:], carry[0][None]], axis=0)
    ou = jnp.concatenate([ou[1:], carry[1][None]], axis=0)
    ov = jnp.concatenate([ov[1:], carry[2][None]], axis=0)
    return (
        _mbs_to_plane(_unscan(oy)).astype(jnp.uint8),
        _mbs_to_plane(_unscan(ou)).astype(jnp.uint8),
        _mbs_to_plane(_unscan(ov)).astype(jnp.uint8),
    )


deblock_frame_rows = jax.jit(deblock_frame_rows)
