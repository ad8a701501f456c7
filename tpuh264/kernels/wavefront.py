"""TPU single-slice I-frame kernel: anti-diagonal wavefront scan.

Single-slice streams have cross-row prediction (V/Plane Intra_16x16
modes, top neighbors everywhere), so MB (r, c) depends on (r, c-1),
(r-1, c) and (r-1, c-1).  Ordering macroblocks by wave w = 2r + c makes
every dependency strictly earlier, so a `lax.scan` over waves advances
one MB per row-lane per step with all lanes vectorized over [S, R] --
the classic H.264 wavefront (SURVEY.md section 5 "long-context" row),
here as compiler-friendly fixed-shape compute with dynamic column
gathers instead of threads.

Carried state is the dependency frontier, not the frame: per-column
bottom rows (top neighbors), per-row right columns (left neighbors),
and per-column saved corners (p[-1,-1], snapshotted before the row
below overwrites the column entry).  Invalid lanes (c outside the
frame) write through index C with scatter mode='drop'.

Bit-exact with tpuh264.golden.codec slice_mode='single' (tests enforce
stream equality); mode decision order mirrors the golden encoder's
iteration (DC, V, H, Plane -- first strict minimum wins).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import transform as T
from .iframe import (
    MBSymbols,
    _encode_chroma,
    _encode_luma,
    _recon_chroma_from_flat,
    _recon_chroma_from_zz,
    _luma_blocks,
    _blocks_to_mb,
    _subst_dc,
    _sad,
)


def _plane_pred(top, left, corner, n: int, scale: int):
    """Plane prediction (8.3.3.4 / 8.3.4.4) batched over leading axes.

    top/left [..., n], corner [...]; n = 16 luma (scale 5) or 8 chroma
    (scale 34 -- the 4:2:0 c constant; luma uses 5)."""
    half = n // 2
    px = jnp.concatenate([corner[..., None], top], axis=-1)  # index x+1
    py = jnp.concatenate([corner[..., None], left], axis=-1)
    xs = np.arange(half)
    h = sum(
        int(x + 1) * (px[..., half + x + 1] - px[..., half - 2 - x + 1])
        for x in xs
    )
    v = sum(
        int(x + 1) * (py[..., half + x + 1] - py[..., half - 2 - x + 1])
        for x in xs
    )
    a = 16 * (top[..., n - 1] + left[..., n - 1])
    b = (scale * h + 32) >> 6
    c = (scale * v + 32) >> 6
    yy, xx = np.mgrid[0:n, 0:n]
    yy = jnp.asarray(yy - (half - 1))
    xx = jnp.asarray(xx - (half - 1))
    out = (
        a[..., None, None]
        + b[..., None, None] * xx
        + c[..., None, None] * yy
        + 16
    ) >> 5
    return jnp.clip(out, 0, 255)


def _luma_preds(top, left, corner, t_av, l_av):
    """All four I16 predictions [..., 16, 16] + DC availability handling."""
    shape = (*top.shape[:-1], 16, 16)
    pv = jnp.broadcast_to(top[..., None, :], shape)
    ph = jnp.broadcast_to(left[..., :, None], shape)
    st, sl = top.sum(-1), left.sum(-1)
    dc = jnp.where(
        t_av & l_av,
        (st + sl + 16) >> 5,
        jnp.where(t_av, (st + 8) >> 4, jnp.where(l_av, (sl + 8) >> 4, 128)),
    )
    pdc = jnp.broadcast_to(dc[..., None, None], shape)
    pp = _plane_pred(top, left, corner, 16, 5)
    return pv, ph, pdc, pp


def _chroma_dc_pred(top, left, t_av, l_av):
    """Quadrant chroma DC (8.3.4.1), batched; top/left [..., 8]."""
    ts = top.reshape(*top.shape[:-1], 2, 4).sum(-1)   # [., 2] per bx
    ls = left.reshape(*left.shape[:-1], 2, 4).sum(-1)  # [., 2] per by
    both = t_av & l_av

    def corner_dc(t, l):  # blocks (0,0), (1,1)
        return jnp.where(
            both, (t + l + 4) >> 3,
            jnp.where(t_av, (t + 2) >> 2, jnp.where(l_av, (l + 2) >> 2, 128)),
        )

    def top_pref(t, l):  # block (1,0)
        return jnp.where(
            t_av, (t + 2) >> 2, jnp.where(l_av, (l + 2) >> 2, 128)
        )

    def left_pref(t, l):  # block (0,1)
        return jnp.where(
            l_av, (l + 2) >> 2, jnp.where(t_av, (t + 2) >> 2, 128)
        )

    d00 = corner_dc(ts[..., 0], ls[..., 0])
    d10 = top_pref(ts[..., 1], ls[..., 0])
    d01 = left_pref(ts[..., 0], ls[..., 1])
    d11 = corner_dc(ts[..., 1], ls[..., 1])
    row0 = jnp.stack([d00, d10], -1)  # bx axis
    row1 = jnp.stack([d01, d11], -1)
    q = jnp.stack([row0, row1], -2)  # [., by, bx]
    return jnp.repeat(jnp.repeat(q, 4, -2), 4, -1)  # [., 8, 8]


def _chroma_preds(top, left, corner, t_av, l_av):
    shape = (*top.shape[:-1], 8, 8)
    pdc = _chroma_dc_pred(top, left, t_av, l_av)
    ph = jnp.broadcast_to(left[..., :, None], shape)
    pv = jnp.broadcast_to(top[..., None, :], shape)
    pp = _plane_pred(top, left, corner, 8, 34)
    return pdc, ph, pv, pp


_BIG = jnp.int32(jnp.iinfo(jnp.int32).max)


def _pick(costs, avail, order, modes):
    """First-strict-minimum over `order` (golden iteration semantics).

    costs/avail: lists indexed like `order`; returns (mode [.], idx [.])."""
    stack = jnp.stack(
        [jnp.where(avail[i], costs[i], _BIG) for i in order], axis=-1
    )
    idx = jnp.argmin(stack, axis=-1)
    mode_map = jnp.asarray([modes[i] for i in order], jnp.int32)
    return mode_map[idx], idx


@functools.partial(jax.jit, static_argnames=())
def encode_iframe_single(
    y: jnp.ndarray, u: jnp.ndarray, v: jnp.ndarray, qp
) -> Tuple[MBSymbols, Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]]:
    """Encode a batch of frames as single-slice I-frames (wavefront).

    Same output contract as iframe.encode_iframe_scan; prediction has
    full neighbor availability (V/DC/H/Plane), matching
    golden.codec.encode_iframe(slice_mode='single') bit-exactly.
    """
    qpc = T.chroma_qp_from_luma(qp)
    s, hgt, wid = y.shape
    r, c = hgt // 16, wid // 16
    nw = 2 * (r - 1) + c

    y_t = y.astype(jnp.int32).reshape(s, r, 16, c, 16).transpose(0, 1, 3, 2, 4)
    u_t = u.astype(jnp.int32).reshape(s, r, 8, c, 8).transpose(0, 1, 3, 2, 4)
    v_t = v.astype(jnp.int32).reshape(s, r, 8, c, 8).transpose(0, 1, 3, 2, 4)

    rows = jnp.arange(r)
    lane_has_top = rows > 0  # static availability by lane

    def take_col(tiles, ci):
        idx = ci.reshape(1, r, 1, 1, 1)
        return jnp.take_along_axis(tiles, idx, axis=2)[:, :, 0]

    def take_row(buf, ci):  # buf [S, C(+1), n] -> [S, R, n]
        idx = ci.reshape(1, r, 1)
        return jnp.take_along_axis(buf[:, :, :], idx, axis=1)

    def step(carry, w):
        (colrow_y, colrow_u, colrow_v, corn_y, corn_u, corn_v,
         left_y, left_u, left_v) = carry
        cc = w - 2 * rows                       # [R] column per lane
        valid = (cc >= 0) & (cc < c)
        ci = jnp.clip(cc, 0, c - 1)
        ci_w = jnp.where(valid, ci, c)          # scatter index (C = drop)

        ymb = take_col(y_t, ci)                 # [S, R, 16, 16]
        umb = take_col(u_t, ci)
        vmb = take_col(v_t, ci)

        t_av = jnp.broadcast_to(lane_has_top & valid, (s, r))
        l_av = jnp.broadcast_to((cc > 0) & valid, (s, r))

        top_y = take_row(colrow_y, ci)          # [S, R, 16]
        top_u = take_row(colrow_u, ci)
        top_v = take_row(colrow_v, ci)
        cim1 = jnp.clip(ci - 1, 0, c - 1)
        x_y = take_row(corn_y[..., None], cim1)[..., 0]
        x_u = take_row(corn_u[..., None], cim1)[..., 0]
        x_v = take_row(corn_v[..., None], cim1)[..., 0]

        # --- luma mode decision (golden order: DC, V, H, Plane) ---
        pv, ph, pdc, pp = _luma_preds(top_y, left_y, x_y, t_av, l_av)
        costs = [_sad(ymb, pv), _sad(ymb, ph), _sad(ymb, pdc), _sad(ymb, pp)]
        avail = [t_av, l_av, jnp.ones_like(t_av), t_av & l_av]
        mode, idx = _pick(costs, avail, order=(2, 0, 1, 3),
                          modes=(0, 1, 2, 3))
        preds = jnp.stack([pdc, pv, ph, pp], axis=-3)  # order (2,0,1,3)
        pred = jnp.take_along_axis(
            preds, idx[..., None, None, None], axis=-3
        )[..., 0, :, :]

        dc_zz, ac_zz, cbp_luma, rec_y = _encode_luma(ymb, pred, qp)

        # --- chroma (golden order: DC, H, V, Plane == mode numbers) ---
        pu = _chroma_preds(top_u, left_u, x_u, t_av, l_av)
        pvc = _chroma_preds(top_v, left_v, x_v, t_av, l_av)
        ccosts = [_sad(umb, pu[i]) + _sad(vmb, pvc[i]) for i in range(4)]
        cavail = [jnp.ones_like(t_av), l_av, t_av, t_av & l_av]
        cmode, cidx = _pick(ccosts, cavail, order=(0, 1, 2, 3),
                            modes=(0, 1, 2, 3))
        pus = jnp.stack(pu, axis=-3)
        pvs = jnp.stack(pvc, axis=-3)
        predu = jnp.take_along_axis(
            pus, cidx[..., None, None, None], axis=-3)[..., 0, :, :]
        predv = jnp.take_along_axis(
            pvs, cidx[..., None, None, None], axis=-3)[..., 0, :, :]

        dcu, acu, qu = _encode_chroma(umb, predu, qpc)
        dcv, acv, qv = _encode_chroma(vmb, predv, qpc)
        any_ac = jnp.any(acu != 0, (-1, -2, -3)) | jnp.any(acv != 0, (-1, -2, -3))
        any_dc = jnp.any(dcu != 0, (-1, -2)) | jnp.any(dcv != 0, (-1, -2))
        cbp_chroma = jnp.where(any_ac, 2, jnp.where(any_dc, 1, 0))
        rec_u = _recon_chroma_from_flat(predu, dcu, qu, cbp_chroma, qpc)
        rec_v = _recon_chroma_from_flat(predv, dcv, qv, cbp_chroma, qpc)

        # --- frontier update ---
        new_left = (
            jnp.where(valid[None, :, None], rec_y[..., :, 15], left_y),
            jnp.where(valid[None, :, None], rec_u[..., :, 7], left_u),
            jnp.where(valid[None, :, None], rec_v[..., :, 7], left_v),
        )
        old_corner_y = top_y[..., 15]
        old_corner_u = top_u[..., 7]
        old_corner_v = top_v[..., 7]
        corn_y2 = corn_y.at[:, ci_w].set(old_corner_y, mode="drop")
        corn_u2 = corn_u.at[:, ci_w].set(old_corner_u, mode="drop")
        corn_v2 = corn_v.at[:, ci_w].set(old_corner_v, mode="drop")
        colrow_y2 = colrow_y.at[:, ci_w].set(rec_y[..., 15, :], mode="drop")
        colrow_u2 = colrow_u.at[:, ci_w].set(rec_u[..., 7, :], mode="drop")
        colrow_v2 = colrow_v.at[:, ci_w].set(rec_v[..., 7, :], mode="drop")

        out = (
            mode,
            cmode,
            cbp_luma.astype(jnp.int32),
            cbp_chroma.astype(jnp.int32),
            dc_zz.astype(jnp.int16),
            ac_zz.reshape(s, r, 16, 16).astype(jnp.int16),
            jnp.stack([dcu.reshape(s, r, 4), dcv.reshape(s, r, 4)],
                      axis=-2).astype(jnp.int16),
            jnp.stack([acu.reshape(s, r, 4, 15), acv.reshape(s, r, 4, 15)],
                      axis=-3).astype(jnp.int16),
            rec_y.astype(jnp.uint8),
            rec_u.astype(jnp.uint8),
            rec_v.astype(jnp.uint8),
        )
        carry2 = (colrow_y2, colrow_u2, colrow_v2, corn_y2, corn_u2,
                  corn_v2) + new_left
        return carry2, out

    carry0 = (
        jnp.zeros((s, c + 1, 16), jnp.int32),
        jnp.zeros((s, c + 1, 8), jnp.int32),
        jnp.zeros((s, c + 1, 8), jnp.int32),
        jnp.zeros((s, c + 1), jnp.int32),
        jnp.zeros((s, c + 1), jnp.int32),
        jnp.zeros((s, c + 1), jnp.int32),
        jnp.zeros((s, r, 16), jnp.int32),
        jnp.zeros((s, r, 8), jnp.int32),
        jnp.zeros((s, r, 8), jnp.int32),
    )
    _, outs = jax.lax.scan(step, carry0, jnp.arange(nw))
    return _collect(outs, s, r, c)


def _collect(outs, s, r, c):
    """[NW, S, R, ...] wave-stacked outputs -> raster [S, R, C, ...]."""
    widx = jnp.asarray(
        [[2 * rr + cc for cc in range(c)] for rr in range(r)], jnp.int32
    )  # [R, C]
    rr = jnp.arange(r)[:, None]

    def pick(x):
        xt = jnp.moveaxis(x, 0, 2)  # [S, R, NW, ...]
        return xt[:, rr, widx]      # [S, R, C, ...]

    (mode, cmode, cbp_l, cbp_c, dc_zz, ac_zz, cdc, cac, ry, ru, rv) = outs
    symbols = MBSymbols(
        mode=pick(mode),
        cmode=pick(cmode),
        cbp_luma=pick(cbp_l),
        cbp_chroma=pick(cbp_c),
        luma_dc=pick(dc_zz),
        luma_ac=pick(ac_zz),
        chroma_dc=pick(cdc),
        chroma_ac=pick(cac),
        i4modes=jnp.full((s, r, c, 16), -1, jnp.int16),
    )

    def plane(tiles, n):
        # [S, R, C, n, n] -> [S, R*n, C*n]
        return tiles.transpose(0, 1, 3, 2, 4).reshape(s, r * n, c * n)

    recon = (
        plane(pick(ry), 16),
        plane(pick(ru), 8),
        plane(pick(rv), 8),
    )
    return symbols, recon


@jax.jit
def decode_iframe_single(
    symbols: MBSymbols, qp
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Wavefront reconstruction from parsed single-slice symbols."""
    qpc = T.chroma_qp_from_luma(qp)
    s, r, c = symbols.mode.shape
    nw = 2 * (r - 1) + c
    rows = jnp.arange(r)
    lane_has_top = rows > 0

    def sym_col(x, ci):
        extra = x.ndim - 3
        idx = ci.reshape(1, r, 1, *([1] * extra))
        return jnp.take_along_axis(x, idx.astype(jnp.int32), axis=2)[:, :, 0]

    fields = [
        symbols.mode.astype(jnp.int32), symbols.cmode.astype(jnp.int32),
        symbols.cbp_luma.astype(jnp.int32),
        symbols.cbp_chroma.astype(jnp.int32),
        symbols.luma_dc.astype(jnp.int32), symbols.luma_ac.astype(jnp.int32),
        symbols.chroma_dc.astype(jnp.int32),
        symbols.chroma_ac.astype(jnp.int32),
    ]

    def take_row(buf, ci):
        idx = ci.reshape(1, r, 1)
        return jnp.take_along_axis(buf, idx, axis=1)

    def step(carry, w):
        (colrow_y, colrow_u, colrow_v, corn_y, corn_u, corn_v,
         left_y, left_u, left_v) = carry
        cc = w - 2 * rows
        valid = (cc >= 0) & (cc < c)
        ci = jnp.clip(cc, 0, c - 1)
        ci_w = jnp.where(valid, ci, c)

        mode, cmode, cbp_l, cbp_c, dc_zz, ac_zz, cdc, cac = (
            sym_col(x, ci) for x in fields
        )
        t_av = jnp.broadcast_to(lane_has_top & valid, (s, r))
        l_av = jnp.broadcast_to((cc > 0) & valid, (s, r))

        top_y = take_row(colrow_y, ci)
        top_u = take_row(colrow_u, ci)
        top_v = take_row(colrow_v, ci)
        cim1 = jnp.clip(ci - 1, 0, c - 1)
        x_y = take_row(corn_y[..., None], cim1)[..., 0]
        x_u = take_row(corn_u[..., None], cim1)[..., 0]
        x_v = take_row(corn_v[..., None], cim1)[..., 0]

        pv, ph, pdc, pp = _luma_preds(top_y, left_y, x_y, t_av, l_av)
        preds = jnp.stack([pv, ph, pdc, pp], axis=-3)  # by mode number
        pred = jnp.take_along_axis(
            preds, mode[..., None, None, None], axis=-3
        )[..., 0, :, :]

        dc_deq = T.dequant_luma_dc(T.inverse_zigzag(dc_zz), qp)
        ac = ac_zz.reshape(s, r, 4, 4, 16)
        coeffs = jnp.where((cbp_l == 1)[..., None, None, None], ac, 0)
        q_flat = T.inverse_zigzag(coeffs).reshape(s, r, 4, 4, 16)
        d = _subst_dc(T.dequant_flat(q_flat, qp), dc_deq)
        rec_y = _blocks_to_mb(T.idct_add(_luma_blocks(pred), d))

        pu = _chroma_preds(top_u, left_u, x_u, t_av, l_av)
        pvc = _chroma_preds(top_v, left_v, x_v, t_av, l_av)
        pus = jnp.stack(pu, axis=-3)
        pvs = jnp.stack(pvc, axis=-3)
        predu = jnp.take_along_axis(
            pus, cmode[..., None, None, None], axis=-3)[..., 0, :, :]
        predv = jnp.take_along_axis(
            pvs, cmode[..., None, None, None], axis=-3)[..., 0, :, :]
        rec_u = _recon_chroma_from_zz(
            predu, cdc[..., 0, :].reshape(s, r, 2, 2),
            cac[..., 0, :, :].reshape(s, r, 2, 2, 15), cbp_c, qpc)
        rec_v = _recon_chroma_from_zz(
            predv, cdc[..., 1, :].reshape(s, r, 2, 2),
            cac[..., 1, :, :].reshape(s, r, 2, 2, 15), cbp_c, qpc)

        new_left = (
            jnp.where(valid[None, :, None], rec_y[..., :, 15], left_y),
            jnp.where(valid[None, :, None], rec_u[..., :, 7], left_u),
            jnp.where(valid[None, :, None], rec_v[..., :, 7], left_v),
        )
        corn_y2 = corn_y.at[:, ci_w].set(top_y[..., 15], mode="drop")
        corn_u2 = corn_u.at[:, ci_w].set(top_u[..., 7], mode="drop")
        corn_v2 = corn_v.at[:, ci_w].set(top_v[..., 7], mode="drop")
        colrow_y2 = colrow_y.at[:, ci_w].set(rec_y[..., 15, :], mode="drop")
        colrow_u2 = colrow_u.at[:, ci_w].set(rec_u[..., 7, :], mode="drop")
        colrow_v2 = colrow_v.at[:, ci_w].set(rec_v[..., 7, :], mode="drop")

        out = (
            rec_y.astype(jnp.uint8),
            rec_u.astype(jnp.uint8),
            rec_v.astype(jnp.uint8),
        )
        carry2 = (colrow_y2, colrow_u2, colrow_v2, corn_y2, corn_u2,
                  corn_v2) + new_left
        return carry2, out

    carry0 = (
        jnp.zeros((s, c + 1, 16), jnp.int32),
        jnp.zeros((s, c + 1, 8), jnp.int32),
        jnp.zeros((s, c + 1, 8), jnp.int32),
        jnp.zeros((s, c + 1), jnp.int32),
        jnp.zeros((s, c + 1), jnp.int32),
        jnp.zeros((s, c + 1), jnp.int32),
        jnp.zeros((s, r, 16), jnp.int32),
        jnp.zeros((s, r, 8), jnp.int32),
        jnp.zeros((s, r, 8), jnp.int32),
    )
    _, (ry, ru, rv) = jax.lax.scan(step, carry0, jnp.arange(nw))

    widx = jnp.asarray(
        [[2 * rr + cc for cc in range(c)] for rr in range(r)], jnp.int32
    )
    rr = jnp.arange(r)[:, None]

    def pick_plane(x, n):
        xt = jnp.moveaxis(x, 0, 2)
        tiles = xt[:, rr, widx]
        return tiles.transpose(0, 1, 3, 2, 4).reshape(s, r * n, c * n)

    return pick_plane(ry, 16), pick_plane(ru, 8), pick_plane(rv, 8)
