"""TPU Intra_4x4 luma prediction + causal in-MB scan (H.264 8.3.1).

Bit-exact JAX counterpart of tpuh264.golden.intra44 / the I4x4 paths of
golden.codec (_code_i44_luma / _decode_i44_mb), specialized to the
row-slice layout of kernels/iframe.py: the MB row above is a different
slice, so only in-MB top neighbors exist (blocks with by > 0) and the
only cross-MB dependency is the left column -- which is exactly the
lax.scan carry the column scan already threads.

Design: all nine prediction modes are affine forms over the 13 neighbor
samples n = [L0..3, X, T0..3, TR0..3]: pred = (W @ n + R) >> S with
per-(mode, pixel) integer weight/round/shift tables built once at import
from the same formulas as the numpy oracle (golden/intra44.py:19-123).
One [9,16,13] einsum per 4x4 block batch gives every directional mode at
once on the VPU; DC (availability-dependent normalization) is merged in
with a constant one-hot mask -- no scatters anywhere.  The 16-block
z-scan (BLK_SCAN) is unrolled in Python, so every slice index is static.

Mode decision matches the golden encoder exactly: SAD over available
modes, ascending mode index wins ties (argmin first-occurrence ==
golden's sorted-iteration strict-less), and the MB-level I16-vs-I4x4
choice uses the same Lagrangian bias table sad44 + int(0.92 *
2^((qp-12)/6) * 64) < sad16 (golden/codec.py:213-218).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
import numpy as np

from . import transform as T

# luma4x4BlkIdx scan order as (bx, by) -- must match entropy/pack.py
BLK_SCAN = [
    (0, 0), (1, 0), (0, 1), (1, 1),
    (2, 0), (3, 0), (2, 1), (3, 1),
    (0, 2), (1, 2), (0, 3), (1, 3),
    (2, 2), (3, 2), (2, 3), (3, 3),
]

# neighbor vector layout: [L0..3, X, T0..3, TR0..3]
_IL = list(range(0, 4))
_IX = 4
_IT = list(range(5, 9))
_ITR = list(range(9, 13))


def _build_tables() -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(W [9,16,13], R [9,16], S [9,16]) int32 tables; mode 2 row is zero
    (DC is availability-dependent and handled separately)."""
    W = np.zeros((9, 16, 13), np.int64)
    R = np.zeros((9, 16), np.int64)
    S = np.zeros((9, 16), np.int64)

    def t(k):  # T/TR joint index, k in 0..7
        return _IT[k] if k < 4 else _ITR[k - 4]

    def tq(k):  # p[k,-1] with k >= -1
        return t(k) if k >= 0 else _IX

    def lq(k):  # p[-1,k] with k >= -1
        return _IL[k] if k >= 0 else _IX

    for yy in range(4):
        for xx in range(4):
            p = 4 * yy + xx
            # mode 0: Vertical
            W[0, p, _IT[xx]] = 1
            # mode 1: Horizontal
            W[1, p, _IL[yy]] = 1
            # mode 3: Diagonal down-left (8.3.1.2.4)
            i = xx + yy
            if i == 6:
                W[3, p, t(6)] += 1
                W[3, p, t(7)] += 3
            else:
                W[3, p, t(i)] += 1
                W[3, p, t(i + 1)] += 2
                W[3, p, t(i + 2)] += 1
            R[3, p], S[3, p] = 2, 2
            # mode 4: Diagonal down-right (8.3.1.2.5)
            if xx > yy:
                d = xx - yy
                for k, c in ((d - 2, 1), (d - 1, 2), (d, 1)):
                    W[4, p, tq(k)] += c
            elif xx < yy:
                d = yy - xx
                for k, c in ((d - 2, 1), (d - 1, 2), (d, 1)):
                    W[4, p, lq(k)] += c
            else:
                W[4, p, tq(0)] += 1
                W[4, p, _IX] += 2
                W[4, p, lq(0)] += 1
            R[4, p], S[4, p] = 2, 2
            # mode 5: Vertical-right (8.3.1.2.6)
            z = 2 * xx - yy
            k = xx - (yy >> 1)
            if z >= 0 and z % 2 == 0:
                W[5, p, tq(k - 1)] += 1
                W[5, p, tq(k)] += 1
                R[5, p], S[5, p] = 1, 1
            elif z >= 0:
                W[5, p, tq(k - 2)] += 1
                W[5, p, tq(k - 1)] += 2
                W[5, p, tq(k)] += 1
                R[5, p], S[5, p] = 2, 2
            elif z == -1:
                W[5, p, lq(0)] += 1
                W[5, p, _IX] += 2
                W[5, p, tq(0)] += 1
                R[5, p], S[5, p] = 2, 2
            else:
                W[5, p, lq(yy - 1)] += 1
                W[5, p, lq(yy - 2)] += 2
                W[5, p, lq(yy - 3)] += 1
                R[5, p], S[5, p] = 2, 2
            # mode 6: Horizontal-down (8.3.1.2.7)
            z = 2 * yy - xx
            k = yy - (xx >> 1)
            if z >= 0 and z % 2 == 0:
                W[6, p, lq(k - 1)] += 1
                W[6, p, lq(k)] += 1
                R[6, p], S[6, p] = 1, 1
            elif z >= 0:
                W[6, p, lq(k - 2)] += 1
                W[6, p, lq(k - 1)] += 2
                W[6, p, lq(k)] += 1
                R[6, p], S[6, p] = 2, 2
            elif z == -1:
                W[6, p, tq(0)] += 1
                W[6, p, _IX] += 2
                W[6, p, lq(0)] += 1
                R[6, p], S[6, p] = 2, 2
            else:
                W[6, p, tq(xx - 1)] += 1
                W[6, p, tq(xx - 2)] += 2
                W[6, p, tq(xx - 3)] += 1
                R[6, p], S[6, p] = 2, 2
            # mode 7: Vertical-left (8.3.1.2.8)
            i = xx + (yy >> 1)
            if yy % 2 == 0:
                W[7, p, t(i)] += 1
                W[7, p, t(i + 1)] += 1
                R[7, p], S[7, p] = 1, 1
            else:
                W[7, p, t(i)] += 1
                W[7, p, t(i + 1)] += 2
                W[7, p, t(i + 2)] += 1
                R[7, p], S[7, p] = 2, 2
            # mode 8: Horizontal-up (8.3.1.2.9)
            z = xx + 2 * yy
            if z % 2 == 0 and z <= 4:
                i = yy + (xx >> 1)
                W[8, p, _IL[i]] += 1
                W[8, p, _IL[i + 1]] += 1
                R[8, p], S[8, p] = 1, 1
            elif z <= 3:
                i = yy + (xx >> 1)
                W[8, p, _IL[i]] += 1
                W[8, p, _IL[i + 1]] += 2
                W[8, p, _IL[i + 2]] += 1
                R[8, p], S[8, p] = 2, 2
            elif z == 5:
                W[8, p, _IL[2]] += 1
                W[8, p, _IL[3]] += 3
                R[8, p], S[8, p] = 2, 2
            else:
                W[8, p, _IL[3]] += 1
    return (
        W.astype(np.int32),
        R.astype(np.int32),
        S.astype(np.int32),
    )


_W_NP, _R_NP, _S_NP = _build_tables()
_W = jnp.asarray(_W_NP)
_R = jnp.asarray(_R_NP)
_S = jnp.asarray(_S_NP)
_DC_ONEHOT = jnp.asarray(
    (np.arange(9) == 2).astype(np.int32)[:, None]
)  # [9,1]

# Lagrangian I16-vs-I4x4 bias per QP (golden/codec.py:215-218), computed
# in float64 on the host so int() truncation matches Python exactly.
_BIAS_NP = np.array(
    [int(0.92 * 2.0 ** ((qp - 12) / 6.0) * 64) for qp in range(52)], np.int32
)
_BIAS = jnp.asarray(_BIAS_NP)


def bias_for_qp(qp) -> jnp.ndarray:
    """Traced-QP Lagrangian bias lookup."""
    return _BIAS[jnp.clip(jnp.asarray(qp, jnp.int32), 0, 51)]


def pred_directional(n: jnp.ndarray) -> jnp.ndarray:
    """All directional modes at once: n [..., 13] int32 -> [..., 9, 16].
    The mode-2 slot is zero (filled by the caller from pred_dc)."""
    acc = jnp.einsum(
        "...k,mpk->...mp", n.astype(jnp.int32), _W,
        preferred_element_type=jnp.int32,
    )
    return (acc + _R) >> _S


def pred_dc(L: jnp.ndarray, Tv: jnp.ndarray, l_ok, t_ok) -> jnp.ndarray:
    """DC prediction value [...,]; L/Tv [..., 4]; l_ok/t_ok bool [...,]."""
    sl = L.sum(-1)
    st = Tv.sum(-1)
    return jnp.where(
        t_ok & l_ok,
        (st + sl + 4) >> 3,
        jnp.where(t_ok, (st + 2) >> 2, jnp.where(l_ok, (sl + 2) >> 2, 128)),
    )


def merge_dc(preds: jnp.ndarray, dc: jnp.ndarray) -> jnp.ndarray:
    """Insert the DC value into mode slot 2 of [..., 9, 16] (mask, not
    scatter)."""
    return preds * (1 - _DC_ONEHOT) + dc[..., None, None] * _DC_ONEHOT


def _static_tr_kind(bi: int) -> str:
    """TR availability in rows-slice mode is static per z-scan index:
    'real' (in-MB samples), 'repl' (T[3] replicated), or 'none' (by==0).
    Mirrors golden/codec.py:_i44_neighbors causality rules."""
    bx, by = BLK_SCAN[bi]
    if by == 0:
        return "none"
    if bx == 3:
        return "repl"  # top-right MB on the same row: future in raster
    nb = BLK_SCAN.index((bx + 1, by - 1))
    return "real" if nb < bi else "repl"


def _avail9(l_ok, t_ok: bool):
    """[..., 9] bool availability; l_ok traced, t_ok static (rows mode)."""
    shape = l_ok.shape
    out = []
    for m in range(9):
        if m == 2:
            a = jnp.ones(shape, bool)
        elif m in (0, 3, 7):
            a = jnp.full(shape, t_ok)
        elif m in (1, 8):
            a = l_ok
        else:  # 4, 5, 6
            a = l_ok if t_ok else jnp.zeros(shape, bool)
        out.append(a)
    return jnp.stack(out, axis=-1)


def _gather_neighbors(cur, leftcol, l_ok_mb, bi: int):
    """Neighbor vector n [..., 13] + (l_ok, t_ok static) for block bi.

    cur: [..., 16, 16] partial MB reconstruction (int32);
    leftcol: [..., 16] right column of the left MB; l_ok_mb: [...] bool.
    """
    bx, by = BLK_SCAN[bi]
    if bx > 0:
        L = cur[..., 4 * by : 4 * by + 4, 4 * bx - 1]
        l_ok = jnp.ones_like(l_ok_mb)
    else:
        L = leftcol[..., 4 * by : 4 * by + 4]
        l_ok = l_ok_mb
    t_ok = by > 0
    if t_ok:
        Tv = cur[..., 4 * by - 1, 4 * bx : 4 * bx + 4]
        kind = _static_tr_kind(bi)
        if kind == "real":
            TR = cur[..., 4 * by - 1, 4 * bx + 4 : 4 * bx + 8]
        else:
            TR = jnp.broadcast_to(Tv[..., 3:4], Tv.shape)
        if bx > 0:
            X = cur[..., 4 * by - 1, 4 * bx - 1]
        else:
            X = leftcol[..., 4 * by - 1]
    else:
        Tv = jnp.zeros_like(L)
        TR = jnp.zeros_like(L)
        X = jnp.zeros(L.shape[:-1], jnp.int32)
    n = jnp.concatenate([L, X[..., None], Tv, TR], axis=-1)
    return n, L, Tv, l_ok, t_ok


def encode_mb(src_mb, leftcol, l_ok_mb, qp):
    """Causal I4x4 trial over one MB batch (encode side).

    src_mb [..., 16, 16] int32; leftcol [..., 16] int32; l_ok_mb [...] bool.
    Returns (sad [...], modes [..., 16] z-scan, coeffs [..., 16, 16] raster
    blocks x zigzag, cbp4 [...] 4-bit, rec [..., 16, 16] int32).
    """
    lead = src_mb.shape[:-2]
    cur = jnp.zeros(src_mb.shape, jnp.int32)
    sad = jnp.zeros(lead, jnp.int32)
    modes = [None] * 16
    coeffs = [None] * 16  # raster index 4*by+bx
    nz = [None] * 16      # per z-scan block: any nonzero coeff
    maxi = jnp.iinfo(jnp.int32).max

    for bi, (bx, by) in enumerate(BLK_SCAN):
        n, L, Tv, l_ok, t_ok = _gather_neighbors(cur, leftcol, l_ok_mb, bi)
        preds = merge_dc(pred_directional(n), pred_dc(L, Tv, l_ok, t_ok))
        src = src_mb[..., 4 * by : 4 * by + 4, 4 * bx : 4 * bx + 4]
        src_flat = src.reshape(*lead, 16).astype(jnp.int32)
        cost = jnp.abs(src_flat[..., None, :] - preds).sum(-1)  # [..., 9]
        cost = jnp.where(_avail9(l_ok, t_ok), cost, maxi)
        m = jnp.argmin(cost, axis=-1).astype(jnp.int32)
        sad = sad + jnp.take_along_axis(cost, m[..., None], -1)[..., 0]
        pred = jnp.take_along_axis(
            preds, m[..., None, None], -2
        )[..., 0, :].reshape(*lead, 4, 4)

        q = T.quant4x4(T.forward4x4(src - pred), qp, intra=True)
        zz = T.zigzag(q)  # [..., 16]
        rec = T.idct_add(pred, T.dequant4x4(q, qp))
        cur = cur.at[..., 4 * by : 4 * by + 4, 4 * bx : 4 * bx + 4].set(rec)
        modes[bi] = m
        coeffs[4 * by + bx] = zz.astype(jnp.int16)
        nz[bi] = jnp.any(zz != 0, axis=-1)

    cbp = jnp.zeros(lead, jnp.int32)
    for i8 in range(4):
        bit = nz[4 * i8] | nz[4 * i8 + 1] | nz[4 * i8 + 2] | nz[4 * i8 + 3]
        cbp = cbp | (bit.astype(jnp.int32) << i8)
    return (
        sad,
        jnp.stack(modes, axis=-1),
        jnp.stack(coeffs, axis=-2),
        cbp,
        cur,
    )


def decode_mb(coeffs, modes, leftcol, l_ok_mb, qp):
    """Causal I4x4 reconstruction from parsed symbols (decode side).

    coeffs [..., 16, 16] raster blocks x zigzag int; modes [..., 16]
    z-scan; leftcol [..., 16]; l_ok_mb [...] bool.  Returns rec
    [..., 16, 16] int32.
    """
    lead = modes.shape[:-1]
    cur = jnp.zeros((*lead, 16, 16), jnp.int32)
    for bi, (bx, by) in enumerate(BLK_SCAN):
        n, L, Tv, l_ok, t_ok = _gather_neighbors(cur, leftcol, l_ok_mb, bi)
        preds = merge_dc(pred_directional(n), pred_dc(L, Tv, l_ok, t_ok))
        m = modes[..., bi].astype(jnp.int32)
        pred = jnp.take_along_axis(
            preds, m[..., None, None], -2
        )[..., 0, :].reshape(*lead, 4, 4)
        zz = coeffs[..., 4 * by + bx, :].astype(jnp.int32)
        d = T.dequant4x4(T.inverse_zigzag(zz), qp)
        rec = T.idct_add(pred, d)
        cur = cur.at[..., 4 * by : 4 * by + 4, 4 * bx : 4 * bx + 4].set(rec)
    return cur


# -- numpy reference of the table path, for unit tests ----------------------

def pred_all_np(n: np.ndarray, l_ok: bool, t_ok: bool) -> np.ndarray:
    """Host-side [9, 4, 4] predictions from a 13-neighbor vector (DC uses
    the availability flags); for testing the tables against the oracle."""
    acc = _W_NP @ n.astype(np.int64)  # [9, 16]
    out = ((acc + _R_NP) >> _S_NP).astype(np.int32)
    L, Tv = n[0:4], n[5:9]
    if t_ok and l_ok:
        dc = (int(Tv.sum()) + int(L.sum()) + 4) >> 3
    elif t_ok:
        dc = (int(Tv.sum()) + 2) >> 2
    elif l_ok:
        dc = (int(L.sum()) + 2) >> 2
    else:
        dc = 128
    out[2] = dc
    return out.reshape(9, 4, 4)
