"""TPU I-frame encoder/decoder core: row-slice parallel macroblock scan.

Design (SURVEY.md section 7, parallelism table): each MB row is its own
slice, so there are no top-neighbor dependencies -- the only causal chain
is the left neighbor within a row.  That turns the frame into a
`lax.scan` over MB columns with *all* (stream, row) pairs advancing in
lockstep as one big vector batch: the TPU analog of the reference's
independent-stream worker pool (/root/reference/scripts/app.js:351,521)
pushed down to slice granularity (multi-slice parallel encode,
BASELINE.json config 4).

Per scan step, every compute is batched over [S (streams), R (rows)]:
prediction (DC/H -- the modes available without a top neighbor),
forward 4x4 transforms, quant, dequant, reconstruction.  Entropy coding
consumes the emitted symbol tensors on the host (CAVLC has no cross-block
bit state given nC, so symbolization parallelizes; bit concatenation is
native code -- see native/cavlc.cpp).

Performance notes: no scatter ops anywhere (zigzag both ways is a gather;
the DC slot is substituted with a concat); symbol tensors are int16 and
reconstructions uint8 to halve/quarter host<->HBM transfer volume.

All integer math is bit-exact with tpuh264.golden.codec (tests enforce
stream equality), which libavcodec in turn decodes bit-exactly.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from . import intra44 as I44
from . import transform as T


class MBSymbols(NamedTuple):
    """Per-MB entropy symbols, layouts shared with native/cavlc.cpp.

    `mode` 0..3 = Intra_16x16 prediction mode; 4 = Intra_4x4 MB (then
    `i4modes` holds the per-block modes, `cbp_luma` is the 4-bit per-8x8
    pattern, `luma_ac` holds full 16-coefficient zigzag blocks and
    `luma_dc` is unused).
    """

    mode: jnp.ndarray        # [S, R, C] int32 luma pred mode (4 = I4x4)
    cmode: jnp.ndarray       # [S, R, C] int32 chroma pred mode
    cbp_luma: jnp.ndarray    # [S, R, C] int32 0/1 (I16) or 0..15 (I4x4)
    cbp_chroma: jnp.ndarray  # [S, R, C] int32 0..2
    luma_dc: jnp.ndarray     # [S, R, C, 16] int16 zigzag levels
    luma_ac: jnp.ndarray     # [S, R, C, 16, 16] int16 zigzag (slot 0 unused I16)
    chroma_dc: jnp.ndarray   # [S, R, C, 2, 4] int16 (Cb, Cr) raster DC levels
    chroma_ac: jnp.ndarray   # [S, R, C, 2, 4, 15] int16 block raster (by*2+bx)
    i4modes: Optional[jnp.ndarray] = None  # [S, R, C, 16] int16 z-scan, -1=n/a


# mode-decision lambda table + rate proxy (mirrors golden/codec.py
# LAMBDA8_MODE / _coeff_bits exactly; integer only)
_LAMBDA8 = jnp.asarray(
    [int(0.85 * 2.0 ** ((qp - 12) / 3.0) * 8) for qp in range(52)],
    jnp.int32,
)
_POW2_16 = jnp.asarray([1 << k for k in range(16)], jnp.int32)


def _rate_bits(coeffs: jnp.ndarray, axes) -> jnp.ndarray:
    """Sum of 2*bit_length(|c|)+1 over nonzero levels along `axes`."""
    a = jnp.abs(coeffs.astype(jnp.int32))
    bl = (a[..., None] >= _POW2_16).sum(-1)
    bits = jnp.where(a > 0, 2 * bl + 1, 0)
    return bits.sum(axes)


def _mb_view(plane: jnp.ndarray, mb: int) -> jnp.ndarray:
    """[S, H, W] -> [C, S, R, mb, mb] (scan axis first)."""
    s, h, w = plane.shape
    r, c = h // mb, w // mb
    return plane.reshape(s, r, mb, c, mb).transpose(3, 0, 1, 2, 4)


def _unscan(x: jnp.ndarray) -> jnp.ndarray:
    """[C, S, R, ...] -> [S, R, C, ...]."""
    return jnp.moveaxis(x, 0, 2)


def _mbs_to_plane(mbs: jnp.ndarray) -> jnp.ndarray:
    """[S, R, C, mb, mb] -> [S, R*mb, C*mb]."""
    s, r, c, mb, _ = mbs.shape
    return mbs.transpose(0, 1, 3, 2, 4).reshape(s, r * mb, c * mb)


def _pred_luma(left: jnp.ndarray, is_first: jnp.ndarray):
    """DC and H prediction given left column [., 16]; is_first masks avail."""
    dc_val = jnp.where(is_first, 128, (left.sum(-1) + 8) >> 4)  # [.]
    pred_dc = jnp.broadcast_to(dc_val[..., None, None], (*dc_val.shape, 16, 16))
    pred_h = jnp.broadcast_to(left[..., :, None], (*left.shape, 16))
    return pred_dc, pred_h


def _pred_chroma(left: jnp.ndarray, is_first: jnp.ndarray):
    """Chroma DC (per 4-row group from left) and H prediction, [., 8]."""
    halves = left.reshape(*left.shape[:-1], 2, 4)  # rows 0-3 / 4-7
    dcs = (halves.sum(-1) + 2) >> 2  # [., 2]
    dcs = jnp.where(is_first[..., None], 128, dcs)
    pred_dc = jnp.broadcast_to(
        dcs[..., :, None, None], (*dcs.shape, 4, 8)
    ).reshape(*left.shape[:-1], 8, 8)
    pred_h = jnp.broadcast_to(left[..., :, None], (*left.shape, 8))
    return pred_dc, pred_h


def _sad(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return jnp.abs(a - b).sum((-1, -2))


def _luma_blocks(mb16: jnp.ndarray) -> jnp.ndarray:
    """[., 16, 16] -> [., 4, 4, 4, 4] as (by, bx, y, x)."""
    lead = mb16.shape[:-2]
    return mb16.reshape(*lead, 4, 4, 4, 4).swapaxes(-3, -2)


def _blocks_to_mb(blocks: jnp.ndarray) -> jnp.ndarray:
    lead = blocks.shape[:-4]
    return blocks.swapaxes(-3, -2).reshape(*lead, 16, 16)


def _chroma_blocks(mb8: jnp.ndarray) -> jnp.ndarray:
    lead = mb8.shape[:-2]
    return mb8.reshape(*lead, 2, 4, 2, 4).swapaxes(-3, -2)


def _cblocks_to_mb(blocks: jnp.ndarray) -> jnp.ndarray:
    lead = blocks.shape[:-4]
    return blocks.swapaxes(-3, -2).reshape(*lead, 8, 8)


def _subst_dc(d_flat: jnp.ndarray, dc: jnp.ndarray) -> jnp.ndarray:
    """Replace raster element 0 of [..., 16] with dc [...] (concat, not
    scatter) and reshape to [..., 4, 4]."""
    d = jnp.concatenate([dc[..., None], d_flat[..., 1:]], axis=-1)
    return d.reshape(*d.shape[:-1], 4, 4)


def _encode_luma(src, pred, qp):
    """Transform+quant+recon of one luma MB batch. Returns symbols + recon."""
    resid = src - pred
    w = T.forward4x4(_luma_blocks(resid))  # [., 4,4,4,4]
    dc = w[..., 0, 0]  # [., 4, 4]
    dc_zz = T.zigzag(T.quant_luma_dc(T.hadamard4x4(dc), qp))  # [., 16]
    q_flat = T.quant4x4(w, qp, intra=True).reshape(*w.shape[:-2], 16)
    ac_zz = q_flat[..., T._ZZ]  # [., 4,4,16] zigzag; slot 0 = DC (not coded)
    ac_zz = jnp.concatenate(
        [jnp.zeros((*ac_zz.shape[:-1], 1), jnp.int32), ac_zz[..., 1:]], axis=-1
    )
    cbp = jnp.any(ac_zz != 0, axis=(-1, -2, -3))  # [.]

    dc_deq = T.dequant_luma_dc(T.inverse_zigzag(dc_zz), qp)  # [., 4,4]
    dq = T.dequant_flat(
        jnp.where(cbp[..., None, None, None], q_flat, 0), qp
    )  # [., 4,4,16]
    d = _subst_dc(dq, dc_deq)
    rec = _blocks_to_mb(T.idct_add(_luma_blocks(pred), d))
    return dc_zz, ac_zz, cbp, rec


def _encode_chroma(src, pred, qpc):
    """One chroma component: quantized DC (2,2), AC (2,2,15), flat coeffs."""
    resid = src - pred
    w = T.forward4x4(_chroma_blocks(resid))  # [., 2,2,4,4]
    dcq = T.quant_chroma_dc(T.hadamard2x2(w[..., 0, 0]), qpc)  # [., 2,2]
    q_flat = T.quant4x4(w, qpc, intra=True).reshape(*w.shape[:-2], 16)
    ac_zz = q_flat[..., T._ZZ][..., 1:]  # [., 2,2,15]
    return dcq, ac_zz, q_flat


def _recon_chroma_from_flat(pred, dcq, q_flat, cbp_chroma, qpc):
    dc_deq = jnp.where(
        (cbp_chroma >= 1)[..., None, None], T.dequant_chroma_dc(dcq, qpc), 0
    )
    dq = T.dequant_flat(
        jnp.where((cbp_chroma == 2)[..., None, None, None], q_flat, 0), qpc
    )
    d = _subst_dc(dq, dc_deq)
    return _cblocks_to_mb(T.idct_add(_chroma_blocks(pred), d))


def _recon_chroma_from_zz(pred, dcq, ac_zz, cbp_chroma, qpc):
    """Decode-side variant: AC arrives in zigzag order [., 2, 2, 15]."""
    coeffs = jnp.concatenate(
        [jnp.zeros((*ac_zz.shape[:-1], 1), jnp.int32), ac_zz], axis=-1
    )
    q_flat = T.inverse_zigzag(coeffs).reshape(*ac_zz.shape[:-1], 16)
    return _recon_chroma_from_flat(pred, dcq, q_flat, cbp_chroma, qpc)


@functools.partial(jax.jit, static_argnames=("intra44",))
def encode_iframe_scan(
    y: jnp.ndarray, u: jnp.ndarray, v: jnp.ndarray, qp, intra44: bool = False
) -> Tuple[MBSymbols, Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]]:
    """Encode a batch of frames as I-frames with per-MB-row slices.

    y: [S, H, W] uint8/int (H, W multiples of 16); u, v: [S, H/2, W/2];
    qp: traced int32 scalar (no recompile when rate control moves it).
    intra44 (static): enable the per-MB Intra_4x4 trial + Lagrangian
    I16-vs-I4x4 decision (golden/codec.py:213-218).
    Returns (symbols, (recon_y, recon_u, recon_v)) with uint8 recon.
    """
    qpc = T.chroma_qp_from_luma(qp)
    s, h, w = y.shape
    r, c = h // 16, w // 16

    y_mbs = _mb_view(y.astype(jnp.int32), 16)  # [C, S, R, 16, 16]
    u_mbs = _mb_view(u.astype(jnp.int32), 8)
    v_mbs = _mb_view(v.astype(jnp.int32), 8)
    cols = jnp.arange(c)

    def step(carry, xs):
        left_y, left_u, left_v = carry  # [S,R,16], [S,R,8], [S,R,8]
        ymb, umb, vmb, col = xs
        first = jnp.broadcast_to(col == 0, (s, r))

        pred_dc, pred_h = _pred_luma(left_y, first)
        cost_dc = _sad(ymb, pred_dc)
        cost_h = jnp.where(first, jnp.iinfo(jnp.int32).max, _sad(ymb, pred_h))
        use_dc = cost_dc <= cost_h
        mode = jnp.where(use_dc, 2, 1)
        pred = jnp.where(use_dc[..., None, None], pred_dc, pred_h)

        dc_zz, ac_zz, cbp_luma, rec_y = _encode_luma(ymb, pred, qp)

        if intra44:
            sad44, m44, coef44, cbp44, rec44 = I44.encode_mb(
                ymb, left_y, ~first, qp
            )
            # RD decision mirroring golden/codec.py exactly:
            # J = 8*SSD(recon, src) + lam8[qp] * rate_proxy
            d16 = rec_y - ymb
            d44 = rec44 - ymb
            ssd16 = jnp.sum(d16 * d16, axis=(-1, -2))
            ssd44 = jnp.sum(d44 * d44, axis=(-1, -2))
            r16 = 8 + _rate_bits(dc_zz, (-1,)) + _rate_bits(
                ac_zz, (-1, -2, -3)
            )
            r44 = 96 + _rate_bits(coef44.astype(jnp.int32), (-1, -2))
            lam8 = _LAMBDA8[jnp.clip(qp, 0, 51)]
            use_i4 = 8 * ssd44 + lam8 * r44 < 8 * ssd16 + lam8 * r16
            mode = jnp.where(use_i4, 4, mode)
            cbp_luma = jnp.where(use_i4, cbp44, cbp_luma.astype(jnp.int32))
            dc_zz = jnp.where(use_i4[..., None], 0, dc_zz)
            ac_zz = jnp.where(
                use_i4[..., None, None, None],
                coef44.astype(jnp.int32).reshape(s, r, 4, 4, 16),
                ac_zz,
            )
            rec_y = jnp.where(use_i4[..., None, None], rec44, rec_y)
            i4modes = jnp.where(use_i4[..., None], m44, -1).astype(jnp.int16)
        else:
            i4modes = jnp.full((s, r, 16), -1, jnp.int16)

        pu_dc, pu_h = _pred_chroma(left_u, first)
        pv_dc, pv_h = _pred_chroma(left_v, first)
        ccost_dc = _sad(umb, pu_dc) + _sad(vmb, pv_dc)
        ccost_h = jnp.where(
            first, jnp.iinfo(jnp.int32).max, _sad(umb, pu_h) + _sad(vmb, pv_h)
        )
        use_cdc = ccost_dc <= ccost_h
        cmode = jnp.where(use_cdc, 0, 1)
        predu = jnp.where(use_cdc[..., None, None], pu_dc, pu_h)
        predv = jnp.where(use_cdc[..., None, None], pv_dc, pv_h)

        dcu, acu, qu = _encode_chroma(umb, predu, qpc)
        dcv, acv, qv = _encode_chroma(vmb, predv, qpc)
        any_ac = jnp.any(acu != 0, (-1, -2, -3)) | jnp.any(acv != 0, (-1, -2, -3))
        any_dc = jnp.any(dcu != 0, (-1, -2)) | jnp.any(dcv != 0, (-1, -2))
        cbp_chroma = jnp.where(any_ac, 2, jnp.where(any_dc, 1, 0))

        rec_u = _recon_chroma_from_flat(predu, dcu, qu, cbp_chroma, qpc)
        rec_v = _recon_chroma_from_flat(predv, dcv, qv, cbp_chroma, qpc)

        new_carry = (rec_y[..., :, 15], rec_u[..., :, 7], rec_v[..., :, 7])
        out = (
            mode.astype(jnp.int32),
            cmode.astype(jnp.int32),
            cbp_luma.astype(jnp.int32),
            cbp_chroma.astype(jnp.int32),
            dc_zz.astype(jnp.int16),
            ac_zz.reshape(s, r, 16, 16).astype(jnp.int16),
            jnp.stack(
                [dcu.reshape(s, r, 4), dcv.reshape(s, r, 4)], axis=-2
            ).astype(jnp.int16),
            jnp.stack(
                [acu.reshape(s, r, 4, 15), acv.reshape(s, r, 4, 15)], axis=-3
            ).astype(jnp.int16),
            i4modes,
            rec_y.astype(jnp.uint8),
            rec_u.astype(jnp.uint8),
            rec_v.astype(jnp.uint8),
        )
        return new_carry, out

    carry0 = (
        jnp.zeros((s, r, 16), jnp.int32),
        jnp.zeros((s, r, 8), jnp.int32),
        jnp.zeros((s, r, 8), jnp.int32),
    )
    _, outs = jax.lax.scan(step, carry0, (y_mbs, u_mbs, v_mbs, cols))
    (mode, cmode, cbp_l, cbp_c, dc_zz, ac_zz, cdc, cac, i4m, ry, ru, rv) = outs

    symbols = MBSymbols(
        mode=_unscan(mode),
        cmode=_unscan(cmode),
        cbp_luma=_unscan(cbp_l),
        cbp_chroma=_unscan(cbp_c),
        luma_dc=_unscan(dc_zz),
        luma_ac=_unscan(ac_zz),
        chroma_dc=_unscan(cdc),
        chroma_ac=_unscan(cac),
        i4modes=_unscan(i4m),
    )
    recon = (
        _mbs_to_plane(_unscan(ry)),
        _mbs_to_plane(_unscan(ru)),
        _mbs_to_plane(_unscan(rv)),
    )
    return symbols, recon


def encode_iframe_rows(y, u, v, qp):
    """I16-only encode scan (the devpipe/bench fast path)."""
    return encode_iframe_scan(y, u, v, qp, intra44=False)


@functools.partial(jax.jit, static_argnames=("intra44",))
def decode_iframe_scan(
    symbols: MBSymbols, qp, intra44: bool = False
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Reconstruct frames from parsed symbols (inverse of encode scan)."""
    qpc = T.chroma_qp_from_luma(qp)
    s, r, c = symbols.mode.shape

    def to_scan(x):
        return jnp.moveaxis(x.astype(jnp.int32), 2, 0)

    fields = [
        symbols.mode, symbols.cmode, symbols.cbp_luma, symbols.cbp_chroma,
        symbols.luma_dc, symbols.luma_ac, symbols.chroma_dc, symbols.chroma_ac,
    ]
    if intra44:
        fields.append(symbols.i4modes)
    xs = tuple(to_scan(x) for x in fields) + (jnp.arange(c),)

    def step(carry, xs):
        left_y, left_u, left_v = carry
        if intra44:
            mode, cmode, cbp_l, cbp_c, dc_zz, ac_zz, cdc, cac, i4m, col = xs
        else:
            mode, cmode, cbp_l, cbp_c, dc_zz, ac_zz, cdc, cac = xs[:8]
            col = xs[8]
        first = jnp.broadcast_to(col == 0, (s, r))

        pred_dc, pred_h = _pred_luma(left_y, first)
        pred = jnp.where((mode == 2)[..., None, None], pred_dc, pred_h)
        dc_deq = T.dequant_luma_dc(T.inverse_zigzag(dc_zz), qp)
        ac = ac_zz.reshape(s, r, 4, 4, 16)
        coeffs = jnp.where((cbp_l == 1)[..., None, None, None], ac, 0)
        q_flat = T.inverse_zigzag(coeffs).reshape(s, r, 4, 4, 16)
        d = _subst_dc(T.dequant_flat(q_flat, qp), dc_deq)
        rec_y = _blocks_to_mb(T.idct_add(_luma_blocks(pred), d))

        if intra44:
            rec44 = I44.decode_mb(
                ac_zz.reshape(s, r, 16, 16), i4m, left_y, ~first, qp
            )
            rec_y = jnp.where((mode == 4)[..., None, None], rec44, rec_y)

        pu_dc, pu_h = _pred_chroma(left_u, first)
        pv_dc, pv_h = _pred_chroma(left_v, first)
        cdc_sel = (cmode == 0)[..., None, None]
        predu = jnp.where(cdc_sel, pu_dc, pu_h)
        predv = jnp.where(cdc_sel, pv_dc, pv_h)
        rec_u = _recon_chroma_from_zz(
            predu, cdc[..., 0, :].reshape(s, r, 2, 2),
            cac[..., 0, :, :].reshape(s, r, 2, 2, 15), cbp_c, qpc
        )
        rec_v = _recon_chroma_from_zz(
            predv, cdc[..., 1, :].reshape(s, r, 2, 2),
            cac[..., 1, :, :].reshape(s, r, 2, 2, 15), cbp_c, qpc
        )

        new_carry = (rec_y[..., :, 15], rec_u[..., :, 7], rec_v[..., :, 7])
        return new_carry, (
            rec_y.astype(jnp.uint8),
            rec_u.astype(jnp.uint8),
            rec_v.astype(jnp.uint8),
        )

    carry0 = (
        jnp.zeros((s, r, 16), jnp.int32),
        jnp.zeros((s, r, 8), jnp.int32),
        jnp.zeros((s, r, 8), jnp.int32),
    )
    _, (ry, ru, rv) = jax.lax.scan(step, carry0, xs)
    return (
        _mbs_to_plane(_unscan(ry)),
        _mbs_to_plane(_unscan(ru)),
        _mbs_to_plane(_unscan(rv)),
    )


def decode_iframe_rows(symbols: MBSymbols, qp):
    """I16-only decode scan (the devpipe/bench fast path)."""
    return decode_iframe_scan(symbols, qp, intra44=False)


# ---------------------------------------------------------------------------
# Fused symbol transport: the host<->device link (PCIe, or a tunnel in dev
# environments) charges per-transfer latency, so the eight symbol tensors
# travel as ONE flat int16 buffer.
# ---------------------------------------------------------------------------

def symbol_sizes(s: int, r: int, c: int, i4: bool = False):
    """(field, shape, size) table for the flat layout."""
    n = s * r * c
    sizes = [
        ("mode", (s, r, c), n),
        ("cmode", (s, r, c), n),
        ("cbp_luma", (s, r, c), n),
        ("cbp_chroma", (s, r, c), n),
        ("luma_dc", (s, r, c, 16), n * 16),
        ("luma_ac", (s, r, c, 16, 16), n * 256),
        ("chroma_dc", (s, r, c, 2, 4), n * 8),
        ("chroma_ac", (s, r, c, 2, 4, 15), n * 120),
    ]
    if i4:
        sizes.append(("i4modes", (s, r, c, 16), n * 16))
    return sizes


@jax.jit
def flatten_symbols(symbols: MBSymbols) -> jnp.ndarray:
    """Pack all symbol tensors into one flat int16 device buffer.
    `i4modes` travels last iff present, so I16-only consumers keep their
    existing layout."""
    parts = [
        symbols.mode.astype(jnp.int16).reshape(-1),
        symbols.cmode.astype(jnp.int16).reshape(-1),
        symbols.cbp_luma.astype(jnp.int16).reshape(-1),
        symbols.cbp_chroma.astype(jnp.int16).reshape(-1),
        symbols.luma_dc.reshape(-1),
        symbols.luma_ac.reshape(-1),
        symbols.chroma_dc.reshape(-1),
        symbols.chroma_ac.reshape(-1),
    ]
    if symbols.i4modes is not None:
        parts.append(symbols.i4modes.reshape(-1))
    return jnp.concatenate(parts)


def unflatten_symbols_np(flat, s: int, r: int, c: int, i4: bool = False):
    """Host-side inverse of flatten_symbols; returns dict of numpy views."""
    import numpy as np

    out = {}
    off = 0
    for name, shape, size in symbol_sizes(s, r, c, i4):
        out[name] = np.asarray(flat[off : off + size]).reshape(shape)
        off += size
    return out
