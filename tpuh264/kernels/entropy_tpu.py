"""On-device CAVLC: the entropy stage as TPU vector code.

CAVLC has no cross-block bit state once nC is known, and with row-slices
nC is a *static* neighbor relation (left block / top-block-within-MB), so
the whole entropy stage parallelizes (SURVEY.md section 7, hard part 1):

  1. nC grids from per-block total_coeff counts (shifted-array gathers);
  2. per-block VLC slot streams (coeff_token / signs / levels /
     total_zeros / run_before), every slot <= 16 bits;
  3. per-block bit packing into halfword strings (fori + one-hot flush);
  4. hierarchical tree merge of variable-length bit strings
     (blocks -> MBs -> slices -> frame), shifts + gathers only;
  5. host: one small download of the actual payload bytes, then
     per-slice emulation-prevention + NAL framing (native C++).

The result is byte-identical to the host packers (tests enforce it), but
the host link carries only ~the compressed stream instead of megabytes of
symbol tensors -- the decisive cost on PCIe-attached (or tunneled) hosts.

Capacity caps (bits per MB / slice / frame) are enforced with overflow
flags; an overflowing frame falls back to the host packer, preserving
correctness for adversarial content.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..entropy import cavlc_tables as tbl
from . import transform as T

# slot budget: 1 token + 16 x (zeros_hi, stop/sign, suffix) + tz + 15 runs
NSLOT = 1 + 48 + 1 + 15

# capacity caps (halfwords = 16-bit units)
BLOCK_HW = 40          # 640 bits per residual block (incl. MB header slots)
MB_HW = 256            # 4096 bits per MB
SLICE_HW = 16384       # 32 KB per slice
FRAME_HW = 1 << 20     # 2 MB per frame

_CT = jnp.asarray(tbl.coeff_token_dense())        # [5,17,4] (len<<16)|bits
_TZ = jnp.asarray(tbl.total_zeros_dense())        # [15,16]
_TZC = jnp.asarray(
    np.array(
        [[(l << 16) | b for l, b in row] + [0] * (4 - len(row))
         for row in tbl.TOTAL_ZEROS_CHROMA_DC],
        np.int32,
    )
)                                                 # [3,4]
_RB = jnp.asarray(tbl.run_before_dense())         # [7,15]
# lower-triangular-inclusive matrix: (x @ _TRI16)[j] = sum_{k<=j} x[k]
_TRI16 = jnp.asarray(np.tril(np.ones((16, 16), np.int32)).T)


def _ue_slot(v):
    """(len, val) of Exp-Golomb ue(v) for small traced v (fits 16 bits)."""
    code = v + 1
    nbits = 32 - jax.lax.clz(code.astype(jnp.int32))
    return 2 * nbits - 1, code


def _ctx_of(nc):
    return jnp.where(
        nc < 0, 4,
        jnp.where(nc < 2, 0, jnp.where(nc < 4, 1, jnp.where(nc < 8, 2, 3))),
    )


def block_slots(levels: jnp.ndarray, nc: jnp.ndarray, maxc):
    """Per-block VLC slots.

    levels: [..., 16] int32 zigzag coefficients (entries >= maxc are 0);
    nc: [...] int32 (-1 selects the chroma-DC token table).
    Returns (slot_len [..., NSLOT], slot_val [..., NSLOT]) ints, slots all
    <= 16 bits, plus per-block total_coeff for nnz bookkeeping.
    """
    lead_shape = levels.shape[:-1]
    lv = levels.astype(jnp.int32).reshape(-1, 16)  # flat lanes: full VPU rows
    nc = jnp.asarray(nc).reshape(-1)
    if not isinstance(maxc, int):
        maxc = jnp.broadcast_to(jnp.asarray(maxc), lead_shape).reshape(-1)
    nz = lv != 0
    absd = jnp.abs(lv)
    total = nz.sum(-1)

    pos = jnp.arange(16)
    # rank from the end (descending positions): nonzeros above position j.
    # (computed as total - inclusive-prefix-sum via a triangular matmul:
    # cumsum/cummax lower to reduce-window ops whose fusion with reverses
    # crashes the TPU compiler -- jellyfish fusion_emitter pad_low check)
    nz_i = nz.astype(jnp.int32)
    incl = jnp.einsum(
        "...k,kj->...j", nz_i, _TRI16, preferred_element_type=jnp.int32
    )
    above = total[..., None] - incl
    big = nz & (absd > 1)
    last_big = jnp.max(jnp.where(big, pos, -1), axis=-1)  # [...]
    t1 = jnp.minimum(
        3, (nz & (pos > last_big[..., None])).sum(-1)
    )
    is_t1 = nz & (pos > last_big[..., None]) & (above < t1[..., None])

    ctx = _ctx_of(nc)
    tok = _CT[ctx, total, t1]
    tok_len = (tok >> 16)[..., None]
    tok_val = (tok & 0xFFFF)[..., None]

    # --- per-position (descending) sign / level slots, via lax.scan ---
    # only the suffix-length chain is sequential; everything else is data
    desc16 = jnp.arange(15, -1, -1)

    def to_scan(x):
        return jnp.moveaxis(x[..., desc16], -1, 0)  # [16, ...] descending j

    xs = (
        to_scan(lv), to_scan(absd), to_scan(nz & ~is_t1), to_scan(is_t1),
        to_scan(above),
    )
    sl0 = jnp.where((total > 10) & (t1 < 3), 1, 0)

    def level_step(sl, x):
        l, a, active, sign, abv = x
        first = active & (abv == t1)
        lc = 2 * a - 2 + (l < 0)
        lc = jnp.maximum(jnp.where(first & (t1 < 3), lc - 2, lc), 0)

        base0 = jnp.where(sl == 0, 30, 15 << sl)
        small0 = (sl == 0) & (lc < 14)
        mid0 = (sl == 0) & (lc >= 14) & (lc < 30)
        smallp = (sl > 0) & (lc < (15 << sl))

        rem0 = jnp.maximum(lc - base0, 0)
        p = jnp.maximum(15, 3 + (31 - jax.lax.clz(rem0 + 4096)))

        plen = jnp.where(
            small0, lc + 1,
            jnp.where(mid0, 15, jnp.where(smallp, (lc >> sl) + 1, p + 1)),
        )
        sufl = jnp.where(
            small0, 0,
            jnp.where(mid0, 4, jnp.where(smallp, sl, p - 3)),
        )
        sufv = jnp.where(
            small0, 0,
            jnp.where(
                mid0, lc - 14,
                jnp.where(smallp, lc & ((1 << sl) - 1),
                          rem0 - ((1 << (p - 3)) - 4096)),
            ),
        )

        zhi = jnp.where(active, jnp.maximum(plen - 16, 0), 0)
        tail_len = jnp.where(active, plen - zhi, 0)
        tail_val = jnp.where(active, 1, 0)
        tail_len = jnp.where(sign, 1, tail_len)
        tail_val = jnp.where(sign, (l < 0).astype(jnp.int32), tail_val)

        new_sl = jnp.maximum(sl, 1)
        new_sl = jnp.where(
            (a > (3 << (new_sl - 1))) & (new_sl < 6), new_sl + 1, new_sl
        )
        sl = jnp.where(active, new_sl, sl)
        slot_l = jnp.stack([zhi, tail_len, jnp.where(active, sufl, 0)], -1)
        slot_v = jnp.stack(
            [jnp.zeros_like(zhi), tail_val, jnp.where(active, sufv, 0)], -1
        )
        return sl, (slot_l, slot_v)

    _, (lv_l, lv_v) = jax.lax.scan(level_step, sl0, xs, unroll=16)
    # [16, ..., 3] (descending j) -> [..., 48] in emission order
    lev_len = jnp.moveaxis(lv_l, 0, -2).reshape(*lv.shape[:-1], 48)
    lev_val = jnp.moveaxis(lv_v, 0, -2).reshape(*lv.shape[:-1], 48)

    # --- total_zeros ---
    idx_hi = jnp.max(jnp.where(nz, pos, -1), axis=-1)
    tz = idx_hi + 1 - total
    maxc_arr = jnp.asarray(maxc)
    have_tz = (total > 0) & (total < maxc_arr)
    tz_reg = _TZ[jnp.clip(total - 1, 0, 14), jnp.clip(tz, 0, 15)]
    tz_cdc = _TZC[jnp.clip(total - 1, 0, 2), jnp.clip(tz, 0, 3)]
    tz_e = jnp.where(maxc_arr == 4, tz_cdc, tz_reg)
    tz_len = jnp.where(have_tz, tz_e >> 16, 0)[..., None]
    tz_val = jnp.where(have_tz, tz_e & 0xFFFF, 0)[..., None]

    # --- run_before (vectorized over positions 15..1, descending) ---
    # previous nonzero strictly below each position: exclusive prefix-max
    # via shift-doubling (avoids the reduce-window cummax lowering)
    marked = jnp.where(nz, pos, -1)
    m = jnp.pad(
        marked, [(0, 0)] * (marked.ndim - 1) + [(1, 0)], constant_values=-1
    )[..., :-1]
    for shift in (1, 2, 4, 8):
        shifted = jnp.pad(
            m, [(0, 0)] * (m.ndim - 1) + [(shift, 0)], constant_values=-1
        )[..., :-shift]
        m = jnp.maximum(m, shifted)
    pnb = m
    below_nzcnt = total[..., None] - above - nz_i
    zeros_below = pos - below_nzcnt
    emit = nz & (above < total[..., None] - 1) & (zeros_below > 0)
    run = pos - pnb - 1
    zl = jnp.clip(zeros_below, 1, 7)
    e = _RB[zl - 1, jnp.clip(run, 0, 14)]
    run_len_all = jnp.where(emit, e >> 16, 0)
    run_val_all = jnp.where(emit, e & 0xFFFF, 0)
    # emission order = descending positions 15..1 (explicit gather; a
    # Reverse op here can fuse badly in the TPU backend)
    desc = jnp.arange(15, 0, -1)
    run_len = run_len_all[..., desc]
    run_val = run_val_all[..., desc]

    slot_len = jnp.concatenate([tok_len, lev_len, tz_len, run_len], axis=-1)
    slot_val = jnp.concatenate([tok_val, lev_val, tz_val, run_val], axis=-1)
    ns = slot_len.shape[-1]
    return (
        slot_len.reshape(*lead_shape, ns),
        slot_val.reshape(*lead_shape, ns),
        total.reshape(lead_shape),
    )


def pack_slots(slot_len: jnp.ndarray, slot_val: jnp.ndarray, n_hw: int):
    """Pack slot streams into halfword strings.

    [..., NS] slots -> (halfwords [..., n_hw] int32 of 16-bit units,
    bitlen [...]).  Overflow (bitlen > 16*n_hw) leaves garbage words; the
    caller checks the flag.
    """
    ns = slot_len.shape[-1]
    lead = slot_len.shape[:-1]
    slot_len = slot_len.reshape(-1, ns)
    slot_val = slot_val.reshape(-1, ns)

    def body(k, state):
        acc, nbits, hwidx, out = state
        ln = slot_len[..., k]
        v = slot_val[..., k]
        # int32 with wraparound; halfword extraction only looks at bits
        # [shift, shift+16) with shift < 16, so arithmetic shifts are safe
        acc = (acc << ln) | v
        nbits = nbits + ln
        # flush up to two halfwords (slot <= 17 bits keeps nbits <= 32)
        for _ in range(2):
            do = nbits >= 16
            shift = jnp.maximum(nbits - 16, 0)
            hw = (acc >> shift) & 0xFFFF
            onehot = (
                jnp.arange(n_hw) == jnp.clip(hwidx, 0, n_hw - 1)[..., None]
            )
            out = out + jnp.where(
                do[..., None] & onehot, hw[..., None], 0
            )
            nbits = jnp.where(do, nbits - 16, nbits)
            hwidx = jnp.where(do, hwidx + 1, hwidx)
            acc = jnp.where(do, acc & ((1 << nbits) - 1), acc)
        return acc, nbits, hwidx, out

    n_flat = slot_len.shape[0]
    acc0 = jnp.zeros(n_flat, jnp.int32)
    nb0 = jnp.zeros(n_flat, jnp.int32)
    hw0 = jnp.zeros(n_flat, jnp.int32)
    out0 = jnp.zeros((n_flat, n_hw), jnp.int32)

    def scan_body(state, k):
        return body(k, state), None

    (acc, nbits, hwidx, out), _ = jax.lax.scan(
        scan_body, (acc0, nb0, hw0, out0), jnp.arange(ns), unroll=8
    )
    # final partial halfword (left-aligned within its 16 bits)
    hw = ((acc << (16 - nbits)) & 0xFFFF).astype(jnp.int32)
    onehot = jnp.arange(n_hw) == jnp.clip(hwidx, 0, n_hw - 1)[..., None]
    out = out + jnp.where((nbits > 0)[..., None] & onehot, hw[..., None], 0)
    bitlen = 16 * hwidx + nbits
    return out.reshape(*lead, n_hw), bitlen.reshape(lead)


def merge_strings(a, la, b, lb, n_out: int):
    """Concatenate bit strings: a [..., Wa], b [..., Wb] halfword arrays
    with bit lengths la, lb -> ([..., n_out], la+lb).

    Halfwords are MSB-first 16-bit units; b is shifted right by la bits.
    The halfword-granular placement is a barrel shifter (log2 static
    shifts selected by offset bits) -- per-lane gathers along the lane
    axis are the slow path on TPU.
    """
    wa = a.shape[-1]
    sh = (la % 16)[..., None]
    b_lo = (b >> sh) & 0xFFFF
    b_hi = jnp.pad(b, [(0, 0)] * (b.ndim - 1) + [(1, 0)])[..., :-1]
    b_sh = (b_lo | ((b_hi << (16 - sh)) & 0xFFFF)) & 0xFFFF
    # one extra halfword can spill past b's width
    spill = jnp.where(sh > 0, (b[..., -1:] << (16 - sh)) & 0xFFFF, 0)
    b_ext = jnp.concatenate([b_sh, spill], axis=-1)

    x = jnp.pad(
        b_ext, [(0, 0)] * (b_ext.ndim - 1) + [(0, max(0, n_out - b_ext.shape[-1]))]
    )[..., :n_out]
    off = la // 16  # [...] word offset, < n_out
    k = 0
    while (1 << k) < n_out:
        stepped = jnp.pad(
            x, [(0, 0)] * (x.ndim - 1) + [(1 << k, 0)]
        )[..., :n_out]
        x = jnp.where((((off >> k) & 1) == 1)[..., None], stepped, x)
        k += 1

    a_pad = jnp.pad(a, [(0, 0)] * (a.ndim - 1) + [(0, max(0, n_out - wa))])
    a_pad = a_pad[..., :n_out]
    return a_pad | x, la + lb


def tree_merge(strings, lens, n_out: int):
    """Pairwise-merge a list of equal-width strings along a new axis.

    strings: [..., K, W], lens [..., K] -> single ([..., n_out], [...]).
    K is padded to a power of two with empty strings.
    """
    k = strings.shape[-2]
    kp = 1 << (k - 1).bit_length()
    if kp != k:
        pad = [(0, 0)] * (strings.ndim - 2) + [(0, kp - k), (0, 0)]
        strings = jnp.pad(strings, pad)
        lens = jnp.pad(lens, [(0, 0)] * (lens.ndim - 1) + [(0, kp - k)])
    w = strings.shape[-1]
    while kp > 1:
        kp //= 2
        w2 = min(2 * w, n_out)
        a = strings[..., 0::2, :]
        la = lens[..., 0::2]
        b = strings[..., 1::2, :]
        lb = lens[..., 1::2]
        strings, lens = merge_strings(a, la, b, lb, w2)
        w = w2
    return strings[..., 0, :], lens[..., 0]


# ---------------------------------------------------------------------------
# I-frame assembly: symbols -> slice payload bytes, entirely on device.
# ---------------------------------------------------------------------------

# BLK_SCAN (z-order) as raster indices by*4+bx
_BLK_SCAN_RASTER = jnp.asarray([0, 1, 4, 5, 2, 3, 6, 7, 8, 9, 12, 13, 10, 11, 14, 15])


def _nc_luma_grid(nnz: jnp.ndarray) -> jnp.ndarray:
    """nnz [S, R, C, 4, 4] (by, bx per MB) -> nC per block, row-slice rules."""
    s, r, c = nnz.shape[:3]
    grid = nnz.transpose(0, 1, 3, 2, 4).reshape(s, 4 * r, 4 * c)
    na = jnp.pad(grid, ((0, 0), (0, 0), (1, 0)))[:, :, :-1]
    nb = jnp.pad(grid, ((0, 0), (1, 0), (0, 0)))[:, :-1, :]
    bx = jnp.arange(4 * c)[None, None, :]
    by = jnp.arange(4 * r)[None, :, None]
    a_ok = jnp.broadcast_to(bx > 0, grid.shape)
    b_ok = jnp.broadcast_to(by % 4 > 0, grid.shape)  # top only within the MB
    nc = jnp.where(
        a_ok & b_ok, (na + nb + 1) >> 1,
        jnp.where(a_ok, na, jnp.where(b_ok, nb, 0)),
    )
    return nc.reshape(s, r, 4, c, 4).transpose(0, 1, 3, 2, 4)  # [S,R,C,4,4]


def _nc_chroma_grid(nnz: jnp.ndarray) -> jnp.ndarray:
    """nnz [S, R, C, 2, 2] -> nC per chroma block (row-slice rules)."""
    s, r, c = nnz.shape[:3]
    grid = nnz.transpose(0, 1, 3, 2, 4).reshape(s, 2 * r, 2 * c)
    na = jnp.pad(grid, ((0, 0), (0, 0), (1, 0)))[:, :, :-1]
    nb = jnp.pad(grid, ((0, 0), (1, 0), (0, 0)))[:, :-1, :]
    bx = jnp.arange(2 * c)[None, None, :]
    by = jnp.arange(2 * r)[None, :, None]
    a_ok = jnp.broadcast_to(bx > 0, grid.shape)
    b_ok = jnp.broadcast_to(by % 2 > 0, grid.shape)
    nc = jnp.where(
        a_ok & b_ok, (na + nb + 1) >> 1,
        jnp.where(a_ok, na, jnp.where(b_ok, nb, 0)),
    )
    return nc.reshape(s, r, 2, c, 2).transpose(0, 1, 3, 2, 4)


def _shift_ac(levels15: jnp.ndarray) -> jnp.ndarray:
    """[..., 15] AC coefficients -> [..., 16] position-indexed vector."""
    return jnp.pad(levels15, [(0, 0)] * (levels15.ndim - 1) + [(0, 1)])


@functools.partial(jax.jit, static_argnames=())
def encode_bits_iframe(symbols, qp, hdr_hw, hdr_len):
    """Produce per-stream slice payload bits on device.

    symbols: iframe.MBSymbols; hdr_hw [S, R, 8] int32 halfwords of each
    slice header (host-computed, MSB-aligned); hdr_len [S, R] bit counts.
    Returns (frame_hw [S, FRAME_HW'], frame_bits [S],
             slice_bytes [S, R], overflow flag).
    """
    s, r, c = symbols.mode.shape
    lac = symbols.luma_ac.astype(jnp.int32).reshape(s, r, c, 4, 4, 16)
    cbp_l = symbols.cbp_luma.astype(jnp.int32)
    cbp_c = symbols.cbp_chroma.astype(jnp.int32)

    # per-block AC totals -> nnz grids (counts only when coded)
    ac_nz = jnp.count_nonzero(lac[..., 1:], axis=-1)  # [S,R,C,4,4]
    nnz_y = jnp.where(cbp_l[..., None, None] == 1, ac_nz, 0)
    nc_y = _nc_luma_grid(nnz_y)  # [S,R,C,4,4] per-block nC

    cac = symbols.chroma_ac.astype(jnp.int32)  # [S,R,C,2,4,15]
    cac_nz = jnp.count_nonzero(cac, axis=-1).reshape(s, r, c, 2, 2, 2)
    # [S,R,C,comp,by,bx]
    nnz_u = jnp.where(cbp_c[..., None, None] == 2, cac_nz[..., 0, :, :], 0)
    nnz_v = jnp.where(cbp_c[..., None, None] == 2, cac_nz[..., 1, :, :], 0)
    nc_u = _nc_chroma_grid(nnz_u)
    nc_v = _nc_chroma_grid(nnz_v)

    # ---- chunk strings: ONE unified coder call over all 27 chunks/MB ----
    # chunk 0: MB header slots + Intra16x16 DC; 1..16 luma AC (z-order);
    # 17,18 chroma DC; 19..26 chroma AC (u0..3 v0..3)
    mode = symbols.mode.astype(jnp.int32)
    cmode = symbols.cmode.astype(jnp.int32)
    mb_type = 1 + mode + 4 * cbp_c + 12 * cbp_l
    h1l, h1v = _ue_slot(mb_type)
    h2l, h2v = _ue_slot(cmode)

    dc_lv = symbols.luma_dc.astype(jnp.int32)  # [S,R,C,16]
    ac_vec = _shift_ac(lac[..., 1:]).reshape(s, r, c, 16, 16)
    ac_vec = ac_vec[..., _BLK_SCAN_RASTER, :]
    cdc = symbols.chroma_dc.astype(jnp.int32)
    cdc_vec = jnp.pad(cdc, ((0, 0),) * 4 + ((0, 12),))  # [S,R,C,2,16]
    cac_vec = _shift_ac(cac).reshape(s, r, c, 8, 16)

    levels27 = jnp.concatenate(
        [dc_lv[..., None, :], ac_vec, cdc_vec, cac_vec], axis=-2
    )  # [S,R,C,27,16]
    nc_flat = nc_y.reshape(s, r, c, 16)[..., _BLK_SCAN_RASTER]
    nc27 = jnp.concatenate(
        [
            nc_y[..., 0, 0][..., None],
            nc_flat,
            jnp.full((s, r, c, 2), -1),
            nc_u.reshape(s, r, c, 4),
            nc_v.reshape(s, r, c, 4),
        ],
        axis=-1,
    )  # [S,R,C,27]
    maxc27 = jnp.asarray([16] + [15] * 16 + [4, 4] + [15] * 8)

    sl27, sv27, _ = block_slots(levels27, nc27, maxc27)
    # prepend the 3 MB-header slots to chunk 0 (zero-len slots elsewhere)
    zeros3 = jnp.zeros((s, r, c, 27, 3), jnp.int32)
    hdr_l = zeros3.at[..., 0, 0].set(h1l).at[..., 0, 1].set(h2l)                   .at[..., 0, 2].set(1)
    hdr_v = zeros3.at[..., 0, 0].set(h1v).at[..., 0, 1].set(h2v)                   .at[..., 0, 2].set(1)
    chunks_hw, chunks_bits = pack_slots(
        jnp.concatenate([hdr_l, sl27], -1),
        jnp.concatenate([hdr_v, sv27], -1),
        BLOCK_HW,
    )  # [S,R,C,27,BW], [S,R,C,27]

    # presence gating: absent chunks become empty strings
    present = jnp.concatenate(
        [
            jnp.ones((s, r, c, 1), bool),
            jnp.broadcast_to((cbp_l == 1)[..., None], (s, r, c, 16)),
            jnp.broadcast_to((cbp_c >= 1)[..., None], (s, r, c, 2)),
            jnp.broadcast_to((cbp_c == 2)[..., None], (s, r, c, 8)),
        ],
        axis=-1,
    )
    chunks_bits = jnp.where(present, chunks_bits, 0)
    chunks_hw = jnp.where(present[..., None], chunks_hw, 0)
    mb_hw, mb_bits = tree_merge(chunks_hw, chunks_bits, MB_HW)  # [S,R,C,MBW]
    overflow = jnp.any(mb_bits > 16 * MB_HW)

    # ---- per-slice merge: header + C MBs, then trailing bits ----
    hdr_pad = jnp.pad(hdr_hw, ((0, 0), (0, 0), (0, MB_HW - hdr_hw.shape[-1])))
    slice_chunks = jnp.concatenate([hdr_pad[..., None, :], mb_hw], axis=-2)
    slice_bits_in = jnp.concatenate([hdr_len[..., None], mb_bits], axis=-1)
    body_hw, body_bits = tree_merge(slice_chunks, slice_bits_in, SLICE_HW)
    overflow |= jnp.any(body_bits > 16 * SLICE_HW - 32)
    # rbsp trailing: stop bit + zero pad to byte
    tl = 1 + ((8 - ((body_bits + 1) % 8)) % 8)
    tv = jnp.left_shift(1, tl - 1)
    t_hw = jnp.zeros((s, r, 1), jnp.int32).at[..., 0].set(tv << (16 - tl))
    slice_hw, slice_bits = merge_strings(
        body_hw, body_bits, t_hw, tl, SLICE_HW
    )
    slice_bytes = slice_bits // 8  # [S, R]

    # ---- per-stream frame merge (slices are byte aligned) ----
    frame_hw, frame_bits = tree_merge(slice_hw, slice_bits, FRAME_HW)
    overflow |= jnp.any(frame_bits > 16 * FRAME_HW)
    return frame_hw, frame_bits, slice_bytes, overflow
