"""On-device CAVLC: the entropy stage as TPU vector code.

CAVLC has no cross-block bit state once nC is known, and with row-slices
nC is a *static* neighbor relation (left block / top-block-within-MB), so
the whole entropy stage parallelizes (SURVEY.md section 7, hard part 1):

  1. nC grids from per-block total_coeff counts (shifted-array gathers);
  2. per-block VLC slot streams (coeff_token / signs / levels /
     total_zeros / run_before), every slot <= 16 bits;
  3. per-block bit packing into 32-bit-word strings (parallel OR);
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


def _resolve_backend(backend: str) -> str:
    """'auto' -> Pallas kernels on TPU, XLA elsewhere (tests run on CPU).
    Override with TPUH264_ENTROPY_BACKEND=xla|pallas.

    Hardware note: XLA's TPU reshape lowering corrupts multi-dim
    collapses whose minor dim is 6 at some shapes (bare-jnp reproducer:
    [24,30,54,27,6] -> [n,6] loses the last 32 lanes of slot row 5).
    Both entropy paths were bitten through the header-slot arrays at
    854x480 (undecodable streams, VERDICT r3 weak #1); the slot axis is
    now padded to 8 and tools/tpu_gate.py re-verifies decode-from-bits
    on the chip at every bench."""
    if backend != "auto":
        return backend
    import os

    env = os.environ.get("TPUH264_ENTROPY_BACKEND")
    if env:
        return env
    return "pallas" if jax.default_backend() == "tpu" else "xla"

# slot budget: 1 token + 16 x (zeros_hi, merged tail+suffix) + tz + 15 runs
NSLOT = 1 + 32 + 1 + 15

# capacity caps (32-bit words; same bit capacities as the earlier
# halfword layout, half the elements -- the pack/merge stages are
# compare/shift-bound in the number of units)
BLOCK_W = 20           # 640 bits per residual block (incl. MB header slots)
MB_W = 128             # 4096 bits per MB
SLICE_W = 8192         # 32 KB per slice

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
# coded_block_pattern ue symbol, indexed cbp_luma | cbp_chroma << 4
_CBP_INTER_INV = jnp.asarray(
    np.array([tbl.CBP_INTER_INV[i] for i in range(48)], np.int32)
)
# lower-triangular-inclusive matrix: (x @ _TRI16)[j] = sum_{k<=j} x[k]
_TRI16 = jnp.asarray(np.tril(np.ones((16, 16), np.int32)).T)


def _ue_slot(v):
    """(len, val) of Exp-Golomb ue(v) for small traced v (fits 16 bits)."""
    code = v + 1
    nbits = 32 - jax.lax.clz(code.astype(jnp.int32))
    return 2 * nbits - 1, code


def _sel2(table, i, j):
    """Gather-free 2-D table lookup: table [n0, n1], traced indices i, j.

    Per-lane gathers lower to the TPU scalar path (milliseconds per frame
    at these lane counts); for small VLC tables a one-hot select
    reduction is hundreds of times cheaper and fuses with its consumers.
    """
    n0, n1 = table.shape
    rows = jnp.sum(
        jnp.where(
            (i[..., None] == jnp.arange(n0))[..., None], table, 0
        ),
        axis=-2,
    )  # [..., n1]
    return jnp.sum(
        jnp.where(j[..., None] == jnp.arange(n1), rows, 0), axis=-1
    )


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
    tok = _sel2(_CT.reshape(5 * 17, 4), ctx * 17 + total, t1)
    tok_len = (tok >> 16)[..., None]
    tok_val = (tok & 0xFFFF)[..., None]

    # --- per-position (descending) sign / level slots ---
    # only the suffix-length chain is sequential; everything else is data.
    # statically unrolled (16 steps): a lax.scan here spends ~25% of the
    # stage in dynamic-slice/update framing around a tiny body
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
        return sl, (
            zhi, tail_len, jnp.where(active, sufl, 0),
            tail_val, jnp.where(active, sufv, 0),
        )

    # statically unrolled; each step returns flat [lanes] vectors which
    # are stacked ONCE afterwards ([lanes, 3]-shaped per-step outputs pad
    # to full 128-lane tiles and cost ~7 ms/frame in partial-tile writes)
    active16 = nz & ~is_t1
    sl = sl0
    cols = [[], [], [], [], []]
    for j in range(15, -1, -1):
        sl, outs = level_step(
            sl,
            (lv[..., j], absd[..., j], active16[..., j], is_t1[..., j],
             above[..., j]),
        )
        for acc, o in zip(cols, outs):
            acc.append(o)
    zhi16, tlen16, slen16, tval16, sval16 = (
        jnp.stack(acc, axis=-1) for acc in cols
    )  # [lanes, 16] each, descending j
    # merge (tail, suffix) into one slot: tail_len <= 16, suffix <= 6, so
    # the merged slot (<= 22 bits) still spans at most two 32-bit words;
    # one slot fewer per position is ~30% off the pack stage's compares
    mlen16 = tlen16 + slen16
    mval16 = (tval16 << slen16) | sval16
    # emission order is (zhi, merged) per position -> [lanes, 16, 2]
    lev_len = jnp.stack([zhi16, mlen16], axis=-1).reshape(
        *lv.shape[:-1], 32
    )
    lev_val = jnp.stack(
        [jnp.zeros_like(zhi16), mval16], axis=-1
    ).reshape(*lv.shape[:-1], 32)

    # --- total_zeros ---
    idx_hi = jnp.max(jnp.where(nz, pos, -1), axis=-1)
    tz = idx_hi + 1 - total
    maxc_arr = jnp.asarray(maxc)
    have_tz = (total > 0) & (total < maxc_arr)
    tz_reg = _sel2(_TZ, jnp.clip(total - 1, 0, 14), jnp.clip(tz, 0, 15))
    tz_cdc = _sel2(_TZC, jnp.clip(total - 1, 0, 2), jnp.clip(tz, 0, 3))
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
    # table lookup as one-hot selects: a per-lane 2-D gather here lowers
    # to the TPU scalar gather path (~20 ms/frame at 1080p); the 7x15
    # table is small enough to reduce over instead
    oz = (zl - 1)[..., None] == jnp.arange(7)
    row = jnp.sum(jnp.where(oz[..., None], _RB, 0), axis=-2)  # [..., 15]
    orr = jnp.clip(run, 0, 14)[..., None] == jnp.arange(15)
    e = jnp.sum(jnp.where(orr, row, 0), axis=-1)
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


def pack_slots(slot_len: jnp.ndarray, slot_val: jnp.ndarray, n_w: int):
    """Pack slot streams into 32-bit-word strings.

    [..., NS] slots -> (words [..., n_w] int32 of MSB-first 32-bit units,
    bitlen [...]).  Overflow (bitlen > 32*n_w) leaves garbage words; the
    caller checks the flag.
    """
    ns = slot_len.shape[-1]
    lead = slot_len.shape[:-1]
    slot_len = slot_len.reshape(-1, ns)
    slot_val = slot_val.reshape(-1, ns)

    # Fully parallel packing -- no scan.  The bit offset of slot k is the
    # exclusive prefix sum of slot lengths (log-shift scan over ns).  A
    # slot of <= 32 bits starting at bit b (= offset % 32) ends at
    # b + len <= 63, i.e. every slot touches at most TWO words.  Slots
    # sharing a word are disjoint bit ranges, so an OR-reduction over the
    # 2*ns emissions assembles the string exactly.  (The earlier
    # sequential accumulator scan was the dominant term of the entropy
    # stage: its carry and stacked emissions cost ~10x the HBM traffic.)
    # inclusive prefix sum via log-shift adds (cumsum lowers to a
    # reduce-window op that is both slower and fusion-fragile on TPU)
    off = slot_len
    shift = 1
    while shift < ns:
        off = off + jnp.pad(
            off, [(0, 0)] * (off.ndim - 1) + [(shift, 0)]
        )[..., :-shift]
        shift *= 2
    bitlen = off[..., -1]
    off = off - slot_len  # exclusive prefix
    b = off & 31
    end = b + slot_len  # <= 63
    c_hi = jnp.where(
        end <= 32,
        slot_val << jnp.clip(32 - end, 0, 31),
        jax.lax.shift_right_logical(slot_val, jnp.clip(end - 32, 0, 31)),
    )
    c_lo = jnp.where(
        end > 32, slot_val << jnp.clip(64 - end, 1, 31), 0
    )
    live = slot_len > 0
    h0 = off >> 5
    # out-of-range sentinel (n_w) drops dead or overflowing emissions
    ix_hi = jnp.where(live, h0, n_w)
    ix_lo = jnp.where(live & (c_lo != 0), h0 + 1, n_w)
    w_all = jnp.concatenate([c_hi, c_lo], axis=-1)  # [lanes, 2*ns]
    ix_all = jnp.concatenate([ix_hi, ix_lo], axis=-1)
    j = jnp.arange(n_w)
    out = jax.lax.reduce(
        jnp.where(ix_all[..., :, None] == j, w_all[..., :, None], 0),
        np.int32(0),
        jax.lax.bitwise_or,
        (1,),
    )
    return out.reshape(*lead, n_w), bitlen.reshape(lead)


def merge_strings(a, la, b, lb, n_out: int):
    """Concatenate bit strings: a [..., Wa], b [..., Wb] word arrays
    with bit lengths la, lb -> ([..., n_out], la+lb).

    Words are MSB-first 32-bit units; b is shifted right by la bits.
    The word-granular placement is a barrel shifter (log2 static shifts
    selected by offset bits) -- per-lane gathers along the lane axis are
    the slow path on TPU.
    """
    wa = a.shape[-1]
    sh = (la % 32)[..., None]
    inv = jnp.clip(32 - sh, 0, 31)  # valid only where sh > 0
    b_lo = jax.lax.shift_right_logical(b, sh)
    b_hi = jnp.pad(b, [(0, 0)] * (b.ndim - 1) + [(1, 0)])[..., :-1]
    b_sh = jnp.where(sh > 0, b_lo | (b_hi << inv), b)
    # one extra word can spill past b's width
    spill = jnp.where(sh > 0, b[..., -1:] << inv, 0)
    b_ext = jnp.concatenate([b_sh, spill], axis=-1)

    x = jnp.pad(
        b_ext, [(0, 0)] * (b_ext.ndim - 1) + [(0, max(0, n_out - b_ext.shape[-1]))]
    )[..., :n_out]
    off = la // 32  # [...] word offset, < n_out
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


def _finish_slices(slice_chunks, slice_bits_in, s, r):
    """Merge per-slice chunk lists and append rbsp trailing bits.

    slice_chunks [S, R, K, MB_W], slice_bits_in [S, R, K] ->
    (slice words int32 [S, R, SLICE_W] MSB-first, slice_bytes [S, R],
    overflow).
    """
    body_w, body_bits = tree_merge(slice_chunks, slice_bits_in, SLICE_W)
    overflow = jnp.any(body_bits > 32 * SLICE_W - 64)
    # rbsp trailing: stop bit + zero pad to byte
    tl = 1 + ((8 - ((body_bits + 1) % 8)) % 8)
    tv = jnp.left_shift(1, tl - 1)
    t_w = jnp.zeros((s, r, 1), jnp.int32).at[..., 0].set(tv << (32 - tl))
    slice_w, slice_bits = merge_strings(body_w, body_bits, t_w, tl, SLICE_W)
    slice_bytes = slice_bits // 8  # [S, R]
    return slice_w, slice_bytes, overflow


@functools.partial(jax.jit, static_argnames=("backend",))
def encode_bits_iframe(symbols, qp, hdr_hw, hdr_len, backend: str = "auto"):
    """Produce per-stream slice payload bits on device.

    symbols: iframe.MBSymbols; hdr_hw [S, R, 8] int32 halfwords of each
    slice header (host-computed, MSB-aligned); hdr_len [S, R] bit counts.
    Returns (slice_hw [S, R, SLICE_W] int32 MSB-first-word payload
    per slice, slice_bytes [S, R], overflow flag).  Slices stay separate:
    the host frames them into NALs anyway, and stopping the merge tree at
    slice level skips its two widest (frame-width) barrel-shift levels.

    backend: 'pallas' (fused VMEM kernels, kernels/cavlc_pallas.py),
    'xla', or 'auto' (pallas on TPU).  Outputs are bit-identical.
    """
    backend = _resolve_backend(backend)
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

    # prepend the 3 MB-header slots to chunk 0 (zero-len slots elsewhere).
    # Built by stack+concat, NOT chained .at[].set updates: the fused
    # scatter chain miscompiles on TPU at minor-dim-unaligned shapes
    # (observed at 480p: constant-1 slots read back 0 on the last lanes
    # of a 54-column MB row, emitting an undecodable stream; the
    # concat formulation lowers to pure pad/concat and is exact).
    # slot axis padded to 8 dead-slot-free (see encode_bits_pframe: the
    # TPU reshape lowering corrupts unaligned minor-dim collapses)
    one = jnp.ones_like(h1l)
    zz = jnp.zeros_like(h1l)
    ztail8 = jnp.zeros((s, r, c, 26, 8), jnp.int32)
    hdr_l = jnp.concatenate(
        [jnp.stack([h1l, h2l, one, zz, zz, zz, zz, zz],
                   axis=-1)[..., None, :], ztail8],
        axis=-2,
    )
    hdr_v = jnp.concatenate(
        [jnp.stack([h1v, h2v, one, zz, zz, zz, zz, zz],
                   axis=-1)[..., None, :], ztail8],
        axis=-2,
    )
    if backend == "pallas":
        from . import cavlc_pallas

        chunks_hw, chunks_bits = cavlc_pallas.pack_blocks(
            levels27, nc27, jnp.broadcast_to(maxc27, nc27.shape),
            hdr_l, hdr_v, BLOCK_W, 8,
            interpret=jax.default_backend() != "tpu",
        )
    else:
        sl27, sv27, _ = block_slots(levels27, nc27, maxc27)
        full_l = jnp.concatenate([hdr_l, sl27], -1)
        full_v = jnp.concatenate([hdr_v, sv27], -1)
        # REQUIRED on TPU -- same fused-pack miscompile as the P path
        # (see encode_bits_pframe): pin the slot streams before the
        # OR-reduce pack
        full_l, full_v = jax.lax.optimization_barrier((full_l, full_v))
        chunks_hw, chunks_bits = pack_slots(
            full_l, full_v, BLOCK_W,
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
    if backend == "pallas":
        from . import cavlc_pallas

        mb_hw, mb_bits = cavlc_pallas.merge_tree(
            chunks_hw, chunks_bits, MB_W,
            interpret=jax.default_backend() != "tpu",
        )
    else:
        mb_hw, mb_bits = tree_merge(chunks_hw, chunks_bits, MB_W)
    overflow = jnp.any(mb_bits > 32 * MB_W)

    # ---- per-slice merge: header + C MBs, then trailing bits ----
    hdr_pad = jnp.pad(hdr_hw, ((0, 0), (0, 0), (0, MB_W - hdr_hw.shape[-1])))
    slice_chunks = jnp.concatenate([hdr_pad[..., None, :], mb_hw], axis=-2)
    slice_bits_in = jnp.concatenate([hdr_len[..., None], mb_bits], axis=-1)
    slice_hw, slice_bytes, ovf2 = _finish_slices(slice_chunks, slice_bits_in, s, r)
    return slice_hw, slice_bytes, overflow | ovf2


# ---------------------------------------------------------------------------
# P-frame assembly: MBSymbolsP -> slice payload bytes, entirely on device.
# ---------------------------------------------------------------------------


def _se_val(v):
    """Exp-Golomb se(v) symbol value (Rec. 9.1.1)."""
    return jnp.where(v > 0, 2 * v - 1, -2 * v)


@functools.partial(jax.jit, static_argnames=("backend", "nra"))
def encode_bits_pframe(symbols, qp, hdr_hw, hdr_len, backend: str = "auto",
                       nra: int = 1):
    """P-slice payload bits on device (rows slice mode).

    Bit-for-bit the entropy/packp.py emission: per coded MB a skip_run,
    then Intra_16x16-in-P (mb_type / intra_chroma_pred_mode / dqp +
    DC-split residuals) or P_L0_16x16 (mvd / coded_block_pattern / dqp +
    16-coeff luma residuals), plus the trailing skip_run of each slice.
    With nra > 1 (multi-reference DPB), inter MBs additionally emit
    ref_idx_l0 as te(v) with cMax = nra-1 (7.3.5.1), composed into the
    mb_type header slot.  The skip runs -- the only cross-MB sequential
    syntax -- become a prefix-max over each row's coded-MB indices, so
    the whole frame stays one parallel coder call.  (The reference
    outsources this stage to libopenh264 via
    openh264_wrapper.cpp:282-311.)

    backend: 'pallas' | 'xla' | 'auto' (pallas on TPU); bit-identical.
    """
    backend = _resolve_backend(backend)
    s, r, c = symbols.kind.shape
    kind = symbols.kind.astype(jnp.int32)
    coded = kind != 0
    intra = kind == 2
    inter = kind == 1
    lac = symbols.luma_ac.astype(jnp.int32).reshape(s, r, c, 4, 4, 16)
    cbp_l = symbols.cbp_luma.astype(jnp.int32)
    cbp_c = jnp.where(coded, symbols.cbp_chroma.astype(jnp.int32), 0)

    # ---- nnz grids: intra counts slots 1..15 when cbp_luma==1; inter
    # counts all 16 when the block's 8x8 group bit is set ----
    nz_intra = jnp.count_nonzero(lac[..., 1:], axis=-1)  # [S,R,C,4,4]
    nz_inter = jnp.count_nonzero(lac, axis=-1)
    by4 = jnp.arange(4)[:, None]
    bx4 = jnp.arange(4)[None, :]
    i8 = (by4 // 2) * 2 + (bx4 // 2)  # [4,4] 8x8 group per raster block
    gbit = ((cbp_l[..., None, None] >> i8) & 1) == 1
    nnz_y = jnp.where(
        intra[..., None, None] & (cbp_l[..., None, None] == 1), nz_intra,
        jnp.where(inter[..., None, None] & gbit, nz_inter, 0),
    )
    nc_y = _nc_luma_grid(nnz_y)

    cac = symbols.chroma_ac.astype(jnp.int32)  # [S,R,C,2,4,15]
    cac_nz = jnp.count_nonzero(cac, axis=-1).reshape(s, r, c, 2, 2, 2)
    nnz_u = jnp.where(cbp_c[..., None, None] == 2, cac_nz[..., 0, :, :], 0)
    nnz_v = jnp.where(cbp_c[..., None, None] == 2, cac_nz[..., 1, :, :], 0)
    nc_u = _nc_chroma_grid(nnz_u)
    nc_v = _nc_chroma_grid(nnz_v)

    # ---- header slots (6 per MB, all zero-length when absent) ----
    # coded: [skip_run] then intra: [mb_type][cmode][dqp] or
    #                        inter: [ue(0)][mvdx][mvdy][cbp][dqp?]
    idxc = jnp.arange(c)
    marked = jnp.where(coded, idxc, -1)
    m = jnp.pad(marked, ((0, 0), (0, 0), (1, 0)), constant_values=-1)[..., :-1]
    shift = 1
    while shift < c:
        m = jnp.maximum(
            m,
            jnp.pad(m, ((0, 0), (0, 0), (shift, 0)), constant_values=-1)[
                ..., :-shift
            ],
        )
        shift *= 2
    skip_run = idxc - m - 1
    h0l, h0v = _ue_slot(skip_run)

    mode = symbols.mode.astype(jnp.int32)
    cmode = symbols.cmode.astype(jnp.int32)
    mvdx = symbols.mvdx.astype(jnp.int32)
    mvdy = symbols.mvdy.astype(jnp.int32)
    h1l, h1v = _ue_slot(jnp.where(intra, 6 + mode + 4 * cbp_c + 12 * cbp_l, 0))
    if nra > 1:
        # inter slot 1 becomes mb_type ue(0) ++ ref_idx_l0 te(v)
        refs = (
            symbols.refidx.astype(jnp.int32)
            if symbols.refidx is not None
            else jnp.zeros_like(mvdx)
        )
        if nra == 2:
            te_l = jnp.ones_like(refs)
            te_v = 1 - refs
        else:
            te_l, te_v = _ue_slot(refs)
        h1l = jnp.where(intra, h1l, 1 + te_l)
        h1v = jnp.where(intra, h1v, (1 << te_l) | te_v)
    h2l, h2v = _ue_slot(jnp.where(intra, cmode, _se_val(mvdx)))
    # intra slot 3 is dqp: se(0) == ue(0), same 1-bit code
    h3l, h3v = _ue_slot(jnp.where(intra, 0, _se_val(mvdy)))
    cbp_sym = jnp.sum(
        jnp.where(
            (cbp_l | (cbp_c << 4))[..., None] == jnp.arange(48),
            _CBP_INTER_INV,
            0,
        ),
        axis=-1,
    )
    h4l, h4v = _ue_slot(cbp_sym)
    h4l = jnp.where(inter, h4l, 0)
    h5l = jnp.where(inter & ((cbp_l | cbp_c) > 0), 1, 0)  # dqp se(0)

    # ---- residual chunk levels (27 chunks, as the I-frame layout) ----
    dc_lv = jnp.where(intra[..., None], symbols.luma_dc.astype(jnp.int32), 0)
    ac_intra = _shift_ac(lac[..., 1:])
    ac_vec = jnp.where(intra[..., None, None, None], ac_intra, lac)
    ac_vec = ac_vec.reshape(s, r, c, 16, 16)[..., _BLK_SCAN_RASTER, :]
    cdc = symbols.chroma_dc.astype(jnp.int32)
    cdc_vec = jnp.pad(cdc, ((0, 0),) * 4 + ((0, 12),))
    cac_vec = _shift_ac(cac).reshape(s, r, c, 8, 16)
    levels27 = jnp.concatenate(
        [dc_lv[..., None, :], ac_vec, cdc_vec, cac_vec], axis=-2
    )
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
    )
    maxc_ac = jnp.where(intra, 15, 16)  # [S,R,C]
    maxc27 = jnp.concatenate(
        [
            jnp.full((s, r, c, 1), 16),
            jnp.broadcast_to(maxc_ac[..., None], (s, r, c, 16)),
            jnp.full((s, r, c, 2), 4),
            jnp.full((s, r, c, 8), 15),
        ],
        axis=-1,
    )

    # Header slot axis is padded to 8 (2 dead zero-length slots): XLA's
    # TPU reshape lowering CORRUPTS a [s,r,c,27,6] -> [n,6] collapse at
    # minor-dim 6 (bare-jnp.reshape reproducer: the last 32 lanes of
    # slot row 5 read back wrong at 854x480 shapes), which dropped the
    # constant dqp bit of tail MBs and emitted undecodable streams.
    # Minor dims 8/16/32 lower correctly; zero-length slots emit
    # nothing, so the padding is semantically free.
    cg = coded.astype(jnp.int32)
    zz = jnp.zeros_like(h0l)
    ztail8 = jnp.zeros((s, r, c, 26, 8), jnp.int32)
    hdr_l = jnp.concatenate(
        [
            jnp.stack(
                [h0l * cg, h1l * cg, h2l * cg, h3l * cg, h4l * cg,
                 h5l * cg, zz, zz],
                axis=-1,
            )[..., None, :],
            ztail8,
        ],
        axis=-2,
    )
    hdr_v = jnp.concatenate(
        [
            jnp.stack(
                [h0v, h1v, h2v, h3v, h4v, jnp.ones_like(h0v), zz, zz],
                axis=-1,
            )[..., None, :],
            ztail8,
        ],
        axis=-2,
    )
    # inter/skip MBs have no luma-DC chunk: chunk 0's residual slots are
    # suppressed (CAVLC codes nothing there, not even a coeff_token)
    kill0 = (~intra)[..., None] & (jnp.arange(27) == 0)
    if backend == "pallas":
        from . import cavlc_pallas

        chunks_hw, chunks_bits = cavlc_pallas.pack_blocks(
            levels27, nc27, maxc27, hdr_l, hdr_v, BLOCK_W, 8,
            hdr_max=32, interpret=jax.default_backend() != "tpu",
            code_residual=~kill0,
        )
    else:
        sl27, sv27, _ = block_slots(levels27, nc27, maxc27)
        sl27 = jnp.where(kill0[..., None], 0, sl27)
        full_l = jnp.concatenate([hdr_l, sl27], -1)
        full_v = jnp.concatenate([hdr_v, sv27], -1)
        # REQUIRED on TPU: without this barrier, XLA fuses the slot
        # computation into pack_slots' OR-reduce and the fused kernel
        # drops single-bit slot contributions for a few tail-of-array
        # chunks (verified at 854x480 x 8 streams: the constant dqp bit
        # of the last two MBs of the last slice read back 0, producing
        # an undecodable stream that crashed the reference's published
        # operating point, VERDICT r3 weak #1).  The barrier pins the
        # slot streams to memory; cost is one HBM round trip of the
        # [.., 39]-slot arrays (~0.1 ms at 1080p).
        full_l, full_v = jax.lax.optimization_barrier((full_l, full_v))
        chunks_hw, chunks_bits = pack_slots(full_l, full_v, BLOCK_W)

    grp = jnp.arange(16) // 4  # z-order chunk -> 8x8 group
    pres_luma = jnp.where(
        intra[..., None],
        (cbp_l == 1)[..., None],
        ((cbp_l[..., None] >> grp) & 1) == 1,
    ) & coded[..., None]
    present = jnp.concatenate(
        [
            coded[..., None],
            pres_luma,
            jnp.broadcast_to((cbp_c >= 1)[..., None], (s, r, c, 2)),
            jnp.broadcast_to((cbp_c == 2)[..., None], (s, r, c, 8)),
        ],
        axis=-1,
    )
    chunks_bits = jnp.where(present, chunks_bits, 0)
    chunks_hw = jnp.where(present[..., None], chunks_hw, 0)
    if backend == "pallas":
        from . import cavlc_pallas

        mb_hw, mb_bits = cavlc_pallas.merge_tree(
            chunks_hw, chunks_bits, MB_W,
            interpret=jax.default_backend() != "tpu",
        )
    else:
        mb_hw, mb_bits = tree_merge(chunks_hw, chunks_bits, MB_W)
    overflow = jnp.any(mb_bits > 32 * MB_W)

    # ---- trailing skip_run chunk per slice ----
    last_coded = jnp.max(marked, axis=-1)  # [S,R]
    trail = c - 1 - last_coded
    tll, tlv = _ue_slot(trail)
    tll = jnp.where(trail > 0, tll, 0)
    # single-word emission caps rows at 65534 MBs (ue > 32 bits);
    # merged strings must be all-zero past their bit length, so gate the
    # content on trail > 0
    overflow |= jnp.any(tll > 32)
    t_hw = jnp.zeros((s, r, MB_W), jnp.int32).at[..., 0].set(
        jnp.where(
            trail > 0,
            tlv << jnp.clip(32 - tll, 0, 31),
            0,
        )
    )

    hdr_pad = jnp.pad(hdr_hw, ((0, 0), (0, 0), (0, MB_W - hdr_hw.shape[-1])))
    slice_chunks = jnp.concatenate(
        [hdr_pad[..., None, :], mb_hw, t_hw[..., None, :]], axis=-2
    )
    slice_bits_in = jnp.concatenate(
        [hdr_len[..., None], mb_bits, tll[..., None]], axis=-1
    )
    slice_hw, slice_bytes, ovf2 = _finish_slices(slice_chunks, slice_bits_in, s, r)
    return slice_hw, slice_bytes, overflow | ovf2
