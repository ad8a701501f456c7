"""Fused CAVLC symbolize+pack as a Pallas TPU kernel.

Replaces the XLA pair `entropy_tpu.block_slots` + `entropy_tpu.pack_slots`
for the per-block stage of on-device entropy coding (the dominant cost of
the device CAVLC path: the XLA formulation materializes ~50 per-slot
[lanes] tensors through HBM between every step of the level chain, while
the bit stream it produces is only ~KBs).  Here one grid step loads a
tile of 1024 blocks' zigzag levels into VMEM, runs the entire VLC
pipeline (coeff_token, level chain, total_zeros, run_before) in
registers, and writes only the packed 32-bit words.

Bit-exact with block_slots/pack_slots (tests/test_pallas_entropy.py), and
therefore with the host packers, the golden codec, and libavcodec.

Reference provenance: this implements the entropy stage the reference
outsources to libopenh264.a (openh264_wrapper.cpp:282-311 merely
concatenates its NAL output); the slot/bit semantics follow Rec. ITU-T
H.264 section 9.2, mirrored from tpuh264/entropy/cavlc.py.

Kernel facts used for the packing prune:
  - a slot never exceeds 32 bits (same contract as pack_slots);
  - zero-run slots (`zhi`: the all-zero high part of escape level
    prefixes) carry no payload bits, so they only advance the bit
    offset -- they are excluded from the emission loops entirely;
  - slot bit offsets are monotone, so slot k can touch output word w
    only if sum(maxlen[0..k]) > 32*w (static prune, ~2x fewer emissions).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..entropy import cavlc_tables as tbl

LANES = 1024  # blocks per grid step: one [8, 128] vector tile

# ---------------------------------------------------------------------------
# Static VLC tables as (index, packed) lists of *valid* entries only.
# ---------------------------------------------------------------------------

_CT_NP = tbl.coeff_token_dense()          # [5, 17, 4] (len<<16)|bits
_TZ_NP = tbl.total_zeros_dense()          # [15, 16]
_TZC_NP = np.array(
    [[(l << 16) | b for l, b in row] + [0] * (4 - len(row))
     for row in tbl.TOTAL_ZEROS_CHROMA_DC],
    np.int32,
)                                         # [3, 4]
_RB_NP = tbl.run_before_dense()           # [7, 15]

_CT_ENTRIES = [
    (ctx * 17 + t, t1, int(_CT_NP[ctx, t, t1]))
    for ctx in range(5) for t in range(17) for t1 in range(4)
    if _CT_NP[ctx, t, t1] != 0
]
_TZ_ENTRIES = [
    (t, z, int(_TZ_NP[t, z]))
    for t in range(15) for z in range(16) if _TZ_NP[t, z] != 0
]
_TZC_ENTRIES = [
    (t, z, int(_TZC_NP[t, z]))
    for t in range(3) for z in range(4) if _TZC_NP[t, z] != 0
]
_RB_ENTRIES = [
    (zl, r, int(_RB_NP[zl, r]))
    for zl in range(7) for r in range(15) if _RB_NP[zl, r] != 0
]


def _i32(x):
    return x.astype(jnp.int32)


class _OutRef:
    """Write-only ref shim for CPU execution of kernel bodies.

    Pallas interpret mode costs minutes per call here (it dispatches the
    kernel's thousands of vector ops eagerly), so for CPU tests we run
    the kernel body directly as traced XLA ops: input refs are the plain
    arrays (the bodies only read `ref[i]` on the leading axis, which jnp
    indexing provides), outputs collect through this shim.  The body is
    compiled once per static kernel config on a canonical 1024-lane tile
    (callers chunk to it), so every test shape shares one XLA module and
    the persistent compile cache makes reruns cheap.  The TPU Pallas
    lowering itself is exercised on hardware by bench/devpipe.
    """

    def __init__(self, n: int):
        self.slots = [None] * n

    def __setitem__(self, i, v):
        self.slots[i] = v


@functools.partial(jax.jit, static_argnames=("nh", "n_w", "hdr_max"))
def _pack_tile(lv, nc, maxc, cr, hl, hv, *, nh, n_w, hdr_max):
    w, bl = _OutRef(n_w), _OutRef(1)
    _cavlc_kernel(nh, n_w, hdr_max, lv, nc, maxc, cr, hl, hv, w, bl)
    return jnp.stack(w.slots), bl.slots[0]


@functools.partial(jax.jit, static_argnames=("k_in", "w_in", "n_out"))
def _merge_tile(w_t, b_t, *, k_in, w_in, n_out):
    o, bl = _OutRef(n_out), _OutRef(1)
    _merge_kernel(k_in, w_in, n_out, w_t, b_t, o, bl)
    return jnp.stack(o.slots), bl.slots[0]


def _cavlc_kernel(nh: int, n_w: int, hdr_max: int,
                  lv_ref, nc_ref, maxc_ref, cr_ref, hl_ref, hv_ref,
                  w_ref, bl_ref):
    """One tile: 1024 blocks. lv_ref [16, 8, 128]; nc/maxc/cr [1, 8, 128];
    hl/hv [nh, 8, 128]; w_ref [n_w, 8, 128]; bl_ref [1, 8, 128]."""
    lv = [lv_ref[j] for j in range(16)]
    nc = nc_ref[0]
    maxc = maxc_ref[0]
    code_res = cr_ref[0] != 0  # gate: residual slots coded at all?

    nz = [l != 0 for l in lv]
    nzi = [_i32(b) for b in nz]
    absd = [jnp.abs(l) for l in lv]

    # totals and per-position "nonzeros above j" (descending rank)
    incl = []
    run_sum = jnp.zeros_like(nc)
    for j in range(16):
        run_sum = run_sum + nzi[j]
        incl.append(run_sum)
    total = run_sum
    above = [total - incl[j] for j in range(16)]

    # trailing ones
    last_big = jnp.full_like(nc, -1)
    for j in range(16):
        big = nz[j] & (absd[j] > 1)
        last_big = jnp.maximum(last_big, jnp.where(big, j, -1))
    t1cnt = jnp.zeros_like(nc)
    for j in range(16):
        t1cnt = t1cnt + _i32(nz[j] & (j > last_big))
    t1 = jnp.minimum(3, t1cnt)
    is_t1 = [nz[j] & (j > last_big) & (above[j] < t1) for j in range(16)]

    # ---- coeff_token: one-hot over valid (ctx*17+total, t1) entries ----
    ctx = jnp.where(
        nc < 0, 4,
        jnp.where(nc < 2, 0, jnp.where(nc < 4, 1, jnp.where(nc < 8, 2, 3))),
    )
    row_idx = ctx * 17 + total
    t1m = [t1 == t for t in range(4)]
    tok = jnp.zeros_like(nc)
    by_row = {}
    for r, t, packed in _CT_ENTRIES:
        by_row.setdefault(r, []).append((t, packed))
    for r, cols in by_row.items():
        rm = row_idx == r
        for t, packed in cols:
            tok = tok | jnp.where(rm & t1m[t], packed, 0)
    tok_len = tok >> 16
    tok_val = tok & 0xFFFF

    # ---- level chain (descending positions), same math as block_slots ----
    sl = jnp.where((total > 10) & (t1 < 3), 1, 0)
    lev = []  # (zhi_len, merged_len, merged_val) per j desc
    for j in range(15, -1, -1):
        l, a = lv[j], absd[j]
        active = nz[j] & ~is_t1[j]
        sign = is_t1[j]
        abv = above[j]
        first = active & (abv == t1)
        lc = 2 * a - 2 + _i32(l < 0)
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
            small0, 0, jnp.where(mid0, 4, jnp.where(smallp, sl, p - 3))
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
        tail_val = jnp.where(sign, _i32(l < 0), tail_val)

        new_sl = jnp.maximum(sl, 1)
        new_sl = jnp.where(
            (a > (3 << (new_sl - 1))) & (new_sl < 6), new_sl + 1, new_sl
        )
        sl = jnp.where(active, new_sl, sl)

        sufl = jnp.where(active, sufl, 0)
        sufv = jnp.where(active, sufv, 0)
        lev.append((zhi, tail_len + sufl, (tail_val << sufl) | sufv))

    # ---- total_zeros ----
    idx_hi = jnp.full_like(nc, -1)
    for j in range(16):
        idx_hi = jnp.maximum(idx_hi, jnp.where(nz[j], j, -1))
    tz = idx_hi + 1 - total
    have_tz = (total > 0) & (total < maxc)
    is_cdc = maxc == 4
    t_row = total - 1
    tz_e = jnp.zeros_like(nc)
    by_row = {}
    for t, z, packed in _TZ_ENTRIES:
        by_row.setdefault(t, []).append((z, packed, False))
    for t, z, packed in _TZC_ENTRIES:
        by_row.setdefault(t, []).append((z, packed, True))
    zm = [tz == z for z in range(16)]
    for t, cols in by_row.items():
        rm = t_row == t
        for z, packed, chroma in cols:
            m = rm & zm[z] & (is_cdc if chroma else ~is_cdc)
            tz_e = tz_e | jnp.where(m, packed, 0)
    tz_len = jnp.where(have_tz, tz_e >> 16, 0)
    tz_val = jnp.where(have_tz, tz_e & 0xFFFF, 0)

    # ---- run_before (positions 15..1 descending) ----
    # prev nonzero strictly below each position: running max
    pnb = [None] * 16
    m = jnp.full_like(nc, -1)
    for j in range(16):
        pnb[j] = m
        m = jnp.maximum(m, jnp.where(nz[j], j, -1))
    runs = []
    rb_by_row = {}
    for zl, r, packed in _RB_ENTRIES:
        rb_by_row.setdefault(zl, []).append((r, packed))
    for j in range(15, 0, -1):
        below_nzcnt = incl[j] - nzi[j]
        zeros_below = j - below_nzcnt
        emit = nz[j] & (above[j] < total - 1) & (zeros_below > 0)
        run = j - pnb[j] - 1
        zl = jnp.clip(zeros_below, 1, 7) - 1
        e = jnp.zeros_like(nc)
        for zrow, cols in rb_by_row.items():
            rm = zl == zrow
            for r, packed in cols:
                e = e | jnp.where(rm & (run == r), packed, 0)
        runs.append((jnp.where(emit, e >> 16, 0), jnp.where(emit, e & 0xFFFF, 0)))

    # ---- pack: offsets over ALL slots; emissions skip zero-payload zhi --
    # slot order matches entropy_tpu: [hdr*nh, tok, (zhi, merged)*16 desc,
    # tz, run*15 desc].  Residual slots are gated on code_res (the
    # P-frame "inter MBs have no luma-DC chunk" rule, entropy_tpu kill0).
    def gate(ln):
        return jnp.where(code_res, ln, 0)

    slots_len = []   # (len, static_maxlen)
    emits = []       # (slot_index, val)
    for i in range(nh):
        slots_len.append((hl_ref[i], hdr_max))
        emits.append((len(slots_len) - 1, hv_ref[i]))
    slots_len.append((gate(tok_len), 16))
    emits.append((len(slots_len) - 1, tok_val))
    for zhi, mlen, mval in lev:
        slots_len.append((gate(zhi), 16))              # no payload
        slots_len.append((gate(mlen), 22))
        emits.append((len(slots_len) - 1, mval))
    slots_len.append((gate(tz_len), 9))
    emits.append((len(slots_len) - 1, tz_val))
    for rl, rv in runs:
        slots_len.append((gate(rl), 11))
        emits.append((len(slots_len) - 1, rv))

    # exclusive prefix offsets + static max-cumulative bits per slot
    offs = []
    maxcum = []
    off = jnp.zeros_like(nc)
    mc = 0
    for ln, mx in slots_len:
        offs.append(off)
        maxcum.append(mc)
        off = off + ln
        mc += mx
    bl_ref[0] = off

    # per-emission word pieces (values gated on len > 0: dead slots may
    # carry stale values, e.g. the P-frame header layout)
    pieces = []  # (h0, c_hi, c_lo, max_end_bits)
    for k, val in emits:
        ln = slots_len[k][0]
        val = jnp.where(ln > 0, val, 0)
        o = offs[k]
        b = o & 31
        end = b + ln
        c_hi = jnp.where(
            end <= 32,
            val << jnp.clip(32 - end, 0, 31),
            jax.lax.shift_right_logical(val, jnp.clip(end - 32, 0, 31)),
        )
        c_lo = jnp.where(end > 32, val << jnp.clip(64 - end, 1, 31), 0)
        pieces.append((o >> 5, c_hi, c_lo, maxcum[k] + slots_len[k][1]))

    for w in range(n_w):
        acc = jnp.zeros_like(nc)
        for h0, c_hi, c_lo, max_end in pieces:
            if max_end <= 32 * w:      # slot can never reach word w
                continue
            acc = acc | jnp.where(h0 == w, c_hi, 0)
            if w > 0:
                acc = acc | jnp.where(h0 == w - 1, c_lo, 0)
        w_ref[w] = acc


def pack_blocks(levels, nc, maxc, hdr_len, hdr_val, n_w: int,
                nh: int, hdr_max: int = 16, interpret: bool = False,
                code_residual=None):
    """Fused block_slots+pack_slots.

    levels [..., 16] int; nc [...]; maxc [...] (broadcastable);
    hdr_len/hdr_val [..., nh] leading header slots (<= hdr_max bits each,
    zero-length where absent); code_residual [...] bool (False = emit
    header slots only, e.g. P-frame inter MBs' chunk 0).  Returns
    (words [..., n_w] int32 MSB-first, bitlen [...] int32) identical to
    pack_slots(concat([hdr, block_slots(...)]), n_w).

    interpret=True (CPU tests): the kernel body runs as plain XLA ops on
    canonical 1024-lane tiles (see _OutRef) instead of pl.pallas_call.
    """
    if code_residual is None:
        code_residual = jnp.ones(levels.shape[:-1], jnp.int32)
    if interpret:
        return _pack_blocks_host(levels, nc, maxc, code_residual,
                                 hdr_len, hdr_val, n_w, nh, hdr_max)
    return _pack_blocks_dev(levels, nc, maxc, code_residual,
                            hdr_len, hdr_val, n_w=n_w, nh=nh,
                            hdr_max=hdr_max)


def _prep_lanes(x, lead, n, nt, inner):
    """[*lead, *inner] -> [prod(inner) or 1, nt//128, 128] lane layout."""
    x = _i32(jnp.asarray(x))
    x = jnp.broadcast_to(x, (*lead, *inner) if inner else lead)
    flat = x.reshape(n, -1).T  # [inner?, n]
    flat = jnp.pad(flat, ((0, 0), (0, nt - n)))
    return flat.reshape(flat.shape[0], nt // 128, 128)


def _pack_blocks_host(levels, nc, maxc, code_residual, hdr_len, hdr_val,
                      n_w: int, nh: int, hdr_max: int):
    lead = levels.shape[:-1]
    n = int(np.prod(lead)) if lead else 1
    nt = -(-n // LANES) * LANES
    lv = _prep_lanes(levels, lead, n, nt, (16,))
    nc_a = _prep_lanes(nc, lead, n, nt, ())
    maxc_a = _prep_lanes(maxc, lead, n, nt, ())
    cr_a = _prep_lanes(code_residual, lead, n, nt, ())
    hl = _prep_lanes(hdr_len, lead, n, nt, (nh,))
    hv = _prep_lanes(hdr_val, lead, n, nt, (nh,))
    w_parts, b_parts = [], []
    for i in range(nt // LANES):
        s = slice(8 * i, 8 * (i + 1))
        w, b = _pack_tile(
            lv[:, s], nc_a[:, s], maxc_a[:, s], cr_a[:, s],
            hl[:, s], hv[:, s], nh=nh, n_w=n_w, hdr_max=hdr_max,
        )
        w_parts.append(w)
        b_parts.append(b)
    words = jnp.concatenate(w_parts, axis=1)
    bitlen = jnp.concatenate(b_parts, axis=1)
    words = words.reshape(n_w, nt)[:, :n].T.reshape(*lead, n_w)
    bitlen = bitlen.reshape(nt)[:n].reshape(lead)
    return words, bitlen


@functools.partial(jax.jit, static_argnames=("n_w", "nh", "hdr_max"))
def _pack_blocks_dev(levels, nc, maxc, code_residual, hdr_len, hdr_val,
                     n_w: int, nh: int, hdr_max: int = 16):
    lead = levels.shape[:-1]
    n = int(np.prod(lead)) if lead else 1
    nt = -(-n // LANES) * LANES
    g = nt // LANES

    def prep(x, inner):
        x = _i32(jnp.asarray(x))
        x = jnp.broadcast_to(x, (*lead, *inner) if inner else lead)
        flat2d = x.reshape(n, -1)
        # REQUIRED on TPU: materialize the collapsed-lead 2-D form
        # before the lane transpose.  When the (>2-D lead) reshape fuses
        # with the transpose/pad chain, XLA corrupts a few chunks near
        # the end of the lane space (observed at 854x480: 3 of 1,049,760
        # chunk strings wrong -> undecodable stream); the same data fed
        # through the identical kernel with a pre-flattened lead is
        # exact.  The barrier costs one HBM round trip of the operand.
        flat2d = jax.lax.optimization_barrier(flat2d)
        flat = flat2d.T  # [inner?, n]
        flat = jnp.pad(flat, ((0, 0), (0, nt - n)))
        return flat.reshape(flat.shape[0], nt // 128, 128)

    lv = prep(levels, (16,))
    nc_a = prep(nc, ())
    maxc_a = prep(maxc, ())
    cr_a = prep(code_residual, ())
    hl = prep(hdr_len, (nh,))
    hv = prep(hdr_val, (nh,))

    body = functools.partial(_cavlc_kernel, nh, n_w, hdr_max)
    spec2 = lambda d0: pl.BlockSpec(
        (d0, 8, 128), lambda i: (0, i, 0), memory_space=pltpu.VMEM
    )
    words, bitlen = pl.pallas_call(
        body,
        grid=(g,),
        in_specs=[spec2(16), spec2(1), spec2(1), spec2(1),
                  spec2(nh), spec2(nh)],
        out_specs=(spec2(n_w), spec2(1)),
        out_shape=(
            jax.ShapeDtypeStruct((n_w, nt // 128, 128), jnp.int32),
            jax.ShapeDtypeStruct((1, nt // 128, 128), jnp.int32),
        ),
    )(lv, nc_a, maxc_a, cr_a, hl, hv)

    # pin the lane-major 2-D form before re-expanding the lead dims:
    # fusing the [n_w, nt] transpose with the multi-dim lead reshape
    # miscompiles on TPU near the end of the lane space (see the prep
    # barrier comment; the 2-D form in isolation is verified exact)
    w2 = jax.lax.optimization_barrier(words.reshape(n_w, nt)[:, :n].T)
    words = w2.reshape(*lead, n_w)
    bitlen = bitlen.reshape(nt)[:n].reshape(lead)
    return words, bitlen


# ---------------------------------------------------------------------------
# Binary merge tree: K bit strings per lane -> one string, in VMEM.
# Replaces entropy_tpu.tree_merge for the chunk->MB level (the XLA tree
# bounces every level's word arrays through HBM; here the whole tree for
# a tile of lanes lives in VMEM).
# ---------------------------------------------------------------------------

MERGE_LANES = 1024


def _merge_two(a, la, b, lb, w_out):
    """Merge python-list word strings a (len Wa) and b (len Wb): b is
    appended at bit offset la.  Strings are MSB-first 32-bit words,
    all-zero past their bit length.  Returns (list of w_out, la+lb)."""
    wa, wb = len(a), len(b)
    sh = la & 31
    inv = jnp.clip(32 - sh, 0, 31)
    pos = sh > 0
    b_sh = []
    for i in range(wb):
        lo = jax.lax.shift_right_logical(b[i], sh)
        hi = (b[i - 1] << inv) if i > 0 else jnp.zeros_like(b[0])
        b_sh.append(jnp.where(pos, lo | hi, b[i]))
    b_sh.append(jnp.where(pos, b[wb - 1] << inv, 0))  # spill word

    x = [b_sh[i] if i < len(b_sh) else jnp.zeros_like(b[0])
         for i in range(w_out)]
    off = la >> 5  # word offset of b, <= wa
    k = 0
    while (1 << k) <= wa:
        bit = ((off >> k) & 1) == 1
        step = 1 << k
        x = [jnp.where(bit, x[i - step] if i >= step else 0, x[i])
             for i in range(w_out)]
        k += 1
    out = [(a[i] | x[i]) if i < wa else x[i] for i in range(w_out)]
    return out, la + lb


def _merge_kernel(k_in: int, w_in: int, n_out: int,
                  w_ref, b_ref, out_ref, bl_ref):
    """One tile: w_ref [K, W, 8, 128]; b_ref [K, 8, 128];
    out_ref [n_out, 8, 128]; bl_ref [1, 8, 128]."""
    zero = jnp.zeros_like(b_ref[0])
    strings = [([w_ref[k, w] for w in range(w_in)], b_ref[k])
               for k in range(k_in)]
    kp = 1 << (k_in - 1).bit_length()
    strings += [([zero] * w_in, zero)] * (kp - k_in)
    while len(strings) > 1:
        nxt = []
        for i in range(0, len(strings), 2):
            (aw, al), (bw, bl) = strings[i], strings[i + 1]
            w_out = min(len(aw) + len(bw), n_out)
            nxt.append(_merge_two(aw, al, bw, bl, w_out))
        strings = nxt
    words, bits = strings[0]
    for i in range(n_out):
        out_ref[i] = words[i] if i < len(words) else zero
    bl_ref[0] = bits


def merge_tree(words, bits, n_out: int, interpret: bool = False):
    """words [..., K, W] int32 MSB-first strings (zero past bit length),
    bits [..., K] -> ([..., n_out], [...]).  Bit-identical to
    entropy_tpu.tree_merge.

    interpret=True (CPU tests): kernel body as plain XLA ops on
    canonical tiles (see _OutRef)."""
    if interpret:
        return _merge_tree_host(words, bits, n_out)
    return _merge_tree_dev(words, bits, n_out=n_out)


def _merge_prep(words, bits, k_in, w_in, n, nt):
    w_t = _i32(words).reshape(n, k_in, w_in).transpose(1, 2, 0)
    w_t = jnp.pad(w_t, ((0, 0), (0, 0), (0, nt - n)))
    w_t = w_t.reshape(k_in, w_in, nt // 128, 128)
    b_t = _i32(bits).reshape(n, k_in).T
    b_t = jnp.pad(b_t, ((0, 0), (0, nt - n))).reshape(k_in, nt // 128, 128)
    return w_t, b_t


def _merge_tree_host(words, bits, n_out: int):
    lead = words.shape[:-2]
    k_in, w_in = words.shape[-2:]
    n = int(np.prod(lead)) if lead else 1
    nt = -(-n // MERGE_LANES) * MERGE_LANES
    w_t, b_t = _merge_prep(words, bits, k_in, w_in, n, nt)
    o_parts, b_parts = [], []
    for i in range(nt // MERGE_LANES):
        s = slice(8 * i, 8 * (i + 1))
        o, b = _merge_tile(w_t[:, :, s], b_t[:, s],
                           k_in=k_in, w_in=w_in, n_out=n_out)
        o_parts.append(o)
        b_parts.append(b)
    out = jnp.concatenate(o_parts, axis=1)
    bl = jnp.concatenate(b_parts, axis=1)
    out = out.reshape(n_out, nt)[:, :n].T.reshape(*lead, n_out)
    bl = bl.reshape(nt)[:n].reshape(lead)
    return out, bl


@functools.partial(jax.jit, static_argnames=("n_out",))
def _merge_tree_dev(words, bits, n_out: int):  # noqa: C901
    lead = words.shape[:-2]
    k_in, w_in = words.shape[-2:]
    n = int(np.prod(lead)) if lead else 1
    nt = -(-n // MERGE_LANES) * MERGE_LANES
    g = nt // MERGE_LANES

    # collapse the lead dims and pin the 2-D/3-D form before the lane
    # transpose -- same TPU miscompile class as _pack_blocks_dev's prep
    # (see the barrier comment there)
    w_flat = jax.lax.optimization_barrier(
        _i32(words).reshape(n, k_in, w_in))
    w_t = w_flat.transpose(1, 2, 0)
    w_t = jnp.pad(w_t, ((0, 0), (0, 0), (0, nt - n)))
    w_t = w_t.reshape(k_in, w_in, nt // 128, 128)
    b_flat = jax.lax.optimization_barrier(_i32(bits).reshape(n, k_in))
    b_t = b_flat.T
    b_t = jnp.pad(b_t, ((0, 0), (0, nt - n))).reshape(k_in, nt // 128, 128)

    body = functools.partial(_merge_kernel, k_in, w_in, n_out)
    out, bl = pl.pallas_call(
        body,
        grid=(g,),
        in_specs=[
            pl.BlockSpec((k_in, w_in, 8, 128), lambda i: (0, 0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k_in, 8, 128), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((n_out, 8, 128), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, 128), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n_out, nt // 128, 128), jnp.int32),
            jax.ShapeDtypeStruct((1, nt // 128, 128), jnp.int32),
        ),
    )(w_t, b_t)

    # pin the 2-D lane-major form before the multi-dim lead reshape
    # (same miscompile class as _pack_blocks_dev's output; see there)
    o2 = jax.lax.optimization_barrier(out.reshape(n_out, nt)[:, :n].T)
    out = o2.reshape(*lead, n_out)
    bl = bl.reshape(nt)[:n].reshape(lead)
    return out, bl
