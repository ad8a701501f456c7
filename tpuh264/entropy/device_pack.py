"""Host wrapper for the on-device CAVLC assembler (kernels/entropy_tpu.py).

Per frame, only the actual slice payload bytes cross the host link; the
host's remaining work is emulation prevention + NAL framing (native C++)
-- byte-identical output to entropy.native / entropy.pack.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np
import jax.numpy as jnp

import functools

from ..core import nal
from ..core.bitstream import BitWriter
from ..core.params import PPS, SPS
from ..core.sliceheader import SLICE_I, SLICE_P, SliceHeader
from ..kernels import entropy_tpu

_HDR_CACHE = {}


def slice_headers_device(
    sps: SPS,
    pps: PPS,
    qp: int,
    frame_num: int,
    idr: bool,
    s: int,
    slice_type: int = SLICE_I,
    ref: bool = True,
    deblock_idc: int = 1,
    num_ref_active: int = 1,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-(stream, row) slice-header bit strings as device arrays.

    Cached per config: headers are constant for a given
    (dims, qp, frame_num, idr, type, ref, idc, nra, s), so the upload
    happens once per configuration."""
    key = (sps.mb_width, sps.mb_height, qp, frame_num, idr, s,
           pps.pic_init_qp_minus26, slice_type, ref, deblock_idc,
           num_ref_active)
    hit = _HDR_CACHE.get(key)
    if hit is not None:
        return hit
    mbw, mbh = sps.mb_width, sps.mb_height
    hw = np.zeros((s, mbh, 4), np.int32)
    ln = np.zeros((s, mbh), np.int32)
    for r in range(mbh):
        w = BitWriter()
        SliceHeader(
            first_mb_in_slice=r * mbw,
            slice_type=slice_type,
            frame_num=frame_num % (1 << (sps.log2_max_frame_num_minus4 + 4)),
            slice_qp_delta=qp - 26 - pps.pic_init_qp_minus26,
            disable_deblocking_filter_idc=deblock_idc,
            num_ref_idx_l0_active_minus1=num_ref_active - 1,
        ).write(w, sps, pps, idr, ref=ref)
        bits = w.bit_length
        w.u((32 - bits % 32) % 32, 0)
        data = np.frombuffer(w.get_bytes(), np.uint8).astype(np.int64)
        words = (
            (data[0::4] << 24) | (data[1::4] << 16)
            | (data[2::4] << 8) | data[3::4]
        ).astype(np.uint32).view(np.int32)
        hw[:, r, : len(words)] = words
        ln[:, r] = bits
    out = (jnp.asarray(hw), jnp.asarray(ln))
    _HDR_CACHE[key] = out
    return out


def assemble_iframe(
    symbols,
    sps: SPS,
    pps: PPS,
    qp: int,
    frame_num: int = 0,
    idr: bool = True,
    include_ps: bool = True,
):
    """symbols (device, S streams) -> list of per-stream annex-B bytes.

    Returns (streams list, overflowed bool).  On overflow the caller must
    fall back to the host packer (entropy.native).
    """
    s = int(symbols.mode.shape[0])
    hdr_hw, hdr_len = slice_headers_device(sps, pps, qp, frame_num, idr, s)
    slice_hw, slice_bytes, overflow = entropy_tpu.encode_bits_iframe(
        symbols, jnp.int32(qp), hdr_hw, hdr_len
    )
    # one fused metadata download (overflow flag + slice sizes)
    meta = np.asarray(
        jnp.concatenate(
            [
                overflow.astype(jnp.int32).reshape(1),
                slice_bytes.reshape(-1),
            ]
        )
    )
    if meta[0]:
        return None, True
    sbytes = meta[1:].reshape(s, -1)

    prefix = b""
    if include_ps:
        w = BitWriter()
        sps.write(w)
        prefix += nal.wrap_nal(nal.NAL_SPS, w.get_bytes())
        w = BitWriter()
        pps.write(w)
        prefix += nal.wrap_nal(nal.NAL_PPS, w.get_bytes())

    from . import native as entropy_native

    esc = (
        entropy_native.escape_rbsp
        if entropy_native.available()
        else nal.escape_rbsp
    )
    ntype = nal.NAL_SLICE_IDR if idr else nal.NAL_SLICE_NON_IDR
    header_byte = bytes([(3 << 5) | ntype])

    # bucketed column slice: covers the fattest slice, fixed granularity
    # so the download shape (and its compiled slice) stays stable
    n_cols = min(
        entropy_tpu.SLICE_W, -(-((int(sbytes.max()) + 3) // 4) // 512) * 512
    )
    slab = np.asarray(slice_hw[:, :, :n_cols]).view(np.uint32).astype(">u4")
    streams = []
    for i in range(s):
        out = bytearray(prefix)
        for r in range(sps.mb_height):
            rbsp = slab[i, r].tobytes()[: int(sbytes[i, r])]
            out += nal.START_CODE + header_byte + esc(rbsp)
        streams.append(bytes(out))
    return streams, False


def assemble_pframe(
    symbols,
    sps: SPS,
    pps: PPS,
    qp: int,
    frame_num: int = 1,
    ref: bool = True,
    deblock_idc: int = 1,
):
    """MBSymbolsP (device, S streams) -> list of per-stream annex-B bytes.

    Byte-identical to entropy.packp.pack_pframe (slice NALs only).
    Returns (streams list, overflowed bool)."""
    s = int(symbols.kind.shape[0])
    hdr_hw, hdr_len = slice_headers_device(
        sps, pps, qp, frame_num, False, s,
        slice_type=SLICE_P, ref=ref, deblock_idc=deblock_idc,
    )
    slice_hw, slice_bytes, overflow = entropy_tpu.encode_bits_pframe(
        symbols, jnp.int32(qp), hdr_hw, hdr_len
    )
    meta = np.asarray(
        jnp.concatenate(
            [
                overflow.astype(jnp.int32).reshape(1),
                slice_bytes.reshape(-1),
            ]
        )
    )
    if meta[0]:
        return None, True
    sbytes = meta[1:].reshape(s, -1)

    from . import native as entropy_native

    esc = (
        entropy_native.escape_rbsp
        if entropy_native.available()
        else nal.escape_rbsp
    )
    header_byte = bytes([((2 if ref else 0) << 5) | nal.NAL_SLICE_NON_IDR])
    n_cols = min(
        entropy_tpu.SLICE_W, -(-((int(sbytes.max()) + 3) // 4) // 512) * 512
    )
    slab = np.asarray(slice_hw[:, :, :n_cols]).view(np.uint32).astype(">u4")
    streams = []
    for i in range(s):
        out = bytearray()
        for r in range(sps.mb_height):
            rbsp = slab[i, r].tobytes()[: int(sbytes[i, r])]
            out += nal.START_CODE + header_byte + esc(rbsp)
        streams.append(bytes(out))
    return streams, False
