"""ctypes binding to the native CAVLC engine (native/cavlc.cpp).

Auto-builds libtpuh264.so on first use (make -C native).  All entry
points mirror entropy/pack.py exactly; tests require byte equality.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

from ..core import nal
from ..core.bitstream import BitReader, BitWriter
from ..core.params import PPS, SPS
from ..core.sliceheader import SLICE_I, SliceHeader

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libtpuh264.so")
_lock = threading.Lock()
_lib = None

_I32P = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
_I16P = np.ctypeslib.ndpointer(np.int16, flags="C_CONTIGUOUS")
_U8P = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")


def _build() -> None:
    subprocess.run(
        ["make", "-s", "-C", _NATIVE_DIR], check=True, capture_output=True
    )


def load() -> ctypes.CDLL:
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        src = os.path.join(_NATIVE_DIR, "cavlc.cpp")
        if not os.path.exists(_LIB_PATH) or (
            os.path.exists(src)
            and os.path.getmtime(src) > os.path.getmtime(_LIB_PATH)
        ):
            _build()
        lib = ctypes.CDLL(_LIB_PATH)
        lib.th264_pack_slice.restype = ctypes.c_int64
        lib.th264_pack_slice.argtypes = [
            _U8P, ctypes.c_int32,
            ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
            _I32P, _I16P, _I16P, _I16P, _I16P,
            _I32P, _I32P, _I32P,
            _I16P, _I32P,
            _U8P, ctypes.c_int64,
        ]
        lib.th264_parse_slice.restype = ctypes.c_int64
        lib.th264_parse_slice.argtypes = [
            _U8P, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
            _I32P, _I16P, _I16P, _I16P, _I16P,
            _I32P, _I32P, _I32P,
            _I16P, _I32P,
        ]
        for fn in (lib.th264_escape, lib.th264_unescape):
            fn.restype = ctypes.c_int64
            fn.argtypes = [_U8P, ctypes.c_int64, _U8P, ctypes.c_int64]
        _I64P = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
        lib.th264_pack_frame.restype = ctypes.c_int64
        lib.th264_pack_frame.argtypes = [
            _U8P, _I64P, _I32P,
            ctypes.c_int32, _I32P, _I32P,
            ctypes.c_uint8, ctypes.c_int32,
            _I32P, _I16P, _I16P, _I16P, _I16P,
            _I32P, _I32P, _I32P,
            _I16P, _I32P,
            _U8P, ctypes.c_int64, ctypes.c_int32,
        ]
        lib.th264_parse_frame.restype = ctypes.c_int64
        lib.th264_parse_frame.argtypes = [
            _U8P, _I64P, _I64P, _I64P, _I32P,
            ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
            _I32P, _I16P, _I16P, _I16P, _I16P,
            _I32P, _I32P, _I32P,
            _I16P, _I32P, ctypes.c_int32,
        ]
        _I64P = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
        lib.th264_parse_dispatch_compact.restype = ctypes.c_int64
        lib.th264_parse_dispatch_compact.argtypes = [
            _U8P, _I64P, ctypes.c_int32,
            ctypes.c_int32, ctypes.c_int32,
            ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
            ctypes.c_int32,
            _I32P,
            _I32P, _I16P, ctypes.c_int64,
            _I32P, _I16P, ctypes.c_int64,
            _I64P, ctypes.c_int32,
        ]
        lib.th264_pack_slice_p.restype = ctypes.c_int64
        lib.th264_pack_slice_p.argtypes = [
            _U8P, ctypes.c_int32,
            ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
            _I32P, _I16P, _I16P, _I16P, _I16P,
            _I32P, _I32P, _I32P, ctypes.c_int32,
            _U8P, ctypes.c_int64,
        ]
        lib.th264_parse_slice_p.restype = ctypes.c_int64
        lib.th264_parse_slice_p.argtypes = [
            _U8P, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
            _I32P, _I16P, _I16P, _I16P, _I16P,
            _I32P, _I32P, _I32P, ctypes.c_int32,
        ]
        _lib = lib
        return lib


def available() -> bool:
    try:
        load()
        return True
    except Exception:
        return False


def escape_rbsp(rbsp: bytes) -> bytes:
    lib = load()
    src = np.frombuffer(rbsp, np.uint8)
    out = np.empty(len(rbsp) * 3 // 2 + 16, np.uint8)
    n = lib.th264_escape(src, len(src), out, len(out))
    assert n >= 0
    return out[:n].tobytes()


def unescape_rbsp(ebsp: bytes) -> bytes:
    lib = load()
    src = np.frombuffer(ebsp, np.uint8)
    out = np.empty(len(ebsp) + 16, np.uint8)
    n = lib.th264_unescape(src, len(src), out, len(out))
    assert n >= 0
    return out[:n].tobytes()


def pack_iframe(
    mb_info: np.ndarray,
    luma_dc: np.ndarray,
    luma_ac: np.ndarray,
    chroma_dc: np.ndarray,
    chroma_ac: np.ndarray,
    sps: SPS,
    pps: PPS,
    qp: int,
    slice_mode: str = "rows",
    frame_num: int = 0,
    idr: bool = True,
    include_ps: bool = True,
    deblock_idc: int = 1,
    threads: int = 0,
    i4modes: Optional[np.ndarray] = None,
) -> bytes:
    """Native-path equivalent of entropy.pack.pack_iframe (byte-identical).

    threads=0 means one thread per CPU (row-slices pack independently,
    mirroring the reference's worker-pool "threads" axis, app.js:440-459).
    """
    lib = load()
    mbw, mbh = sps.mb_width, sps.mb_height
    mb_info = np.ascontiguousarray(mb_info, np.int32)
    luma_dc = np.ascontiguousarray(luma_dc, np.int16)
    luma_ac = np.ascontiguousarray(luma_ac, np.int16)
    chroma_dc = np.ascontiguousarray(chroma_dc, np.int16)
    chroma_ac = np.ascontiguousarray(chroma_ac, np.int16)
    nnz_y = np.zeros(16 * mbw * mbh, np.int32)
    nnz_u = np.zeros(4 * mbw * mbh, np.int32)
    nnz_v = np.zeros(4 * mbw * mbh, np.int32)
    if i4modes is None:
        i4modes = np.zeros((mbw * mbh, 16), np.int16)
    i4modes = np.ascontiguousarray(i4modes, np.int16)
    i4ctx = np.full(16 * mbw * mbh, -1, np.int32)

    out = bytearray()
    if include_ps:
        w = BitWriter()
        sps.write(w)
        out += nal.wrap_nal(nal.NAL_SPS, w.get_bytes())
        w = BitWriter()
        pps.write(w)
        out += nal.wrap_nal(nal.NAL_PPS, w.get_bytes())

    if slice_mode == "rows":
        slices = [(r * mbw, mbw) for r in range(mbh)]
    elif slice_mode == "single":
        slices = [(0, mbw * mbh)]
    else:
        raise ValueError(slice_mode)

    headers = bytearray()
    header_off = np.zeros(len(slices), np.int64)
    header_bits = np.zeros(len(slices), np.int32)
    for i, (start, _) in enumerate(slices):
        w = BitWriter()
        SliceHeader(
            first_mb_in_slice=start,
            slice_type=SLICE_I,
            frame_num=frame_num,
            slice_qp_delta=qp - 26 - pps.pic_init_qp_minus26,
            disable_deblocking_filter_idc=deblock_idc,
        ).write(w, sps, pps, idr)
        header_off[i] = len(headers)
        header_bits[i] = w.bit_length
        w.u((8 - w.bit_length % 8) % 8, 0)
        headers += w.get_bytes()

    ntype = nal.NAL_SLICE_IDR if idr else nal.NAL_SLICE_NON_IDR
    nal_hdr = (3 << 5) | ntype
    starts = np.asarray([s for s, _ in slices], np.int32)
    counts = np.asarray([c for _, c in slices], np.int32)
    cap = 4096 * len(slices) + mbw * mbh * 1400
    buf = np.empty(cap, np.uint8)
    if threads <= 0:
        threads = os.cpu_count() or 1
    n = lib.th264_pack_frame(
        np.frombuffer(bytes(headers), np.uint8), header_off, header_bits,
        len(slices), starts, counts, nal_hdr, mbw,
        mb_info, luma_dc, luma_ac, chroma_dc, chroma_ac,
        nnz_y, nnz_u, nnz_v, i4modes, i4ctx, buf, cap, threads,
    )
    if n < 0:
        raise RuntimeError("th264_pack_frame failed")
    out += buf[:n].tobytes()
    return bytes(out)


def parse_iframe(
    data: bytes,
    threads: int = 0,
) -> Tuple[SPS, PPS, int, np.ndarray, np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Native-path equivalent of entropy.pack.parse_iframe (threaded)."""
    lib = load()
    sps: Optional[SPS] = None
    pps: Optional[PPS] = None
    qp = 26
    slices = []  # (rbsp bytes, start_bit, first_mb)
    for _, ntype, rbsp in nal.split_annexb(data):
        if ntype == nal.NAL_SPS:
            sps = SPS.parse(BitReader(rbsp))
        elif ntype == nal.NAL_PPS:
            pps = PPS.parse(BitReader(rbsp))
        elif ntype in (nal.NAL_SLICE_IDR, nal.NAL_SLICE_NON_IDR):
            assert sps is not None and pps is not None
            r = BitReader(rbsp)
            header = SliceHeader.parse(r, sps, pps, ntype == nal.NAL_SLICE_IDR)
            qp = 26 + pps.pic_init_qp_minus26 + header.slice_qp_delta
            slices.append((rbsp, r.bit_position, header.first_mb_in_slice))
    assert slices and sps is not None and pps is not None
    mbw, mbh = sps.mb_width, sps.mb_height
    n = mbw * mbh
    arrays = (
        np.zeros((n, 4), np.int32),
        np.zeros((n, 16), np.int16),
        np.zeros((n, 16, 16), np.int16),
        np.zeros((n, 2, 4), np.int16),
        np.zeros((n, 2, 4, 15), np.int16),
    )
    nnz = (
        np.zeros(16 * n, np.int32),
        np.zeros(4 * n, np.int32),
        np.zeros(4 * n, np.int32),
    )
    i4m = np.full((n, 16), -1, np.int16)
    i4ctx = np.full(16 * n, -1, np.int32)
    blob = b"".join(s[0] for s in slices)
    off = np.zeros(len(slices), np.int64)
    nbytes = np.zeros(len(slices), np.int64)
    start_bit = np.zeros(len(slices), np.int64)
    first_mb = np.zeros(len(slices), np.int32)
    o = 0
    for i, (rbsp, bit, mb0) in enumerate(slices):
        off[i], nbytes[i], start_bit[i], first_mb[i] = o, len(rbsp), bit, mb0
        o += len(rbsp)
    if threads <= 0:
        threads = os.cpu_count() or 1
    got = lib.th264_parse_frame(
        np.frombuffer(blob, np.uint8), off, nbytes, start_bit, first_mb,
        len(slices), mbw, n, *arrays, *nnz, i4m, i4ctx, threads,
    )
    if got < 0:
        raise RuntimeError("th264_parse_frame failed")
    return (sps, pps, qp) + arrays + (i4m,)


def pack_pframe(
    mb_info: np.ndarray,
    luma_dc: np.ndarray,
    luma_ac: np.ndarray,
    chroma_dc: np.ndarray,
    chroma_ac: np.ndarray,
    sps: SPS,
    pps: PPS,
    qp: int,
    slice_mode: str = "rows",
    frame_num: int = 1,
    deblock_idc: int = 1,
    ref: bool = True,
    num_ref_active: int = 1,
) -> bytes:
    """Native-path equivalent of entropy.packp.pack_pframe (byte-identical)."""
    from ..core.sliceheader import SLICE_P

    lib = load()
    mbw, mbh = sps.mb_width, sps.mb_height
    mb_info = np.ascontiguousarray(mb_info, np.int32)
    luma_dc = np.ascontiguousarray(luma_dc, np.int16)
    luma_ac = np.ascontiguousarray(luma_ac, np.int16)
    chroma_dc = np.ascontiguousarray(chroma_dc, np.int16)
    chroma_ac = np.ascontiguousarray(chroma_ac, np.int16)
    nnz_y = np.zeros(16 * mbw * mbh, np.int32)
    nnz_u = np.zeros(4 * mbw * mbh, np.int32)
    nnz_v = np.zeros(4 * mbw * mbh, np.int32)
    if slice_mode == "rows":
        slices = [(r * mbw, mbw) for r in range(mbh)]
    elif slice_mode == "single":
        slices = [(0, mbw * mbh)]
    else:
        raise ValueError(slice_mode)
    out = bytearray()
    cap = 4096 + mbw * mbh * 1400
    buf = np.empty(cap, np.uint8)
    for start, count in slices:
        w = BitWriter()
        SliceHeader(
            first_mb_in_slice=start,
            slice_type=SLICE_P,
            frame_num=frame_num % (1 << (sps.log2_max_frame_num_minus4 + 4)),
            slice_qp_delta=qp - 26 - pps.pic_init_qp_minus26,
            disable_deblocking_filter_idc=deblock_idc,
            num_ref_idx_l0_active_minus1=num_ref_active - 1,
        ).write(w, sps, pps, idr=False, ref=ref)
        header_bits = w.bit_length
        w.u((8 - header_bits % 8) % 8, 0)
        header = np.frombuffer(w.get_bytes(), np.uint8)
        n = lib.th264_pack_slice_p(
            header, header_bits, start, count, mbw,
            mb_info, luma_dc, luma_ac, chroma_dc, chroma_ac,
            nnz_y, nnz_u, nnz_v, num_ref_active, buf, cap,
        )
        if n < 0:
            raise RuntimeError("th264_pack_slice_p failed")
        esc = np.empty(int(n) * 3 // 2 + 16, np.uint8)
        m = lib.th264_escape(buf, n, esc, len(esc))
        assert m >= 0
        out += nal.START_CODE + bytes(
            [((2 if ref else 0) << 5) | nal.NAL_SLICE_NON_IDR]
        )
        out += esc[:m].tobytes()
    return bytes(out)


def parse_pframe_slices(slices, sps: SPS, pps: PPS, nra: int = 1):
    """Native-path equivalent of entropy.packp.parse_pframe_slices."""
    lib = load()
    mbw, mbh = sps.mb_width, sps.mb_height
    n = mbw * mbh
    mb_info = np.zeros((n, 8), np.int32)
    luma_dc = np.zeros((n, 16), np.int16)
    luma_ac = np.zeros((n, 16, 16), np.int16)
    chroma_dc = np.zeros((n, 2, 4), np.int16)
    chroma_ac = np.zeros((n, 2, 4, 15), np.int16)
    nnz_y = np.zeros(16 * n, np.int32)
    nnz_u = np.zeros(4 * n, np.int32)
    nnz_v = np.zeros(4 * n, np.int32)
    for rbsp, start_bit, first_mb in slices:
        rb = np.frombuffer(rbsp, np.uint8)
        got = lib.th264_parse_slice_p(
            rb, len(rb), start_bit, first_mb, mbw, n - first_mb,
            mb_info, luma_dc, luma_ac, chroma_dc, chroma_ac,
            nnz_y, nnz_u, nnz_v, nra,
        )
        if got < 0:
            raise RuntimeError("th264_parse_slice_p failed")
    return mb_info, luma_dc, luma_ac, chroma_dc, chroma_ac


# per-MB slot layout of the compact coefficient records emitted by
# th264_parse_dispatch_compact (native/cavlc.cpp): the virtual dense
# tensor is [F, N_mb, 400] = [luma DC 16 | luma AC 16x16 | chroma DC 2x4
# | chroma AC 2x4x15]
MB_SLOTS = 400


def parse_dispatch_compact(
    frames, mbw: int, mbh: int, sps: SPS, pps: PPS,
    cap_mb: int = 0, cap_c: int = 0, threads: int = 0,
):
    """Full annex-B entropy-decode front end for a batch of access units.

    `frames`: list of per-frame-stream annex-B byte strings.  Returns
    (qp, mb_pos[int32 n_mb], mb_fields[int16 n_mb, 9],
     cpos[int32 n_c], cval[int16 n_c]) compact records -- the honest
    decode-side input for the device reconstruction (the role
    DecodeFrameNoDelay's entropy half plays per decoder worker in the
    reference, /root/reference/openh264_wrapper.cpp:391-422).  Caps are
    grown automatically on overflow.
    """
    lib = load()
    n_fs = len(frames)
    blob = b"".join(frames)
    fs_off = np.zeros(n_fs + 1, np.int64)
    o = 0
    for i, fb in enumerate(frames):
        fs_off[i] = o
        o += len(fb)
    fs_off[n_fs] = o
    blob_a = np.frombuffer(blob, np.uint8)
    if cap_mb <= 0:
        cap_mb = max(4096, n_fs * mbw * mbh // 4)
    if cap_c <= 0:
        cap_c = max(65536, len(blob))
    if threads <= 0:
        threads = os.cpu_count() or 1
    qp_out = np.zeros(n_fs, np.int32)
    counts = np.zeros(2, np.int64)
    while True:
        mb_pos = np.empty(cap_mb, np.int32)
        mb_fields = np.empty((cap_mb, 9), np.int16)
        cpos = np.empty(cap_c, np.int32)
        cval = np.empty(cap_c, np.int16)
        rc = lib.th264_parse_dispatch_compact(
            blob_a, fs_off, n_fs, mbw, mbh,
            sps.log2_max_frame_num_minus4 + 4,
            (sps.log2_max_pic_order_cnt_lsb_minus4 + 4
             if sps.pic_order_cnt_type == 0 else 0),
            pps.deblocking_filter_control_present_flag,
            26 + pps.pic_init_qp_minus26,
            qp_out, mb_pos, mb_fields, cap_mb, cpos, cval, cap_c,
            counts, threads,
        )
        if rc == 0:
            break
        if rc == -2:
            cap_mb = max(cap_mb, 2 * int(counts[0]))
            cap_c = max(cap_c, 2 * int(counts[1]))
            continue
        raise RuntimeError("th264_parse_dispatch_compact failed")
    n_mb, n_c = int(counts[0]), int(counts[1])
    qp = int(qp_out[0])
    if not (qp_out == qp).all():
        raise RuntimeError("non-uniform slice QP in dispatch")
    return qp, mb_pos[:n_mb], mb_fields[:n_mb], cpos[:n_c], cval[:n_c]
