"""Encoder session: the TPU-native counterpart of the reference's encoder
C ABI (init_encoder / force_key_frame / encode_frame /
encode_frame_yuv_i420, /root/reference/openh264_wrapper.cpp:198-236,
315-389), extended with the codec interior the reference outsourced to
libopenh264.a -- and with multi-stream batching, which is the TPU's
natural scaling axis.

Pipeline per encode call:
  [host] RGBA copy-in           (timed as "copy", reference's frame-copy)
  [TPU ] color convert + MB scan -> symbol tensors + recon   ("encode")
  [host] CAVLC pack via native/cavlc.cpp -> annex-B          ("entropy")
"""

from __future__ import annotations

import dataclasses
import time
from typing import List, Optional, Sequence, Tuple, Union

import numpy as np
import jax
import jax.numpy as jnp

from ..core.params import PPS, SPS, PROFILE_MAIN
from ..entropy import cabac_pack
from ..entropy import native as entropy_native
from ..entropy import pack as entropy_pack
from ..entropy import packp as entropy_packp
from ..kernels import color, deblock as kdeblock, iframe, pframe, wavefront
from .config import CodecConfig
from .ratecontrol import RateController


@dataclasses.dataclass
class EncodedFrame:
    data: bytes
    is_idr: bool
    frame_num: int
    qp: int
    timings: dict


def _deblock_nnz(symbols, t8_enabled: bool):
    """Per-4x4 coded-coefficient grid for the deblocking bS derivation.
    For 8x8-transform MBs a 4x4 cell counts as coded iff its covering
    8x8 block has any coefficients (8.7.2.1)."""
    sh = symbols.kind.shape
    lac = symbols.luma_ac.astype(jnp.int32)
    nnz4 = jnp.count_nonzero(lac, axis=-1).reshape(*sh, 4, 4)
    if not t8_enabled or symbols.t8 is None:
        return nnz4
    any8 = jnp.any(lac.reshape(*sh, 4, 64) != 0, -1)  # per 8x8 (raster)
    cells8 = jnp.repeat(
        jnp.repeat(any8.reshape(*sh, 2, 2), 2, -1), 2, -2
    ).astype(jnp.int32)
    return jnp.where((symbols.t8 == 1)[..., None, None], cells8, nnz4)


def _pad_multiple(x: np.ndarray, mult: int, axes=(-2, -1)) -> np.ndarray:
    pads = [(0, 0)] * x.ndim
    for ax in axes:
        size = x.shape[ax]
        pad = (size + mult - 1) // mult * mult - size
        pads[ax % x.ndim] = (0, pad)
    if not any(p for _, p in pads):
        return x
    return np.pad(x, pads, mode="edge")


class EncoderSession:
    """One encoder session over a batch of `streams` independent inputs.

    The reference's encoder is a singleton re-initialized on config change
    (openh264_wrapper.cpp:200-204); re-creating this object is the same
    operation.
    """

    def __init__(self, config: Optional[CodecConfig] = None, **kw):
        if config is None:
            config = CodecConfig(**kw)
        self.config = config
        if config.slice_mode == "single" and config.deblock:
            # the wavefront kernel covers single-slice I prediction, but
            # the deblocking kernel still filters with row-slice
            # semantics; refuse rather than emit a stream whose decode
            # diverges from our recon
            raise NotImplementedError(
                "slice_mode='single' with deblock=True needs cross-row "
                "deblocking; use slice_mode='rows'"
            )
        if config.slice_mode == "single" and config.gop_size != 1:
            # P-frame kernels (MV prediction, skip derivation) are
            # row-slice; a single-slice P stream implies cross-row MV
            # predictors the scan does not model
            raise NotImplementedError(
                "slice_mode='single' currently supports I-only GOPs "
                "(gop_size=1)"
            )
        if config.slice_mode == "single" and config.intra44:
            raise NotImplementedError(
                "intra44 on the wavefront (single-slice) kernel lands "
                "later; use slice_mode='rows'"
            )
        if config.transform8x8 and not config.cabac:
            raise NotImplementedError(
                "transform8x8 requires cabac=True (CAVLC 8x8 exists in "
                "the golden codec; the engine packers are CABAC-first)"
            )
        self._num_ref = max(
            config.num_ref_frames, 2 if config.temporal_layers == 3 else 1
        )
        if config.transform8x8:
            from ..core.params import PROFILE_HIGH
            self.sps = SPS.for_size(
                config.width, config.height, profile_idc=PROFILE_HIGH,
                max_num_ref_frames=self._num_ref,
            )
            self.pps = PPS(entropy_coding_mode_flag=1,
                           transform_8x8_mode_flag=1)
        elif config.cabac:
            self.sps = SPS.for_size(
                config.width, config.height, profile_idc=PROFILE_MAIN,
                max_num_ref_frames=self._num_ref,
            )
            self.pps = PPS(entropy_coding_mode_flag=1)
        else:
            self.sps = SPS.for_size(
                config.width, config.height,
                max_num_ref_frames=self._num_ref,
            )
            self.pps = PPS()
        self.frame_num = 0
        self.idr_pic_id = 0
        self._force_idr = True
        self._dpb: List = []  # device-resident DPB (recon tuples, newest 1st)
        self._frame_in_gop = 0
        self.rc = RateController(config)
        self._entropy = (
            entropy_native if entropy_native.available() else entropy_pack
        )

    # -- reference API surface ------------------------------------------------

    def force_key_frame(self) -> None:
        """ForceIntraFrame(true) analog (openh264_wrapper.cpp:230-236).
        Unlike the reference's cross-worker no-op (SURVEY.md section 2,
        keyframe row), this is routed to the actual encoder owner."""
        self._force_idr = True

    def encode_frame(
        self, rgba: np.ndarray
    ) -> List[EncodedFrame]:
        """Encode RGBA input [S, H, W, 4] (or [H, W, 4]) -> one stream each."""
        t0 = time.perf_counter()
        if rgba.ndim == 3:
            rgba = rgba[None]
        rgba = _pad_multiple(np.ascontiguousarray(rgba), 16, axes=(1, 2))
        arr = jnp.asarray(rgba)
        t1 = time.perf_counter()
        y, u, v = color.rgba_to_yuv420(arr)
        return self._encode_common(y, u, v, copy_s=t1 - t0)

    def encode_frame_yuv(
        self,
        y: np.ndarray,
        u: np.ndarray,
        v: np.ndarray,
    ) -> List[EncodedFrame]:
        """Encode planar I420 input [S, H, W] (encode_frame_yuv_i420 analog)."""
        t0 = time.perf_counter()
        if y.ndim == 2:
            y, u, v = y[None], u[None], v[None]
        y = jnp.asarray(_pad_multiple(np.ascontiguousarray(y, np.uint8), 16))
        u = jnp.asarray(_pad_multiple(np.ascontiguousarray(u, np.uint8), 8))
        v = jnp.asarray(_pad_multiple(np.ascontiguousarray(v, np.uint8), 8))
        t1 = time.perf_counter()
        return self._encode_common(y, u, v, copy_s=t1 - t0)

    # -- internals ------------------------------------------------------------

    def _encode_common(self, y, u, v, copy_s: float) -> List[EncodedFrame]:
        cfg = self.config
        qp = self.rc.current_qp()
        idr = (
            self._force_idr
            or not self._dpb
            or (cfg.gop_size > 0 and self._frame_in_gop >= cfg.gop_size)
        )

        t0 = time.perf_counter()
        if idr:
            if cfg.slice_mode == "single":
                symbols, recon = wavefront.encode_iframe_single(
                    y, u, v, jnp.int32(qp)
                )
            else:
                symbols, recon = iframe.encode_iframe_scan(
                    y, u, v, jnp.int32(qp), intra44=cfg.intra44
                )
            if cfg.deblock:
                sh = symbols.mode.shape
                recon = kdeblock.deblock_frame_rows(
                    recon[0], recon[1], recon[2],
                    jnp.full(sh, 2, jnp.int32),
                    jnp.zeros(sh, jnp.int32), jnp.zeros(sh, jnp.int32),
                    jnp.zeros((*sh, 4, 4), jnp.int32), jnp.int32(qp),
                )
        else:
            k = self._frame_in_gop
            tl = cfg.temporal_layers
            nra = len(self._dpb)
            if tl == 3 and k % 4 == 0:
                force = min(1, nra - 1)  # T0 references the previous T0
            elif tl >= 2 or nra == 1:
                force = 0
            else:
                force = -1  # free per-MB reference search
            if force >= 0:
                ref = self._dpb[force]
                symbols, recon, motion = pframe.encode_pframe_rows_multi(
                    y, u, v, ref[0][None], ref[1][None], ref[2][None],
                    jnp.int32(qp), ref_base=force, t8=cfg.transform8x8,
                )
            else:
                stack = lambda i: jnp.stack([d[i] for d in self._dpb])
                symbols, recon, motion = pframe.encode_pframe_rows_multi(
                    y, u, v, stack(0), stack(1), stack(2), jnp.int32(qp),
                    t8=cfg.transform8x8,
                )
            if cfg.deblock:
                sh = symbols.kind.shape
                nnz = _deblock_nnz(symbols, cfg.transform8x8)
                recon = kdeblock.deblock_frame_rows(
                    recon[0], recon[1], recon[2],
                    symbols.kind, motion[0], motion[1], nnz, jnp.int32(qp),
                    refidx=symbols.refidx, t8=symbols.t8,
                )
        jax.block_until_ready(recon[0])
        t1 = time.perf_counter()

        s = int(y.shape[0])
        n = self.sps.mb_width * self.sps.mb_height
        frames = []
        t2 = time.perf_counter()
        if idr:
            mode = np.asarray(symbols.mode).reshape(s, n)
            cmode = np.asarray(symbols.cmode).reshape(s, n)
            cbp_l = np.asarray(symbols.cbp_luma).reshape(s, n)
            cbp_c = np.asarray(symbols.cbp_chroma).reshape(s, n)
            luma_dc = np.asarray(symbols.luma_dc).reshape(s, n, 16)
            luma_ac = np.asarray(symbols.luma_ac).reshape(s, n, 16, 16)
            chroma_dc = np.asarray(symbols.chroma_dc).reshape(s, n, 2, 4)
            chroma_ac = np.asarray(symbols.chroma_ac).reshape(s, n, 2, 4, 15)
            i4m = (
                np.asarray(symbols.i4modes).reshape(s, n, 16)
                if cfg.intra44 else None
            )
            for i in range(s):
                mb_info = np.ascontiguousarray(
                    np.stack([mode[i], cmode[i], cbp_l[i], cbp_c[i]], axis=1),
                    np.int32,
                )
                packer = (
                    cabac_pack.pack_iframe if cfg.cabac
                    else self._entropy.pack_iframe
                )
                stream = packer(
                    mb_info, luma_dc[i], luma_ac[i], chroma_dc[i], chroma_ac[i],
                    self.sps, self.pps, qp,
                    slice_mode=cfg.slice_mode, frame_num=0,
                    idr=True, include_ps=True,
                    deblock_idc=2 if cfg.deblock else 1,
                    i4modes=i4m[i] if i4m is not None else None,
                )
                frames.append(EncodedFrame(stream, True, self.frame_num, qp, {}))
            self._frame_in_gop = 1
        else:
            is_ref = cfg.temporal_layers == 1 or (self._frame_in_gop % 2 == 0)
            sy = symbols
            kind = np.asarray(sy.kind).reshape(s, n)
            mode = np.asarray(sy.mode).reshape(s, n)
            cmode = np.asarray(sy.cmode).reshape(s, n)
            cbp_l = np.asarray(sy.cbp_luma).reshape(s, n)
            cbp_c = np.asarray(sy.cbp_chroma).reshape(s, n)
            mvdx = np.asarray(sy.mvdx).reshape(s, n)
            mvdy = np.asarray(sy.mvdy).reshape(s, n)
            refid = np.asarray(sy.refidx).reshape(s, n)
            t8f = (np.asarray(sy.t8).reshape(s, n)
                   if cfg.transform8x8 else None)
            luma_dc = np.asarray(sy.luma_dc).reshape(s, n, 16)
            luma_ac = np.asarray(sy.luma_ac).reshape(s, n, 16, 16)
            chroma_dc = np.asarray(sy.chroma_dc).reshape(s, n, 2, 4)
            chroma_ac = np.asarray(sy.chroma_ac).reshape(s, n, 2, 4, 15)
            k = self._frame_in_gop
            fnum = (k if cfg.temporal_layers == 1 else (k + 1) // 2) % (
                1 << (self.sps.log2_max_frame_num_minus4 + 4)
            )
            for i in range(s):
                mb_info = np.zeros((n, 8), np.int32)
                mb_info[:, 0] = kind[i]
                mb_info[:, 1] = mode[i]
                mb_info[:, 2] = cmode[i]
                mb_info[:, 3] = cbp_l[i]
                mb_info[:, 4] = cbp_c[i]
                mb_info[:, 5] = mvdx[i]
                mb_info[:, 6] = mvdy[i]
                mb_info[:, 7] = refid[i]
                pack_p = (
                    cabac_pack.pack_pframe if cfg.cabac
                    else getattr(self._entropy, "pack_pframe",
                                 entropy_packp.pack_pframe)
                )
                extra = (
                    {"t8flags": t8f[i]} if t8f is not None else {}
                )
                stream = pack_p(
                    mb_info, luma_dc[i], luma_ac[i], chroma_dc[i], chroma_ac[i],
                    self.sps, self.pps, qp,
                    slice_mode=cfg.slice_mode, frame_num=fnum,
                    deblock_idc=2 if cfg.deblock else 1,
                    ref=is_ref, num_ref_active=nra, **extra,
                )
                frames.append(EncodedFrame(stream, False, self.frame_num, qp, {}))
            self._frame_in_gop += 1
        if idr:
            self._dpb = [recon]
        elif is_ref:
            self._dpb.insert(0, recon)
            del self._dpb[self._num_ref:]
        t3 = time.perf_counter()

        self.rc.update(sum(len(f.data) for f in frames) / max(s, 1))
        self._force_idr = False
        self.frame_num += 1
        timings = {
            "copy_ms": copy_s * 1e3,
            "encode_ms": (t1 - t0) * 1e3,
            "entropy_ms": (t3 - t2) * 1e3,
        }
        for f in frames:
            f.timings = timings
        self.recon = recon
        return frames
