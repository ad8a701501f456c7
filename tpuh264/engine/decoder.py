"""Decoder sessions and pool.

Mirrors the reference's decoder C ABI -- a pool of MAX_DECODERS=32 slots
with init_decoder/deinit_decoder per stream and per-frame
decode_frame_optimized / decode_frame_yuv_i420 entry points
(/root/reference/openh264_wrapper.cpp:8,240-280,391-464) -- with the
codec interior implemented here (host CAVLC parse -> TPU reconstruction)
instead of inside libopenh264.a.

Error concealment: on a corrupt or undecodable frame the session returns
its previous reconstruction (the ERROR_CON_FRAME_COPY analog,
openh264_wrapper.cpp:269) and raises its `needs_keyframe` flag -- which,
unlike the reference's latent no-op (SURVEY.md section 2, keyframe row),
callers can route to the actual encoder owner.
"""

from __future__ import annotations

import time
from typing import Dict, List, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..core import nal
from ..core.bitstream import BitReader
from ..core.params import PPS, SPS
from ..core.sliceheader import SLICE_P, SliceHeader
from ..entropy import cabac_pack
from ..entropy import native as entropy_native
from ..entropy import pack as entropy_pack
from ..entropy import packp as entropy_packp
from ..kernels import color, deblock as kdeblock, iframe, pframe, wavefront


def _count_slices(data: bytes) -> int:
    n = 0
    for _, ntype, _ in nal.split_annexb(data):
        if ntype in (nal.NAL_SLICE_IDR, nal.NAL_SLICE_NON_IDR):
            n += 1
    return n


class DecoderSession:
    def __init__(self) -> None:
        self._entropy = (
            entropy_native if entropy_native.available() else entropy_pack
        )
        self.last_frame: Optional[Tuple[np.ndarray, np.ndarray, np.ndarray]] = None
        self.needs_keyframe = False
        self.frames_decoded = 0
        self.frames_concealed = 0
        self._sps = None
        self._pps = None
        self._dpb = []  # device-resident reference planes, newest first
        self._idc = 1
        self._is_ref_frame = True
        self._nra = 1
        self._general = False   # syntax outside the TPU fast path seen
        self._gold = None       # golden.StreamDecoder fallback instance

    def decode(
        self, data: bytes
    ) -> Optional[Tuple[np.ndarray, np.ndarray, np.ndarray]]:
        """Decode one access unit -> (Y, U, V) int32 planes (cropped).

        Streams in our encoder's syntax subset ride the TPU fast path
        (host CAVLC parse -> batched device reconstruction).  GENERAL
        baseline streams -- third-party encoders emitting P partitions,
        sub-partitions, mb_qp_delta, I_PCM, multi-slice layouts (see
        tests/test_conformance_reverse.py) -- fall back to the golden
        StreamDecoder, which persists its own DPB; an unsupported AU
        mid-stream raises `needs_keyframe` so the owner forces an IDR
        and decoding resumes on the general path (the reference's
        request_keyframe recovery loop, app.js:493-496, with the
        routing actually wired).  Returns the concealed previous frame
        on error (or None), setting `needs_keyframe`.
        """
        if self._general:
            return self._decode_golden(data)
        try:
            is_p = self._classify(data)
            if is_p:
                out = self._decode_p(data)
            else:
                out = self._decode_i(data)
            self.last_frame = out
            self.needs_keyframe = False
            self.frames_decoded += 1
            return out
        except NotImplementedError:
            # syntax beyond the fast path: switch to the general decoder
            self._general = True
            return self._decode_golden(data)
        except RuntimeError:
            # ambiguous: general syntax OR a corrupt AU.  Try the golden
            # decoder once; only a SUCCESSFUL general decode flips the
            # session to the general path -- a transiently corrupt AU
            # conceals and stays on the fast path (advisor round-2:
            # don't let one bad AU permanently demote the session).
            out = self._decode_golden(data)
            if not self.needs_keyframe:
                self._general = True
            return out
        except Exception:
            self.needs_keyframe = True
            self.frames_concealed += 1
            return self.last_frame

    def _decode_golden(self, data: bytes):
        from ..golden import codec as gcodec

        try:
            if self._gold is None:
                self._gold = gcodec.StreamDecoder()
                # seed with the session's already-parsed parameter sets:
                # mid-stream fallback must not depend on the stream
                # re-sending SPS/PPS before the next IDR (advisor round-2)
                if self._sps is not None:
                    self._gold.sps = self._sps
                if self._pps is not None:
                    self._gold.pps = self._pps
                # seed the reference buffer from the fast path's DPB so
                # a mid-stream demotion (e.g. the MV-range guard) keeps
                # decoding the true pictures instead of concealing until
                # the next IDR (advisor r3: divert, don't corrupt)
                from ..golden import inter as ginter

                for (ry, ru, rv) in self._dpb:
                    ry_np = np.asarray(ry[0], np.int32)
                    self._gold.dpb.append((
                        ry_np,
                        np.asarray(ru[0], np.int32),
                        np.asarray(rv[0], np.int32),
                        ginter.build_halfpel_planes(ry_np),
                    ))
            out = self._gold.decode_au(data)
            if out is None:
                raise RuntimeError("no frame in access unit")
            out = tuple(np.asarray(p) for p in out)
            self.last_frame = out
            self.needs_keyframe = False
            self.frames_decoded += 1
            return out
        except Exception:
            self.needs_keyframe = True
            self.frames_concealed += 1
            return self.last_frame

    def _classify(self, data: bytes) -> bool:
        """Parse SPS/PPS and report whether the access unit is a P frame."""
        is_p = False
        for ridc, ntype, rbsp in nal.split_annexb(data):
            if ntype == nal.NAL_SPS:
                self._sps = SPS.parse(BitReader(rbsp))
            elif ntype == nal.NAL_PPS:
                self._pps = PPS.parse(BitReader(rbsp))
            elif ntype == nal.NAL_SLICE_NON_IDR:
                r = BitReader(rbsp)
                h = SliceHeader.parse(r, self._sps, self._pps, False,
                                      ref=ridc != 0)
                self._idc = h.disable_deblocking_filter_idc
                self._is_ref_frame = ridc != 0
                self._nra = h.num_ref_idx_l0_active_minus1 + 1
                if h.slice_type == SLICE_P:
                    is_p = True
            elif ntype == nal.NAL_SLICE_IDR and self._sps is not None:
                r = BitReader(rbsp)
                h = SliceHeader.parse(r, self._sps, self._pps, True)
                self._idc = h.disable_deblocking_filter_idc
        return is_p

    def _decode_i(self, data: bytes):
        cabac = self._pps is not None and self._pps.entropy_coding_mode_flag
        parser = (
            cabac_pack.parse_iframe if cabac else self._entropy.parse_iframe
        )
        (sps, pps, qp, mb_info, ldc, lac, cdc, cac, i4m) = parser(data)
        self._sps, self._pps = sps, pps
        r, c = sps.mb_height, sps.mb_width
        has_i4 = bool((mb_info[:, 0] == 4).any())
        symbols = iframe.MBSymbols(
            mode=jnp.asarray(mb_info[:, 0].reshape(1, r, c)),
            cmode=jnp.asarray(mb_info[:, 1].reshape(1, r, c)),
            cbp_luma=jnp.asarray(mb_info[:, 2].reshape(1, r, c)),
            cbp_chroma=jnp.asarray(mb_info[:, 3].reshape(1, r, c)),
            luma_dc=jnp.asarray(ldc.reshape(1, r, c, 16)),
            luma_ac=jnp.asarray(lac.reshape(1, r, c, 16, 16)),
            chroma_dc=jnp.asarray(cdc.reshape(1, r, c, 2, 4)),
            chroma_ac=jnp.asarray(cac.reshape(1, r, c, 2, 4, 15)),
            i4modes=jnp.asarray(i4m.reshape(1, r, c, 16)),
        )
        n_slices = _count_slices(data)
        if n_slices == 1 and r > 1:
            # single-slice stream: cross-row prediction -> wavefront
            if has_i4:
                raise NotImplementedError("I_NxN in single-slice streams")
            y, u, v = wavefront.decode_iframe_single(symbols, jnp.int32(qp))
        elif n_slices in (r, 1):
            y, u, v = iframe.decode_iframe_scan(symbols, jnp.int32(qp),
                                                intra44=has_i4)
        else:
            raise NotImplementedError(f"{n_slices} slices for {r} MB rows")
        if self._idc != 1:
            sh = symbols.mode.shape
            y, u, v = kdeblock.deblock_frame_rows(
                y, u, v, jnp.full(sh, 2, jnp.int32),
                jnp.zeros(sh, jnp.int32), jnp.zeros(sh, jnp.int32),
                jnp.zeros((*sh, 4, 4), jnp.int32), jnp.int32(qp),
            )
        self._dpb = [(y, u, v)]
        return (
            np.asarray(y[0])[: sps.height, : sps.width],
            np.asarray(u[0])[: sps.height // 2, : sps.width // 2],
            np.asarray(v[0])[: sps.height // 2, : sps.width // 2],
        )

    def _parse_p_symbols(self, data: bytes):
        """Entropy-parse a P access unit -> (symbols [1,R,C,...], qp)."""
        sps, pps = self._sps, self._pps
        qp = 26 + pps.pic_init_qp_minus26
        slices = []
        for ridc, ntype, rbsp in nal.split_annexb(data):
            if ntype == nal.NAL_SLICE_NON_IDR:
                r = BitReader(rbsp)
                h = SliceHeader.parse(r, sps, pps, False, ref=ridc != 0)
                qp = 26 + pps.pic_init_qp_minus26 + h.slice_qp_delta
                slices.append((rbsp, r.bit_position, h.first_mb_in_slice))
        nra = self._nra
        t8arr = None
        if pps.entropy_coding_mode_flag:
            (mb_info, ldc, lac, cdc, cac, t8arr) = (
                cabac_pack.parse_pframe_slices(
                    slices, sps, pps, qp=qp, nra=nra
                )
            )
        else:
            parse_p = getattr(self._entropy, "parse_pframe_slices",
                              entropy_packp.parse_pframe_slices)
            mb_info, ldc, lac, cdc, cac = parse_p(slices, sps, pps, nra)
        rr, cc = sps.mb_height, sps.mb_width
        # fast-path guards (advisor r3): the row-slice kernel assumes
        # one slice per MB row (the left-only degenerate MV predictor);
        # a single-slice multi-row stream would resolve MVs wrongly --
        # divert it to the golden StreamDecoder instead
        if len(slices) != rr and rr != 1:
            raise NotImplementedError(
                f"{len(slices)} P slices for {rr} MB rows"
            )
        # resolve the row-chain MVs and bound-check them against the
        # kernel's static window range: a conformant third-party stream
        # may carry MVs beyond the own-encoder bound (x264 default ME
        # range is 16 pel), and the masked-shift window extraction
        # would silently predict from a zero block
        kind_a = mb_info[:, 0].reshape(rr, cc)
        mvdx_a = mb_info[:, 5].reshape(rr, cc).astype(np.int64)
        mvdy_a = mb_info[:, 6].reshape(rr, cc).astype(np.int64)
        mvx = np.zeros(rr, np.int64)
        mvy = np.zeros(rr, np.int64)
        lo, hi = 4 * -10, 4 * 9 + 3  # _extract_w2 lo/hi int offsets
        for c0 in range(cc):
            inter = kind_a[:, c0] == 1
            mvx = np.where(inter, mvx + mvdx_a[:, c0], 0)
            mvy = np.where(inter, mvy + mvdy_a[:, c0], 0)
            if (mvx.min() < lo or mvx.max() > hi
                    or mvy.min() < lo or mvy.max() > hi):
                raise NotImplementedError(
                    "MV beyond the fast-path window range"
                )
        symbols = pframe.MBSymbolsP(
            kind=mb_info[:, 0].reshape(1, rr, cc),
            mode=mb_info[:, 1].reshape(1, rr, cc),
            cmode=mb_info[:, 2].reshape(1, rr, cc),
            cbp_luma=mb_info[:, 3].reshape(1, rr, cc),
            cbp_chroma=mb_info[:, 4].reshape(1, rr, cc),
            mvdx=mb_info[:, 5].reshape(1, rr, cc),
            mvdy=mb_info[:, 6].reshape(1, rr, cc),
            luma_dc=ldc.reshape(1, rr, cc, 16),
            luma_ac=lac.reshape(1, rr, cc, 16, 16),
            chroma_dc=cdc.reshape(1, rr, cc, 2, 4),
            chroma_ac=cac.reshape(1, rr, cc, 2, 4, 15),
            refidx=mb_info[:, 7].reshape(1, rr, cc),
            t8=(t8arr.reshape(1, rr, cc) if t8arr is not None
                else np.zeros((1, rr, cc), np.int32)),
        )
        return symbols, qp

    def _decode_p(self, data: bytes):
        assert self._dpb, "P frame before any reference"
        sps, pps = self._sps, self._pps
        symbols, qp = self._parse_p_symbols(data)
        nra = self._nra
        has_t8 = pps.transform_8x8_mode_flag == 1
        dpb = self._dpb[:max(nra, 1)]
        (y, u, v), motion = pframe.decode_pframe_rows_multi(
            symbols,
            jnp.stack([d[0][0] for d in dpb])[:, None],
            jnp.stack([d[1][0] for d in dpb])[:, None],
            jnp.stack([d[2][0] for d in dpb])[:, None],
            jnp.int32(qp), t8=has_t8,
        )
        if self._idc != 1:
            from .encoder import _deblock_nnz
            sym_j = symbols._replace(
                kind=jnp.asarray(symbols.kind),
                luma_ac=jnp.asarray(symbols.luma_ac),
                t8=jnp.asarray(symbols.t8),
            )
            nnz = _deblock_nnz(sym_j, has_t8)
            y, u, v = kdeblock.deblock_frame_rows(
                y, u, v, sym_j.kind, motion[0], motion[1],
                nnz, jnp.int32(qp),
                refidx=jnp.asarray(symbols.refidx), t8=sym_j.t8,
            )
        if self._is_ref_frame:
            self._dpb.insert(0, (y, u, v))
            max_ref = max(1, self._sps.max_num_ref_frames)
            del self._dpb[max_ref:]
        return (
            np.asarray(y[0])[: sps.height, : sps.width],
            np.asarray(u[0])[: sps.height // 2, : sps.width // 2],
            np.asarray(v[0])[: sps.height // 2, : sps.width // 2],
        )

    def decode_to_rgba(self, data: bytes) -> Optional[np.ndarray]:
        """decode_frame_optimized analog: decode + YUV->RGBA conversion."""
        out = self.decode(data)
        if out is None:
            return None
        y, u, v = out
        return np.asarray(color.yuv420_to_rgba(
            jnp.asarray(y), jnp.asarray(u), jnp.asarray(v)
        ))


class DecoderPool:
    """MAX_DECODERS-slot pool (openh264_wrapper.cpp:8,240-280)."""

    def __init__(self, max_decoders: int = 32):
        self.max_decoders = max_decoders
        self._slots: Dict[int, DecoderSession] = {}

    def init_decoder(self, idx: int) -> None:
        if not 0 <= idx < self.max_decoders:
            raise IndexError(f"decoder index {idx} out of range")
        self._slots[idx] = DecoderSession()

    def deinit_decoder(self, idx: int) -> None:
        self._slots.pop(idx, None)

    def __getitem__(self, idx: int) -> DecoderSession:
        return self._slots[idx]

    def active(self) -> List[int]:
        return sorted(self._slots)

    def decode(self, idx: int, data: bytes):
        return self._slots[idx].decode(data)

    def decode_batch(
        self, items: List[Tuple[int, bytes]]
    ) -> Dict[int, Optional[Tuple[np.ndarray, np.ndarray, np.ndarray]]]:
        """Decode several streams' frames with one batched TPU call.

        Streams whose SPS dims match are stacked into a single
        reconstruction batch -- the TPU-native analog of the reference
        distributing streams over decoder workers (app.js:351,521),
        except the batch IS the parallelism.  Both I and P access units
        batch: an IPPP fan-out decodes as ONE device reconstruction per
        tick with the sessions' DPB heads stacked on the stream axis
        (the reference's core scaling story, N decoder workers in
        parallel).  Anything outside the row-sliced CAVLC subset --
        CABAC, multi-ref, 8x8 transform, general third-party syntax --
        falls back to per-session decode.
        """
        entropy = (
            entropy_native if entropy_native.available() else entropy_pack
        )
        results: Dict[
            int, Optional[Tuple[np.ndarray, np.ndarray, np.ndarray]]
        ] = {}
        i_items: list = []
        p_items: list = []
        for idx, data in items:
            sess = self._slots[idx]
            handled = False
            if not sess._general:
                try:
                    is_p = sess._classify(data)
                    pps = sess._pps
                    cabac = (
                        pps is not None and pps.entropy_coding_mode_flag
                    )
                    if (is_p and not cabac and sess._dpb
                            and sess._nra == 1
                            and pps.transform_8x8_mode_flag == 0):
                        symbols, qp = sess._parse_p_symbols(data)
                        p_items.append((idx, sess, symbols, qp))
                        handled = True
                    elif not is_p and not cabac and sess._idc == 1:
                        p = entropy.parse_iframe(data)
                        sps = p[0]
                        if (_count_slices(data) == sps.mb_height
                                or sps.mb_height == 1):
                            i_items.append((idx, sess, p))
                            handled = True
                except Exception:
                    handled = False
            if not handled:
                results[idx] = sess.decode(data)

        self._decode_batch_i(i_items, results)
        self._decode_batch_p(p_items, results)
        return results

    def _decode_batch_i(self, i_items, results) -> None:
        """Batched reconstruction of row-sliced CAVLC I frames."""
        groups: Dict[Tuple[int, int, int], list] = {}
        for item in i_items:
            sps, pps, qp = item[2][:3]
            groups.setdefault(
                (sps.mb_height, sps.mb_width, qp), []
            ).append(item)
        for (r, c, qp), group in groups.items():
            n = r * c
            stack = lambda k, shape: jnp.asarray(
                np.stack([g[2][k].reshape(*shape) for g in group])
            )
            mb = np.stack([g[2][3] for g in group])  # [B, N, 4]
            has_i4 = bool((mb[:, :, 0] == 4).any())
            symbols = iframe.MBSymbols(
                mode=jnp.asarray(mb[:, :, 0].reshape(-1, r, c)),
                cmode=jnp.asarray(mb[:, :, 1].reshape(-1, r, c)),
                cbp_luma=jnp.asarray(mb[:, :, 2].reshape(-1, r, c)),
                cbp_chroma=jnp.asarray(mb[:, :, 3].reshape(-1, r, c)),
                luma_dc=stack(4, (r, c, 16)),
                luma_ac=stack(5, (r, c, 16, 16)),
                chroma_dc=stack(6, (r, c, 2, 4)),
                chroma_ac=stack(7, (r, c, 2, 4, 15)),
                i4modes=stack(8, (r, c, 16)),
            )
            dy, du, dv = iframe.decode_iframe_scan(symbols, jnp.int32(qp),
                                                   intra44=has_i4)
            y, u, v = np.asarray(dy), np.asarray(du), np.asarray(dv)
            for i, (idx, sess, p) in enumerate(group):
                sps = p[0]
                out = (
                    y[i][: sps.height, : sps.width],
                    u[i][: sps.height // 2, : sps.width // 2],
                    v[i][: sps.height // 2, : sps.width // 2],
                )
                sess.last_frame = out
                sess.needs_keyframe = False
                sess.frames_decoded += 1
                # keep per-session state current so a following P frame
                # can reference this reconstruction
                sess._sps, sess._pps = p[0], p[1]
                sess._dpb = [(dy[i : i + 1], du[i : i + 1], dv[i : i + 1])]
                results[idx] = out

    def _decode_batch_p(self, p_items, results) -> None:
        """Batched reconstruction of row-sliced CAVLC P frames: one
        decode_pframe_rows_multi + deblock call per (size, qp, idc)
        group, sessions' DPB heads stacked on the stream axis."""
        groups: Dict[Tuple[int, int, int, int], list] = {}
        for item in p_items:
            idx, sess, symbols, qp = item
            r, c = symbols.kind.shape[1:]
            groups.setdefault((r, c, qp, sess._idc), []).append(item)
        for (r, c, qp, idc), group in groups.items():
            fields = {}
            for name in pframe.MBSymbolsP._fields:
                fields[name] = jnp.asarray(np.concatenate(
                    [np.asarray(getattr(g[2], name)) for g in group], axis=0
                ))
            symbols = pframe.MBSymbolsP(**fields)
            refs_y = jnp.concatenate(
                [g[1]._dpb[0][0] for g in group], axis=0
            )[None]
            refs_u = jnp.concatenate(
                [g[1]._dpb[0][1] for g in group], axis=0
            )[None]
            refs_v = jnp.concatenate(
                [g[1]._dpb[0][2] for g in group], axis=0
            )[None]
            (y, u, v), motion = pframe.decode_pframe_rows_multi(
                symbols, refs_y, refs_u, refs_v, jnp.int32(qp)
            )
            if idc != 1:
                from .encoder import _deblock_nnz

                nnz = _deblock_nnz(symbols, False)
                y, u, v = kdeblock.deblock_frame_rows(
                    y, u, v, symbols.kind, motion[0], motion[1],
                    nnz, jnp.int32(qp),
                    refidx=symbols.refidx, t8=symbols.t8,
                )
            for i, (idx, sess, _, _) in enumerate(group):
                sps = sess._sps
                out = (
                    np.asarray(y[i])[: sps.height, : sps.width],
                    np.asarray(u[i])[: sps.height // 2, : sps.width // 2],
                    np.asarray(v[i])[: sps.height // 2, : sps.width // 2],
                )
                sess.last_frame = out
                sess.needs_keyframe = False
                sess.frames_decoded += 1
                if sess._is_ref_frame:
                    sess._dpb.insert(
                        0, (y[i : i + 1], u[i : i + 1], v[i : i + 1])
                    )
                    max_ref = max(1, sess._sps.max_num_ref_frames)
                    del sess._dpb[max_ref:]
                results[idx] = out
