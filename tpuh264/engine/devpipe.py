"""Device-resident pipeline: the zero-copy transport expressed TPU-natively.

The reference's SharedArrayBuffer ring exists to avoid copying encoded
frames between workers (SURVEY.md L4).  On TPU, the analog is keeping the
codec state in HBM -- and, just as important on tunneled/PCIe hosts,
issuing the whole per-frame pipeline as ONE device program: source,
encode scan, on-device CAVLC bit assembly, N-stream fan-out decode, and
quality accounting all fuse into a single dispatch.  Per frame the host
link carries exactly two transfers: a small metadata vector and the
actual slice payload bytes.
"""

from __future__ import annotations

import functools
import time
from typing import Dict, Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..core import nal
from ..core.bitstream import BitWriter
from ..core.params import PPS, SPS
from ..entropy import device_pack
from ..entropy import native as entropy_native
from ..entropy import pack as entropy_pack
from ..entropy import packp as entropy_packp
from ..entropy.device_pack import SLICE_P
from ..kernels import deblock as kdeblock
from ..kernels import entropy_tpu, iframe, pframe
from .config import CodecConfig
from .ratecontrol import RateController
from . import sources
from .metrics import StatsWindow


class DevicePipeline:
    """encode -> wire bitstream -> N-stream fan-out decode, one dispatch."""

    def __init__(self, config: Optional[CodecConfig] = None,
                 source_kind: str = "moving_gradient", **kw):
        if config is None:
            config = CodecConfig(**kw)
        self.config = config
        self.source_kind = source_kind
        self.w16 = (config.width + 15) // 16 * 16
        self.h16 = (config.height + 15) // 16 * 16
        self.sps = SPS.for_size(config.width, config.height)
        self.pps = PPS()
        self.stats = StatsWindow()
        self.frame_index = 0
        self._entropy = (
            entropy_native if entropy_native.available() else entropy_pack
        )
        self.last_stream: bytes = b""
        self.last_psnr_y: float = 0.0
        self.fallback_packs = 0  # dispatches repacked on host (overflow)
        self._step = self._build_step()
        self._hdr = None

    # fixed per-slice wire budget (32-bit words).  Slices above this
    # fall back to the full-slab download; at the bench operating point
    # (1080p qp32, ~1.6 KB/slice) the budget holds with 2.5x headroom.
    BUCKET_W = 1024
    # frames encoded per device dispatch: the tunneled host link charges
    # per round trip, so dispatch/retire latency is amortized over a
    # small GOP batch (the TPU analog of the reference's triple-buffered
    # readback pipeline, app.js:65,528-588 -- deeper, because the link
    # here is an RPC tunnel rather than PCIe)
    FRAMES_PER_DISPATCH = 4

    def _build_step(self):
        streams = self.config.streams
        k = self.FRAMES_PER_DISPATCH
        source = sources._device_source_frames(
            self.w16, self.h16, k, self.source_kind
        )
        bucket = self.BUCKET_W

        @jax.jit
        def step(t, qp, hdr_hw, hdr_len):
            y, u, v = source(t)  # [K, H, W]: K consecutive frames
            symbols, recon = iframe.encode_iframe_rows(y, u, v, qp)
            slice_hw, slice_bytes, ovf = (
                entropy_tpu.encode_bits_iframe(symbols, qp, hdr_hw, hdr_len)
            )
            tiled = iframe.MBSymbols(
                *(jnp.repeat(x, streams, axis=0) for x in symbols)
            )
            dy, du, dv = iframe.decode_iframe_rows(tiled, qp)
            d = dy.astype(jnp.float32) - jnp.repeat(
                y.astype(jnp.float32), streams, axis=0
            )
            sse = d.reshape(k * streams, -1)
            sse = jnp.sum(sse * sse, axis=-1)  # [K*streams]
            # ---- single wire buffer: ONE host transfer per dispatch ----
            # [entropy_ovf | slice_bytes (K*R) | sse bits (K*streams) |
            #  slabs].  Bucket overflow is host-detected from slice_bytes;
            # wire[0] flags only device-entropy (MB/slice cap) overflow,
            # which routes to the host-packer fallback.
            slab = slice_hw[..., :bucket]
            wire = jnp.concatenate(
                [
                    ovf.astype(jnp.int32).reshape(1),
                    slice_bytes.reshape(-1),
                    jax.lax.bitcast_convert_type(
                        sse.astype(jnp.float32), jnp.int32
                    ).reshape(-1),
                    slab.reshape(-1),
                ]
            )
            return symbols, slice_hw, wire

        return step

    def pump_frame(self, emit_bitstream: bool = True) -> None:
        """Encode/decode one dispatch (FRAMES_PER_DISPATCH frames)."""
        cfg = self.config
        qp = cfg.qp if cfg.qp is not None else 32
        k = self.FRAMES_PER_DISPATCH
        t_in = time.perf_counter()
        for _ in range(k):
            self.stats.on_input()
        handles = self._dispatch(qp, count_input=False)
        t_tpu = time.perf_counter()
        nbytes = 0
        if emit_bitstream:
            sse = self._consume(handles, qp)
            nbytes = len(self.last_stream)
        else:
            wire = np.asarray(handles[2])
            sse = wire[1 + k * (self.h16 // 16) :][: k * cfg.streams].view(
                np.float32
            )
        t_done = time.perf_counter()

        mse = float(sse[0]) / (self.w16 * self.h16)
        self.last_psnr_y = 99.0 if mse == 0 else 10 * np.log10(255.0**2 / mse)
        self.stats.on_encode(
            k, (t_tpu - t_in) * 1e3, 0.0, (t_done - t_tpu) * 1e3, nbytes
        )
        self.stats.on_decode(k * cfg.streams, (t_tpu - t_in) * 1e3)

    def _consume(self, handles, qp: int) -> np.ndarray:
        """Retire one dispatch (K frames): ONE wire-buffer download, then
        NAL framing.  Bucket overflow falls back to the full payload
        slab; device-entropy overflow (MB/slice bit caps, e.g. QP-0
        noise) falls back to the host packer run on the downloaded
        symbol tensors -- correctness is preserved for any content.
        Returns the [K*streams] SSE vector."""
        symbols, slice_hw, wire_dev = handles
        wire = np.asarray(wire_dev)  # the single host transfer
        r = self.h16 // 16
        k = self.FRAMES_PER_DISPATCH
        streams = self.config.streams
        sbytes = wire[1 : 1 + k * r].reshape(k, r)
        sse = wire[1 + k * r : 1 + k * r + k * streams].view(np.float32)
        if wire[0]:  # device entropy overflow: repack on host
            self._host_pack_i(symbols, qp)
            return sse
        if int(sbytes.max()) > 4 * self.BUCKET_W:
            self._assemble(slice_hw, sbytes)  # bucket overflow: full slab
            return sse
        slab = wire[1 + k * r + k * streams :].reshape(k, r, self.BUCKET_W)
        self.frame_streams = []
        for f in range(k):
            self._frame_nals(
                [slab[f, i].view(np.uint32).astype(">u4")
                 .tobytes()[: int(sbytes[f, i])] for i in range(r)]
            )
            self.frame_streams.append(self.last_stream)
        return sse

    def _dispatch(self, qp: int, count_input: bool = True):
        """Issue one frame's device program without synchronizing."""
        if self._hdr is None:
            self._hdr = device_pack.slice_headers_device(
                self.sps, self.pps, qp, 0, True, self.FRAMES_PER_DISPATCH
            )
        hdr_hw, hdr_len = self._hdr
        out = self._step(
            jnp.int32(self.frame_index), jnp.int32(qp), hdr_hw, hdr_len
        )
        self.frame_index += self.FRAMES_PER_DISPATCH
        if count_input:
            for _ in range(self.FRAMES_PER_DISPATCH):
                self.stats.on_input()
        return out

    def _frame_nals(self, rbsps) -> None:
        """SPS/PPS + per-slice NAL framing of raw RBSP payloads."""
        esc = (
            entropy_native.escape_rbsp
            if entropy_native.available()
            else nal.escape_rbsp
        )
        w = BitWriter()
        self.sps.write(w)
        out = bytearray(nal.wrap_nal(nal.NAL_SPS, w.get_bytes()))
        w = BitWriter()
        self.pps.write(w)
        out += nal.wrap_nal(nal.NAL_PPS, w.get_bytes())
        hdr_byte = bytes([(3 << 5) | nal.NAL_SLICE_IDR])
        for rbsp in rbsps:
            out += nal.START_CODE + hdr_byte + esc(rbsp)
        self.last_stream = bytes(out)

    def _assemble(self, slice_hw, sbytes) -> None:
        """Fallback: download the full per-slice payload slab (bucketed
        by the fattest slice) and frame NALs."""
        r = self.h16 // 16
        n_cols = min(
            slice_hw.shape[-1],
            -(-((int(sbytes.max()) + 3) // 4) // 512) * 512,
        )
        slab = np.asarray(
            slice_hw[:, :, :n_cols]
        ).view(np.uint32).astype(">u4")
        sb = sbytes.reshape(slab.shape[0], r)
        self.frame_streams = []
        for f in range(slab.shape[0]):
            self._frame_nals(
                [slab[f, i].tobytes()[: int(sb[f, i])] for i in range(r)]
            )
            self.frame_streams.append(self.last_stream)

    def _host_pack_i(self, symbols, qp: int) -> None:
        """Device-entropy overflow fallback: download the symbol tensors
        and run the host CAVLC packer (the path the engine sessions use),
        preserving a conformant stream for adversarial content (the claim
        in kernels/entropy_tpu.py:20-22)."""
        self.fallback_packs += 1
        k = self.FRAMES_PER_DISPATCH
        n = (self.h16 // 16) * (self.w16 // 16)
        mode = np.asarray(symbols.mode).reshape(k, n)
        cmode = np.asarray(symbols.cmode).reshape(k, n)
        cbp_l = np.asarray(symbols.cbp_luma).reshape(k, n)
        cbp_c = np.asarray(symbols.cbp_chroma).reshape(k, n)
        luma_dc = np.asarray(symbols.luma_dc).reshape(k, n, 16)
        luma_ac = np.asarray(symbols.luma_ac).reshape(k, n, 16, 16)
        chroma_dc = np.asarray(symbols.chroma_dc).reshape(k, n, 2, 4)
        chroma_ac = np.asarray(symbols.chroma_ac).reshape(k, n, 2, 4, 15)
        self.frame_streams = []
        for f in range(k):
            mb_info = np.ascontiguousarray(
                np.stack([mode[f], cmode[f], cbp_l[f], cbp_c[f]], axis=1),
                np.int32,
            )
            self.last_stream = self._entropy.pack_iframe(
                mb_info, luma_dc[f], luma_ac[f], chroma_dc[f], chroma_ac[f],
                self.sps, self.pps, qp,
                slice_mode="rows", frame_num=0, idr=True, include_ps=True,
                deblock_idc=1,
            )
            self.frame_streams.append(self.last_stream)

    def _retire(self, handles, qp: int) -> None:
        """Consume one dispatch (K frames) and update stats."""
        k = self.FRAMES_PER_DISPATCH
        sse = self._consume(handles, qp)
        mse = float(sse[0]) / (self.w16 * self.h16)
        self.last_psnr_y = 99.0 if mse == 0 else 10 * np.log10(255.0**2 / mse)
        self.stats.on_encode(k, 0.0, 0.0, 0.0, len(self.last_stream))
        self.stats.on_decode(k * self.config.streams, 0.0)

    def run(self, duration_s: float = 5.0, warmup: int = 3) -> Dict[str, float]:
        """Measurement loop with one-frame-deep software pipelining: the
        host retires frame t (metadata sync, payload download, escaping,
        NAL framing) while the device executes frame t+1 -- the TPU
        expression of the reference's triple-buffered readback
        (app.js:528-588)."""
        qp = self.config.qp if self.config.qp is not None else 32
        for _ in range(warmup):
            self.pump_frame()
        self.stats.snapshot(self.config.streams)
        n = 0
        t0 = time.perf_counter()
        deadline = t0 + duration_s
        pending = None
        while time.perf_counter() < deadline:
            handles = self._dispatch(qp)
            if pending is not None:
                self._retire(pending, qp)
                n += self.FRAMES_PER_DISPATCH
            pending = handles
        if pending is not None:
            self._retire(pending, qp)
            n += self.FRAMES_PER_DISPATCH
        wall = time.perf_counter() - t0
        snap = self.stats.snapshot(self.config.streams)
        snap["frames"] = n
        snap["pipeline_fps"] = n / wall
        snap["frames_per_s_aggregate"] = n * self.config.streams / wall
        snap["psnr_y"] = self.last_psnr_y
        snap["stream_bytes"] = len(self.last_stream)
        return snap


def _deblock_i(recon, sh, qp):
    """In-loop deblock of an all-intra frame (engine/encoder.py IDR path)."""
    return kdeblock.deblock_frame_rows(
        recon[0], recon[1], recon[2],
        jnp.full(sh, 2, jnp.int32),
        jnp.zeros(sh, jnp.int32), jnp.zeros(sh, jnp.int32),
        jnp.zeros((*sh, 4, 4), jnp.int32), qp,
    )


def _deblock_p(recon, sym, motion, qp):
    from .encoder import _deblock_nnz

    nnz = _deblock_nnz(sym, False)
    return kdeblock.deblock_frame_rows(
        recon[0], recon[1], recon[2], sym.kind,
        motion[0], motion[1], nnz, qp,
        refidx=sym.refidx, t8=sym.t8,
    )


class GOPDevicePipeline:
    """IPPP multi-stream RTC pipeline with decode-from-bits.

    The reference's scaling axis is independent streams over a worker
    pool (app.js:430-526); here S streams ride the leading batch axis of
    every kernel.  Each dispatch advances all S streams by
    FRAMES_PER_DISPATCH GOP positions: an IDR (GOP start) or P frame per
    position, with quarter-pel ME/MC against the previous deblocked
    reconstruction.  The DPB -- both the encoder's reference chain and
    the decoder's -- lives in HBM across dispatches (device handles are
    re-fed, never downloaded): the TPU form of the reference's
    SharedArrayBuffer zero-copy transport (SURVEY.md L4).  Entropy runs
    on device (Pallas CAVLC on TPU), so per dispatch the host link
    carries one wire buffer of payload bytes + metadata.

    The decode half is real, end to end: the annex-B bytes leaving the
    wire are entropy-decoded by the native threaded CAVLC front end
    (native/cavlc.cpp th264_parse_dispatch_compact: start-code scan, NAL
    unwrap, emulation-prevention removal, slice headers, CAVLC slice
    data), and the TPU reconstructs from those PARSED symbols on an
    independent decoder DPB chain -- the same work the reference's
    decoder workers do per frame (decoder_worker.js:154-189 feeding
    DecodeFrameNoDelay, openh264_wrapper.cpp:391-422).  Decode lags
    encode by one dispatch so the host parse and both link directions
    overlap device compute (the reference's pipelined-readback idea,
    app.js:528-588, applied to the decode side).
    """

    BUCKET_W = 1024
    FRAMES_PER_DISPATCH = 4

    def __init__(self, config: Optional[CodecConfig] = None,
                 gop_size: int = 16, source_kind: str = "moving_gradient",
                 fanout: int = 1, **kw):
        """source_kind "host": frames are fed by pump_host_frames --
        the reference's real topology, where camera pixels are COPIED
        into the codec's memory and that copy is a first-class metric
        (encoder_worker.js:112-120, the 4.80 ms row of its screenshot).
        `fanout` N decodes every encoded stream N times (the reference's
        1-encoder -> N-decoder fan-out, app.js:339-359): parsed records
        are replicated per decode stream and the decoder DPB chain runs
        S*N streams wide."""
        if config is None:
            config = CodecConfig(**kw)
        self.config = config
        self.source_kind = source_kind
        self.fanout = max(1, fanout)
        self.s_dec = config.streams * self.fanout
        self._entropy = (
            entropy_native if entropy_native.available() else entropy_pack
        )
        k = self.FRAMES_PER_DISPATCH
        if gop_size % k:
            raise ValueError("gop_size must be a multiple of "
                             f"FRAMES_PER_DISPATCH={k}")
        self.gop_dispatches = gop_size // k
        self.n_refs = max(1, config.num_ref_frames)
        if self.n_refs > k:
            # ref_idx validity: frame f of an interior dispatch has
            # exactly its f prior frames plus the k of the previous
            # dispatch in any conformant decoder's DPB
            raise ValueError(
                f"num_ref_frames {self.n_refs} > FRAMES_PER_DISPATCH {k}"
            )
        self.w16 = (config.width + 15) // 16 * 16
        self.h16 = (config.height + 15) // 16 * 16
        self.sps = SPS.for_size(config.width, config.height)
        if self.n_refs > 1:
            self.sps.max_num_ref_frames = self.n_refs
        if gop_size > (1 << (self.sps.log2_max_frame_num_minus4 + 4)):
            raise ValueError("gop_size exceeds max_frame_num")
        self.pps = PPS()
        self.stats = StatsWindow()
        self.dispatch_index = 0
        # GOP phase decoupled from the time axis so a live pipeline can
        # force an IDR (stream recovery / checkpoint, SURVEY.md section 5)
        # and drop capture frames (backpressure) without disturbing the
        # other: _gop_pos drives frame_num/IDR cadence, time_offset
        # advances the source clock past dropped frames.
        self._gop_pos = 0
        self.time_offset = 0
        self.last_stream: bytes = b""
        self.frame_streams: list = []
        self.last_psnr_y: float = 0.0
        self.fallback_packs = 0  # dispatches repacked on host (overflow)
        self.qp_mismatches = 0   # slice-header QP != pipeline QP (stats)
        # compiled encode-step cache keyed by (gop-start, payload
        # budgets); budgets grow on overflow, and SHRINK back when a
        # window of dispatches underuses them -- the wire d2h cost is
        # budget-sized, not content-sized, so a budget left fat by a
        # transient (e.g. the rate controller settling) would tax every
        # later dispatch.  Every budget value's step compiles once and
        # stays cached.
        self._step_cache = {}
        self._payload_w = {True: [1 << 17, 1 << 17], False: [0, 1 << 17]}
        self._payload_hist = {True: [], False: []}
        self._dec_step = self._build_decode()
        s = config.streams
        zero = lambda ss, h, w: jnp.zeros(
            (self.n_refs, ss, h, w), jnp.int32
        )
        self._dpb_enc = (zero(s, self.h16, self.w16),
                         zero(s, self.h16 // 2, self.w16 // 2),
                         zero(s, self.h16 // 2, self.w16 // 2))
        self._dpb_dec = (
            self._dpb_enc if self.s_dec == s
            else (zero(self.s_dec, self.h16, self.w16),
                  zero(self.s_dec, self.h16 // 2, self.w16 // 2),
                  zero(self.s_dec, self.h16 // 2, self.w16 // 2))
        )
        self._host_frames = None  # pending [K][3] host YUV (host mode)
        self.last_copy_ms = 0.0
        self._sse_dev = None  # decode-side SSE handle (device)
        self._dec_frames = 0
        # sticky record caps, PER GOP PHASE (start dispatches carry the
        # all-intra I-frame records, ~8x the interior P records): caps
        # are monotonic within a phase so the decode-step jit variants
        # stabilize after one GOP cycle, while interior dispatches keep
        # their small upload tier (the 80 MB/s link is the budget)
        self._caps = {True: [4096, 16384], False: [4096, 16384]}
        self._caps_hist = {True: [], False: []}
        # CBR rate control (the reference's RC_BITRATE_MODE analog,
        # openh264_wrapper.cpp:211-214): active when config.qp is None;
        # QP is a traced scalar in every kernel, so stepping it costs no
        # recompiles.  Each dispatch is encoded at one QP which travels
        # with the dispatch handles (decode parses it back from the
        # slice headers).
        self.rc = RateController(config)
        # freeze_shapes: stop ADAPTING payload budgets / record caps
        # (each new bucket value compiles a new jit variant -- fine
        # while warming, catastrophic inside a measurement window or a
        # live session's steady state: a 480p x8 compile is ~60 s).
        # Frozen overflow still decodes correctly via the slab/host
        # fallbacks; only the adaptation is paused.
        self.freeze_shapes = False
        self.stage_ms = {"wire": 0.0, "dev_wait": 0.0, "d2h": 0.0,
                         "parse": 0.0, "dec_dispatch": 0.0,
                         "enc_dispatch": 0.0, "n": 0}

    # -- headers ---------------------------------------------------------

    def _headers(self, pos: int, qp: int):
        """Device slice-header strings for GOP position `pos` (dispatch
        index within the GOP): (hdr_i or None, hdr_p stacked P-major)."""
        k = self.FRAMES_PER_DISPATCH
        s = self.config.streams
        hdr_i = None
        if pos == 0:
            hdr_i = device_pack.slice_headers_device(
                self.sps, self.pps, qp, 0, True, s, deblock_idc=2,
            )
        first = pos * k + (1 if pos == 0 else 0)
        nra = 1 if pos == 0 else self.n_refs
        per = [
            device_pack.slice_headers_device(
                self.sps, self.pps, qp, fn, False, s,
                slice_type=SLICE_P, deblock_idc=2, num_ref_active=nra,
            )
            for fn in range(first, pos * k + k)
        ]
        hdr_p = (jnp.concatenate([p[0] for p in per], 0),
                 jnp.concatenate([p[1] for p in per], 0))
        return hdr_i, hdr_p

    # -- fused device step ----------------------------------------------

    def _build_step(self, start: bool, budget_i: int, budget_p: int):
        k = self.FRAMES_PER_DISPATCH
        streams = self.config.streams
        host = self.source_kind == "host"
        source = None if host else sources._device_source_gop(
            self.w16, self.h16, k, streams, self.source_kind
        )
        n_p = k - 1 if start else k

        def compact(hw, nbytes, budget):
            """Pack the used words of every slice contiguously (word
            granularity, slice order) into a fixed `budget`-word
            payload: the wire carries ~the content's size instead of
            L x SLICE_W slabs -- the d2h direction of the tunneled link
            is the scarcest resource in this pipeline."""
            L = hw.shape[0] * hw.shape[1]
            W = hw.shape[2]
            flat = hw.reshape(L, W)
            wc = (nbytes.reshape(-1).astype(jnp.int32) + 3) // 4
            offs = jnp.concatenate(
                [jnp.zeros(1, jnp.int32), jnp.cumsum(wc)]
            )
            j = jnp.arange(budget, dtype=jnp.int32)
            sl = jnp.clip(
                jnp.searchsorted(offs, j, side="right") - 1, 0, L - 1
            )
            col = jnp.clip(j - offs[sl], 0, W - 1)
            vals = flat[sl, col]
            return jnp.where(j < offs[-1], vals, 0)

        n_refs = self.n_refs
        # the dispatch right after an IDR caps ref_idx at the refs that
        # actually exist in a conformant decoder's DPB (1 after the IDR);
        # interior dispatches use the full depth (n_refs <= k guarantees
        # every signaled index maps to a real prior frame)
        nra = 1 if start else n_refs

        def push(stack, new):
            """DPB push-front: [N,S,H,W], newest first."""
            return jnp.concatenate([new[None], stack[:-1]], axis=0)

        @jax.jit
        def step(t, qp, dpb_enc, hdr_i_hw, hdr_i_len,
                 hdr_p_hw, hdr_p_len, hy, hu, hv):
            if host:
                y, u, v = hy, hu, hv  # ingested frames (already on HBM)
            else:
                y, u, v = source(t)
            y, u, v = (x.astype(jnp.int32) for x in (y, u, v))
            cur = dpb_enc  # 3 x [N, S, H, W]
            sym_i = None
            if start:
                sym_i, recon = iframe.encode_iframe_rows(
                    y[0], u[0], v[0], qp
                )
                sh = sym_i.mode.shape
                db = tuple(
                    x.astype(jnp.int32) for x in _deblock_i(recon, sh, qp)
                )
                # IDR resets the DPB; unfilled slots mirror slot 0 so
                # the (never-selected) extra references stay well-formed
                cur = tuple(
                    jnp.broadcast_to(p[None], (n_refs, *p.shape))
                    for p in db
                )

            # the P-frame chain is a lax.scan (sequential DPB carry):
            # ONE traced encode body instead of k inlined copies, so the
            # step compiles ~k x faster and the carry dtype stays int32
            # across dispatches (no uint8 retrace on the re-fed DPB)
            def body(cur, xs):
                yf, uf, vf = xs
                sym, recon, motion = pframe.encode_pframe_rows_multi(
                    yf, uf, vf, cur[0][:nra], cur[1][:nra], cur[2][:nra],
                    qp, intra_in_p=self.config.intra_in_p,
                )
                db = tuple(
                    x.astype(jnp.int32)
                    for x in _deblock_p(recon, sym, motion, qp)
                )
                cur = tuple(push(cur[i], db[i]) for i in range(3))
                return cur, sym

            first_p = 1 if start else 0
            cur, syms_scan = jax.lax.scan(
                body, cur, (y[first_p:], u[first_p:], v[first_p:])
            )
            # [P, S, ...] -> [P*S, ...] for the entropy stage
            syms_p = pframe.MBSymbolsP(*(
                None if f is None else f.reshape(n_p * streams, *f.shape[2:])
                for f in syms_scan
            ))
            hw_p, bytes_p, ovf = entropy_tpu.encode_bits_pframe(
                syms_p, qp, hdr_p_hw, hdr_p_len, nra=nra
            )  # [P*S, R, SLICE_W], [P*S, R]
            parts = [None, None]
            payloads = []
            if start:
                hw_i, bytes_i, ovf_i = entropy_tpu.encode_bits_iframe(
                    sym_i, qp, hdr_i_hw, hdr_i_len
                )
                ovf = ovf | ovf_i
                parts[0] = bytes_i.reshape(-1)
                payloads.append(compact(hw_i, bytes_i, budget_i))
            else:
                hw_i = hw_p[:0]
            # wire[0] flags device-entropy overflow only (host-packer
            # fallback); payload-budget overflow is host-detected from
            # the byte counts and re-reads the full slabs instead.
            parts[1] = bytes_p.reshape(-1)
            payloads.append(compact(hw_p, bytes_p, budget_p))
            wire = jnp.concatenate(
                [ovf.astype(jnp.int32).reshape(1)]
                + [p for p in parts if p is not None]
                + payloads
            )
            return sym_i, syms_p, hw_i, hw_p, wire, cur

        return step

    # -- decode-from-bits device step ------------------------------------

    def _build_decode(self):
        """Device reconstruction from PARSED compact records.

        One uniform program decodes any dispatch: I slices are
        normalized by the native parser into all-intra P-layout records,
        and intra-vs-inter is per-MB data inside the kernel
        (decode_pframe_rows_multi), so GOP-start and interior dispatches
        share one compiled step.  Scatter defaults express P_Skip: an MB
        with no record has kind 0 and zero coefficients.
        """
        k = self.FRAMES_PER_DISPATCH
        s = self.s_dec  # decode streams = encode streams x fanout
        fan = self.fanout
        r, c = self.h16 // 16, self.w16 // 16
        n = r * c
        f_tot = k * s
        host = self.source_kind == "host"
        source = None if host else sources._device_source_gop(
            self.w16, self.h16, k, self.config.streams, self.source_kind
        )

        @jax.jit
        def dec(t, qp, reset, mb_pos, mb_fields, cpos, cval,
                dpb_y, dpb_u, dpb_v):
            # record scatter (dead slot = last row/element, dropped)
            mbf = jnp.zeros((f_tot * n + 1, 9), jnp.int32)
            mbf = mbf.at[mb_pos].set(
                mb_fields.astype(jnp.int32), mode="drop",
                indices_are_sorted=fan == 1,
            )
            mbf = mbf[:-1].reshape(k, s, r, c, 9)
            flat = jnp.zeros((f_tot * n * 400 + 1,), jnp.int16)
            flat = flat.at[cpos].set(cval, mode="drop", unique_indices=True)
            coef = flat[:-1].reshape(k, s, n, 400)
            ldc = coef[..., :16].reshape(k, s, r, c, 16)
            lac = coef[..., 16:272].reshape(k, s, r, c, 16, 16)
            cdc = coef[..., 272:280].reshape(k, s, r, c, 2, 4)
            cac = coef[..., 280:400].reshape(k, s, r, c, 2, 4, 15)

            if host:
                # host-fed frames: quality is measured host-side by the
                # caller (tools/bench_ingest.py); SSE rides as zeros
                y = jnp.zeros((k, s, self.h16, self.w16), jnp.uint8)
            else:
                y, _, _ = source(t)
                if fan > 1:
                    # 1-encoder -> N-decoder fan-out: each decode
                    # stream's source is its encoded stream's source
                    y = jnp.repeat(y, fan, axis=1)

            # one uniform per-frame body -> lax.scan over the dispatch's
            # k frames (sequential DPB chain as the scan carry); the
            # traced program is 1/k the size of an unrolled chain, which
            # keeps XLA compile time of the 1080p step manageable
            def body(cur, xs):
                mbf_f, ldc_f, lac_f, cdc_f, cac_f, y_f, rst = xs
                sym = pframe.MBSymbolsP(
                    kind=mbf_f[..., 0], mode=mbf_f[..., 1],
                    cmode=mbf_f[..., 2], cbp_luma=mbf_f[..., 3],
                    cbp_chroma=mbf_f[..., 4], mvdx=mbf_f[..., 5],
                    mvdy=mbf_f[..., 6],
                    luma_dc=ldc_f, luma_ac=lac_f,
                    chroma_dc=cdc_f, chroma_ac=cac_f,
                    refidx=mbf_f[..., 7],
                    t8=jnp.zeros_like(mbf_f[..., 0]),
                )
                recon, motion = pframe.decode_pframe_rows_multi(
                    sym, cur[0], cur[1], cur[2], qp
                )
                db = tuple(
                    x.astype(jnp.int32) for x in
                    _deblock_p(recon, sym, motion, qp)
                )  # keep the scan carry dtype fixed (deblock emits uint8)
                # DPB update mirrors the encoder exactly: IDR frames
                # reset the stack to copies of themselves; others
                # push-front (newest first)
                cur = tuple(
                    jnp.where(
                        rst,
                        jnp.broadcast_to(db[i][None], cur[i].shape),
                        jnp.concatenate([db[i][None], cur[i][:-1]], 0),
                    )
                    for i in range(3)
                )
                d = db[0].astype(jnp.float32) - y_f.astype(jnp.float32)
                d = d.reshape(s, -1)
                return cur, jnp.sum(d * d, axis=-1)  # [S]

            cur, sse = jax.lax.scan(
                body, (dpb_y, dpb_u, dpb_v),
                (mbf, ldc, lac, cdc, cac, y.astype(jnp.int32), reset),
            )
            return cur[0], cur[1], cur[2], sse

        return dec

    @staticmethod
    def _bucket(x: int, lo: int = 16384) -> int:
        b = lo
        while b < x:
            b *= 2
        return b

    def _decode_dispatch(self, frames_k, t: int, qp: int,
                         start: bool = False) -> None:
        """Entropy-decode the dispatch's annex-B bytes (native threaded
        CAVLC front end) and reconstruct on device from the parsed
        records, advancing the decoder DPB chain."""
        t0 = time.perf_counter()
        flat = [b for fr in frames_k for b in fr]
        r, c = self.h16 // 16, self.w16 // 16
        pqp, mb_pos, mb_fields, cpos, cval = (
            entropy_native.parse_dispatch_compact(
                flat, c, r, self.sps, self.pps,
                threads=self.config.threads,
            )
        )
        if pqp != qp:
            # a decoder trusts the bitstream: reconstruct at the QP the
            # slice headers actually carry (the reference's decoder knows
            # nothing of the encoder's intent, openh264_wrapper.cpp:407);
            # keep a stats-side counter so a closed-loop mismatch -- which
            # would indicate a pipeline bug -- stays observable
            self.qp_mismatches += 1
            qp = pqp
        k = self.FRAMES_PER_DISPATCH
        s = self.s_dec
        n = r * c
        if self.fanout > 1:
            # 1-encoder -> N-decoder fan-out (app.js:339-359): replicate
            # each parsed record once per decode stream; decode stream
            # ss*fan+fi carries encoded stream ss's records
            fan = self.fanout
            se = self.config.streams
            kk, rest = np.divmod(mb_pos, se * n)
            ss, pp = np.divmod(rest, n)
            fi = np.arange(fan, dtype=np.int64)
            mb_pos = (
                ((kk[:, None] * s + ss[:, None] * fan + fi) * n
                 + pp[:, None]).reshape(-1).astype(np.int32)
            )
            mb_fields = np.repeat(mb_fields, fan, axis=0)
            slots = entropy_native.MB_SLOTS
            kk, rest = np.divmod(cpos, se * n * slots)
            ss, pp = np.divmod(rest, n * slots)
            cpos = (
                ((kk[:, None] * s + ss[:, None] * fan + fi)
                 * (n * slots) + pp[:, None])
                .reshape(-1).astype(np.int32)
            )
            cval = np.repeat(cval, fan, axis=0)
        # pad to sticky shape buckets so jit programs are reused across
        # dispatches; padded records hit the dropped dead slot
        caps = self._caps[start]
        hist = self._caps_hist[start]
        hist.append((len(mb_pos), len(cval)))
        if len(hist) >= 16 and not self.freeze_shapes:
            # record caps shrink like the payload budgets (>=4x
            # oversized only): the h2d record upload is cap-sized, so
            # caps left fat by an RC transient would tax every later
            # dispatch, but oscillating variants would cost recompiles
            need_m = self._bucket(max(m for m, _ in hist) * 5 // 4)
            need_c = self._bucket(max(cc for _, cc in hist) * 5 // 4)
            if need_m <= caps[0] // 4:
                caps[0] = need_m
            if need_c <= caps[1] // 4:
                caps[1] = need_c
            del hist[:]
        if self.freeze_shapes:
            # no new jit variants: use the frozen caps when they fit
            bm = caps[0] if len(mb_pos) <= caps[0] else self._bucket(
                len(mb_pos), caps[0])
            bc = caps[1] if len(cval) <= caps[1] else self._bucket(
                len(cval), caps[1])
        else:
            caps[0] = bm = self._bucket(len(mb_pos), caps[0])
            caps[1] = bc = self._bucket(len(cval), caps[1])
        mb_pos = np.concatenate(
            [mb_pos, np.full(bm - len(mb_pos), k * s * n, np.int32)]
        )
        mb_fields = np.concatenate(
            [mb_fields, np.zeros((bm - len(mb_fields), 9), np.int16)]
        )
        cpos = np.concatenate(
            [cpos, np.full(bc - len(cpos), k * s * n * 400, np.int32)]
        )
        cval = np.concatenate([cval, np.zeros(bc - len(cval), np.int16)])
        t1 = time.perf_counter()
        reset = np.zeros(k, bool)
        reset[0] = start
        dy, du, dv, sse = self._dec_step(
            jnp.int32(t), jnp.int32(qp), jnp.asarray(reset),
            mb_pos, mb_fields, cpos, cval,
            *self._dpb_dec,
        )
        t2 = time.perf_counter()
        self.stage_ms["parse"] += (t1 - t0) * 1e3
        self.stage_ms["dec_dispatch"] += (t2 - t1) * 1e3
        self._dpb_dec = (dy, du, dv)
        self._sse_dev = sse
        self._dec_frames += k * s

    # -- host loop -------------------------------------------------------

    def _dispatch(self):
        qp = (
            self.config.qp if self.config.qp is not None
            else self.rc.current_qp()
        )
        pos = self._gop_pos % self.gop_dispatches
        start = pos == 0
        t = self.dispatch_index * self.FRAMES_PER_DISPATCH + self.time_offset
        hdr_i, hdr_p = self._headers(pos, qp)
        dummy = jnp.zeros((0,), jnp.int32)
        hdr_i_hw, hdr_i_len = hdr_i if hdr_i is not None else (dummy, dummy)
        bi, bp = self._payload_w[start]
        key = (start, bi, bp)
        step = self._step_cache.get(key)
        if step is None:
            step = self._step_cache[key] = self._build_step(start, bi, bp)
        if self.source_kind == "host":
            if self._host_frames is None:
                raise RuntimeError(
                    "host source: feed frames via pump_host_frames()"
                )
            # the reference's timed pixel copy into codec memory
            # (encoder_worker.js:112-120): h2d upload of the dispatch's
            # K frames, synchronized so the metric is honest
            tc = time.perf_counter()
            hy, hu, hv = (jax.device_put(a) for a in self._host_frames)
            jax.block_until_ready((hy, hu, hv))
            self.last_copy_ms = (time.perf_counter() - tc) * 1e3
            self.stage_ms["copy"] = (
                self.stage_ms.get("copy", 0.0) + self.last_copy_ms
            )
            self._host_frames = None
        else:
            dz = jnp.zeros((0,), jnp.int32)
            hy = hu = hv = dz
        out = step(
            jnp.int32(t), jnp.int32(qp), self._dpb_enc,
            hdr_i_hw, hdr_i_len, hdr_p[0], hdr_p[1], hy, hu, hv,
        )
        sym_i, syms_p, hw_i, hw_p, wire, self._dpb_enc = out
        self.dispatch_index += 1
        self._gop_pos += 1
        for _ in range(self.FRAMES_PER_DISPATCH):
            self.stats.on_input()
        # the payload budgets RIDE WITH the handles: the wire layout is
        # fixed at dispatch time, and consume may run a dispatch later
        # (software pipelining) than a budget grow/shrink
        return start, pos, t, sym_i, syms_p, hw_i, hw_p, wire, qp, (bi, bp)

    def force_idr(self) -> None:
        """Restart the GOP at the next dispatch (ForceIntraFrame analog,
        openh264_wrapper.cpp:230-236, routed to the real encoder owner)."""
        self._gop_pos = 0

    def drop_frames(self, n: int) -> None:
        """Skip n source frames (capture backpressure): the encoder
        simply never sees them; the next encoded frame still references
        the last encoded reconstruction (encoder_worker.js:80-88)."""
        self.time_offset += n
        self.stats.on_drop("capture", n)

    def _consume(self, handles) -> list:
        """Retire one dispatch: ONE wire download + NAL framing.

        Appends per-stream annex-B bytes for each frame of the dispatch
        to self.frame_streams ([(stream0, ..., streamS-1), ...]) and
        returns that k-frame list.  Bucket overflow re-reads the full
        payload slabs; device-entropy overflow (MB/slice bit caps)
        repacks on host from the symbol tensors."""
        (start, pos, t, sym_i, syms_p, hw_i, hw_p, wire_dev, qp,
         (budget_i, budget_p)) = handles
        t0 = time.perf_counter()
        jax.block_until_ready(wire_dev)  # device compute still queued
        t1 = time.perf_counter()
        wire = np.asarray(wire_dev)  # the actual d2h transfer
        t2 = time.perf_counter()
        self.stage_ms["dev_wait"] += (t1 - t0) * 1e3
        self.stage_ms["d2h"] += (t2 - t1) * 1e3
        k = self.FRAMES_PER_DISPATCH
        s = self.config.streams
        r = self.h16 // 16
        n_p = k - 1 if start else k
        off = 1
        if start:
            bytes_i = wire[off:off + s * r].reshape(s, r)
            off += s * r
        bytes_p = wire[off:off + n_p * s * r].reshape(n_p, s, r)
        off += n_p * s * r
        if wire[0]:  # device entropy overflow: repack on host
            self._host_pack_gop(start, pos, sym_i, syms_p, qp)
            self._rc_update(k, start)
            return self.frame_streams[-k:]

        def slices_from_compact(pay_words, nbytes):
            """Per-slice RBSP byte strings from a contiguous payload."""
            blob = pay_words.view(np.uint32).astype(">u4").tobytes()
            flat = nbytes.reshape(-1)
            wc = (flat.astype(np.int64) + 3) // 4
            offs = np.zeros(len(wc) + 1, np.int64)
            np.cumsum(wc, out=offs[1:])
            return [
                blob[4 * offs[i] : 4 * offs[i] + int(flat[i])]
                for i in range(len(wc))
            ]

        def slices_from_slab(hw, nbytes):
            words = np.asarray(hw).view(np.uint32).astype(">u4")
            words = words.reshape(-1, words.shape[-1])
            flat = nbytes.reshape(-1)
            return [
                words[i].tobytes()[: int(flat[i])] for i in range(len(flat))
            ]

        # budget_i/budget_p came with the handles (the wire layout is
        # theirs); growth/shrink below only steers FUTURE dispatches
        wc_p_tot = int(((bytes_p.astype(np.int64) + 3) // 4).sum())
        wc_i_tot = (
            int(((bytes_i.astype(np.int64) + 3) // 4).sum()) if start else 0
        )
        rbsp_i = None
        caps = self._payload_w[start]
        hist = self._payload_hist[start]
        hist.append((wc_i_tot, wc_p_tot))
        if len(hist) >= 16 and not self.freeze_shapes:
            # shrink budgets left >=4x oversized by a transient (e.g.
            # the rate controller settling): conservative hysteresis so
            # steady state never oscillates between step variants
            need_i = self._bucket(max(wi for wi, _ in hist) * 5 // 4)
            need_p = self._bucket(max(wp for _, wp in hist) * 5 // 4)
            if start and need_i <= caps[0] // 4:
                caps[0] = need_i
            if need_p <= caps[1] // 4:
                caps[1] = need_p
            del hist[:]
        if wc_p_tot > budget_p or (start and wc_i_tot > budget_i):
            # payload-budget overflow: grow the sticky budgets (a new
            # step variant compiles for subsequent dispatches) and fall
            # back to the full slab download for this one.  Frozen
            # pipelines keep the budgets (and take the slab path) --
            # correctness is identical, no compile mid-measurement.
            if not self.freeze_shapes:
                if start and wc_i_tot > budget_i:
                    caps[0] = self._bucket(wc_i_tot * 5 // 4, budget_i)
                if wc_p_tot > budget_p:
                    caps[1] = self._bucket(wc_p_tot * 5 // 4, budget_p)
            if start:
                rbsp_i = slices_from_slab(hw_i, bytes_i)
            rbsp_p = slices_from_slab(hw_p, bytes_p)
        else:
            if start:
                rbsp_i = slices_from_compact(
                    wire[off : off + budget_i], bytes_i
                )
                off += budget_i
            rbsp_p = slices_from_compact(
                wire[off : off + budget_p], bytes_p
            )

        esc = (
            entropy_native.escape_rbsp
            if entropy_native.available()
            else nal.escape_rbsp
        )
        p_hdr_byte = bytes([(2 << 5) | nal.NAL_SLICE_NON_IDR])
        f = 0
        if start:
            idr_hdr_byte = bytes([(3 << 5) | nal.NAL_SLICE_IDR])
            w = BitWriter()
            self.sps.write(w)
            ps = bytes(nal.wrap_nal(nal.NAL_SPS, w.get_bytes()))
            w = BitWriter()
            self.pps.write(w)
            ps += nal.wrap_nal(nal.NAL_PPS, w.get_bytes())
            frame = []
            for si in range(s):
                out = bytearray(ps)
                for ri in range(r):
                    out += (nal.START_CODE + idr_hdr_byte
                            + esc(rbsp_i[si * r + ri]))
                frame.append(bytes(out))
            self.frame_streams.append(tuple(frame))
            f = 1
        for pi in range(n_p):
            frame = []
            for si in range(s):
                out = bytearray()
                for ri in range(r):
                    out += (nal.START_CODE + p_hdr_byte
                            + esc(rbsp_p[(pi * s + si) * r + ri]))
                frame.append(bytes(out))
            self.frame_streams.append(tuple(frame))
        self.last_stream = self.frame_streams[-1][0]
        self._rc_update(k, start)
        return self.frame_streams[-k:]

    def _rc_update(self, k: int, start: bool = False) -> None:
        """Feed the CBR controller the dispatch's per-frame byte counts
        (mean across streams; IDR access units amortize over the GOP the
        same way the reference's RC sees them).  Interior P frames also
        feed the scene-cut detector: a bits spike at steady QP means
        inter prediction collapsed, and the GOP restarts at the next
        dispatch (ForceIntraFrame analog -- the recovery path the RTC
        preset relies on instead of intra-in-P MBs)."""
        if self.config.qp is not None:
            return
        s = self.config.streams
        frames = self.frame_streams[-k:]
        cut = False
        for fi, fr in enumerate(frames):
            fb = sum(len(b) for b in fr) / s
            self.rc.update(fb)
            if not (start and fi == 0):  # interior P frames only
                cut |= self.rc.p_frame_is_scene_cut(fb)
        if cut and self._gop_pos != 0:
            self.force_idr()

    def _host_pack_gop(self, start, pos, sym_i, syms_p, qp: int) -> None:
        """Device-entropy overflow fallback: host CAVLC pack from the
        downloaded symbol tensors (same slice headers as the device
        path: frame_num = GOP position, deblock on, single ref)."""
        self.fallback_packs += 1
        k = self.FRAMES_PER_DISPATCH
        s = self.config.streams
        n = (self.h16 // 16) * (self.w16 // 16)
        n_p = k - 1 if start else k
        if start:
            mode = np.asarray(sym_i.mode).reshape(s, n)
            cmode = np.asarray(sym_i.cmode).reshape(s, n)
            cbp_l = np.asarray(sym_i.cbp_luma).reshape(s, n)
            cbp_c = np.asarray(sym_i.cbp_chroma).reshape(s, n)
            ldc = np.asarray(sym_i.luma_dc).reshape(s, n, 16)
            lac = np.asarray(sym_i.luma_ac).reshape(s, n, 16, 16)
            cdc = np.asarray(sym_i.chroma_dc).reshape(s, n, 2, 4)
            cac = np.asarray(sym_i.chroma_ac).reshape(s, n, 2, 4, 15)
            frame = []
            for si in range(s):
                mb_info = np.ascontiguousarray(
                    np.stack(
                        [mode[si], cmode[si], cbp_l[si], cbp_c[si]], axis=1
                    ),
                    np.int32,
                )
                frame.append(self._entropy.pack_iframe(
                    mb_info, ldc[si], lac[si], cdc[si], cac[si],
                    self.sps, self.pps, qp,
                    slice_mode="rows", frame_num=0, idr=True,
                    include_ps=True, deblock_idc=2,
                ))
            self.frame_streams.append(tuple(frame))
        kind = np.asarray(syms_p.kind).reshape(n_p, s, n)
        mode = np.asarray(syms_p.mode).reshape(n_p, s, n)
        cmode = np.asarray(syms_p.cmode).reshape(n_p, s, n)
        cbp_l = np.asarray(syms_p.cbp_luma).reshape(n_p, s, n)
        cbp_c = np.asarray(syms_p.cbp_chroma).reshape(n_p, s, n)
        mvdx = np.asarray(syms_p.mvdx).reshape(n_p, s, n)
        mvdy = np.asarray(syms_p.mvdy).reshape(n_p, s, n)
        ldc = np.asarray(syms_p.luma_dc).reshape(n_p, s, n, 16)
        lac = np.asarray(syms_p.luma_ac).reshape(n_p, s, n, 16, 16)
        cdc = np.asarray(syms_p.chroma_dc).reshape(n_p, s, n, 2, 4)
        cac = np.asarray(syms_p.chroma_ac).reshape(n_p, s, n, 2, 4, 15)
        refi = np.asarray(
            syms_p.refidx if syms_p.refidx is not None else 0
        ).reshape(n_p, s, n) if syms_p.refidx is not None else np.zeros(
            (n_p, s, n), np.int32
        )
        pack_p = getattr(self._entropy, "pack_pframe",
                         entropy_packp.pack_pframe)
        first = pos * k + (1 if start else 0)
        nra = 1 if start else self.n_refs
        for pi in range(n_p):
            frame = []
            for si in range(s):
                mb_info = np.zeros((n, 8), np.int32)
                mb_info[:, 0] = kind[pi, si]
                mb_info[:, 1] = mode[pi, si]
                mb_info[:, 2] = cmode[pi, si]
                mb_info[:, 3] = cbp_l[pi, si]
                mb_info[:, 4] = cbp_c[pi, si]
                mb_info[:, 5] = mvdx[pi, si]
                mb_info[:, 6] = mvdy[pi, si]
                mb_info[:, 7] = refi[pi, si]
                frame.append(pack_p(
                    mb_info, ldc[pi, si], lac[pi, si], cdc[pi, si],
                    cac[pi, si], self.sps, self.pps, qp,
                    slice_mode="rows", frame_num=first + pi,
                    deblock_idc=2, ref=True, num_ref_active=nra,
                ))
            self.frame_streams.append(tuple(frame))
        self.last_stream = self.frame_streams[-1][0]

    def pump_host_frames(self, y, u, v) -> None:
        """Feed one dispatch of HOST frames (source_kind="host") and run
        it synchronously: y [K, S, H, W] uint8 (u/v half-size), padded
        here to the MB grid.  The h2d upload is timed as last_copy_ms /
        stage 'copy' -- the reference's frame-copy metric
        (encoder_worker.js:112-120)."""
        k = self.FRAMES_PER_DISPATCH
        s = self.config.streams
        y = np.asarray(y, np.uint8).reshape(k, s, *np.shape(y)[-2:])
        u = np.asarray(u, np.uint8).reshape(k, s, *np.shape(u)[-2:])
        v = np.asarray(v, np.uint8).reshape(k, s, *np.shape(v)[-2:])

        def padded(p, hh, ww):
            ph, pw = hh - p.shape[-2], ww - p.shape[-1]
            if ph or pw:
                p = np.pad(p, ((0, 0), (0, 0), (0, ph), (0, pw)),
                           mode="edge")
            return p

        self._host_frames = (
            padded(y, self.h16, self.w16),
            padded(u, self.h16 // 2, self.w16 // 2),
            padded(v, self.h16 // 2, self.w16 // 2),
        )
        self.pump_frame()

    def pump_frame(self) -> None:
        """Encode+parse+decode one dispatch synchronously (tests/drive)."""
        k = self.FRAMES_PER_DISPATCH
        t0 = time.perf_counter()
        handles = self._dispatch()
        t, qp = handles[2], handles[8]
        frames_k = self._consume(handles)
        self._decode_dispatch(frames_k, t, qp, start=handles[0])
        sse = np.asarray(self._sse_dev)
        dt = (time.perf_counter() - t0) * 1e3
        mse = float(sse[-1, 0]) / (self.w16 * self.h16)
        self.last_psnr_y = 99.0 if mse == 0 else 10 * np.log10(255.0**2 / mse)
        total = sum(len(b) for fr in frames_k for b in fr)
        self.stats.on_encode(k * self.config.streams, dt, 0.0, 0.0, total)
        self.stats.on_decode(k * self.config.streams, dt)

    def decoded_planes(self):
        """Download the decoder chain's current reconstruction
        (post-deblock planes of the last decoded frame, all S streams;
        the DPB is [N, S, H, W] newest-first)."""
        return tuple(np.asarray(p[0]) for p in self._dpb_dec)

    def stream_bytes(self, stream_index: int = 0) -> bytes:
        """Concatenated annex-B bitstream of one stream so far."""
        return b"".join(fr[stream_index] for fr in self.frame_streams)

    def run(self, duration_s: float = 5.0, warmup: int = 2) -> Dict[str, float]:
        """Measurement loop, 1-dispatch-deep software pipelining.

        While the device executes encode dispatch t, the host retires
        dispatch t-1 (wire download + NAL framing), entropy-decodes its
        bytes (threaded native CAVLC parse), and enqueues the device
        reconstruction of t-1 behind encode t -- so parse and transfers
        hide under device compute and every counted frame has been
        encoded, packed to annex-B, parsed back, and reconstructed."""
        k = self.FRAMES_PER_DISPATCH
        # warm a FULL GOP cycle (+1) so every jit variant -- GOP-start and
        # interior encode steps, all sticky record-cap buckets of the
        # decode step -- compiles before the measurement window; with
        # rate control active, keep warming (bounded) until the QP and
        # every sticky budget/cap stop moving, so no step variant
        # compiles inside the window
        for _ in range(max(warmup, self.gop_dispatches + 1)):
            self.pump_frame()
        if self.config.qp is None:
            for _ in range(6):
                state = (self.rc.current_qp(),
                         tuple(self._payload_w[True]),
                         tuple(self._payload_w[False]),
                         tuple(self._caps[True]), tuple(self._caps[False]))
                for _ in range(self.gop_dispatches):
                    self.pump_frame()
                new_state = (self.rc.current_qp(),
                             tuple(self._payload_w[True]),
                             tuple(self._payload_w[False]),
                             tuple(self._caps[True]),
                             tuple(self._caps[False]))
                if new_state == state:
                    break
        # headroom before freezing: content drift can push the decode
        # record counts past any cap seen in warmup, and a frozen cap
        # that overflows must still pad to SOME bucket -- which would
        # compile a new decode-step variant mid-window.  Double both
        # phases' caps and run one full GOP cycle so the doubled
        # variants are compiled BEFORE the measurement starts.
        for ph in (True, False):
            self._caps[ph][0] *= 2
            self._caps[ph][1] *= 2
        for _ in range(self.gop_dispatches):
            self.pump_frame()
        self.stats.snapshot(self.config.streams)
        self.stage_ms = {kk: 0.0 for kk in self.stage_ms}
        # measurement window: no new jit variants (see freeze_shapes)
        self.freeze_shapes = True
        n = 0
        t0 = time.perf_counter()
        deadline = t0 + duration_s
        pending = None
        while time.perf_counter() < deadline:
            te = time.perf_counter()
            handles = self._dispatch()
            self.stage_ms["enc_dispatch"] += (time.perf_counter() - te) * 1e3
            if pending is not None:
                tw = time.perf_counter()
                frames_k = self._consume(pending)
                self.stage_ms["wire"] += (time.perf_counter() - tw) * 1e3
                self._decode_dispatch(frames_k, pending[2], pending[8],
                                      start=pending[0])
                n += k
                self.stage_ms["n"] += 1
            pending = handles
        if pending is not None:
            frames_k = self._consume(pending)
            self._decode_dispatch(frames_k, pending[2], pending[8],
                                  start=pending[0])
            n += k
        if self._sse_dev is not None:
            sse = np.asarray(self._sse_dev)
            mse = float(sse[-1, 0]) / (self.w16 * self.h16)
            self.last_psnr_y = (
                99.0 if mse == 0 else 10 * np.log10(255.0**2 / mse)
            )
        wall = time.perf_counter() - t0
        self.freeze_shapes = False
        snap = self.stats.snapshot(self.config.streams)
        snap["frames"] = n * self.config.streams
        snap["pipeline_fps"] = n / wall
        snap["frames_per_s_aggregate"] = n * self.config.streams / wall
        snap["psnr_y"] = self.last_psnr_y
        snap["stream_bytes"] = len(self.last_stream)
        snap["qp"] = (
            self.config.qp if self.config.qp is not None
            else self.rc.current_qp()
        )
        if self.stage_ms["n"]:
            nn = self.stage_ms["n"]
            for kk in ("enc_dispatch", "wire", "dev_wait", "d2h", "parse",
                       "dec_dispatch"):
                snap[f"ms_{kk}"] = self.stage_ms[kk] / nn
        return snap
