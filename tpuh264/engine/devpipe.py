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
from ..kernels import entropy_tpu, iframe
from .config import CodecConfig
from . import sources
from .metrics import StatsWindow


class DevicePipeline:
    """encode -> wire bitstream -> N-stream fan-out decode, one dispatch."""

    def __init__(self, config: Optional[CodecConfig] = None, **kw):
        if config is None:
            config = CodecConfig(**kw)
        self.config = config
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
        source = sources._device_source_frames(self.w16, self.h16, k)
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
            # [ovf | slice_bytes (K*R) | sse bits (K*streams) | slabs]
            ovf = ovf | jnp.any(slice_bytes > 4 * bucket)
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
            return slice_hw, wire

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
            sse = self._consume(handles)
            nbytes = len(self.last_stream)
        else:
            wire = np.asarray(handles[1])
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

    def _consume(self, handles) -> np.ndarray:
        """Retire one dispatch (K frames): ONE wire-buffer download, then
        NAL framing; falls back to the full payload slab on overflow.
        Returns the [K*streams] SSE vector."""
        slice_hw, wire_dev = handles
        wire = np.asarray(wire_dev)  # the single host transfer
        r = self.h16 // 16
        k = self.FRAMES_PER_DISPATCH
        streams = self.config.streams
        sbytes = wire[1 : 1 + k * r].reshape(k, r)
        sse = wire[1 + k * r : 1 + k * r + k * streams].view(np.float32)
        if wire[0]:
            if int(sbytes.max()) > 4 * entropy_tpu.SLICE_W - 8:
                raise RuntimeError("device entropy overflow (slice cap)")
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

    def _retire(self, handles, qp: int) -> None:
        """Consume one dispatch (K frames) and update stats."""
        k = self.FRAMES_PER_DISPATCH
        sse = self._consume(handles)
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
