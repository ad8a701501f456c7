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

    def _build_step(self):
        streams = self.config.streams
        source = sources._device_source(self.w16, self.h16, 1)

        @jax.jit
        def step(t, qp, hdr_hw, hdr_len):
            y, u, v = source(t)
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
            sse = jnp.sum(d * d, axis=(-1, -2))  # [streams, rows]? -> [streams]
            sse = sse.reshape(streams, -1).sum(-1)
            meta = jnp.concatenate(
                [
                    ovf.astype(jnp.int32).reshape(1),
                    slice_bytes.reshape(-1),
                    jax.lax.bitcast_convert_type(
                        sse.astype(jnp.float32), jnp.int32
                    ).reshape(-1),
                ]
            )
            return slice_hw, meta

        return step

    def pump_frame(self, emit_bitstream: bool = True) -> None:
        cfg = self.config
        qp = cfg.qp if cfg.qp is not None else 32
        t_in = time.perf_counter()
        if self._hdr is None:
            self._hdr = device_pack.slice_headers_device(
                self.sps, self.pps, qp, 0, True, 1
            )
        hdr_hw, hdr_len = self._hdr
        self.stats.on_input()

        slice_hw, meta_dev = self._step(
            jnp.int32(self.frame_index), jnp.int32(qp), hdr_hw, hdr_len
        )
        meta = np.asarray(meta_dev)  # transfer 1 (syncs the dispatch)
        t_tpu = time.perf_counter()

        r = self.h16 // 16
        sbytes = meta[1 : 1 + r]
        sse = meta[1 + r :].view(np.float32)

        nbytes = 0
        if emit_bitstream:
            if meta[0]:
                raise RuntimeError("device entropy overflow (host fallback TBD)")
            self._assemble(slice_hw, sbytes)
            nbytes = len(self.last_stream)
        t_done = time.perf_counter()

        mse = float(sse[0]) / (self.w16 * self.h16)
        self.last_psnr_y = 99.0 if mse == 0 else 10 * np.log10(255.0**2 / mse)
        self.stats.on_encode(
            1, (t_tpu - t_in) * 1e3, 0.0, (t_done - t_tpu) * 1e3, nbytes
        )
        self.stats.on_decode(cfg.streams, (t_tpu - t_in) * 1e3)
        self.frame_index += 1

    def _dispatch(self, qp: int):
        """Issue one frame's device program without synchronizing."""
        if self._hdr is None:
            self._hdr = device_pack.slice_headers_device(
                self.sps, self.pps, qp, 0, True, 1
            )
        hdr_hw, hdr_len = self._hdr
        out = self._step(
            jnp.int32(self.frame_index), jnp.int32(qp), hdr_hw, hdr_len
        )
        self.frame_index += 1
        self.stats.on_input()
        return out

    def _assemble(self, slice_hw, sbytes) -> None:
        """Download the bucketed per-slice payload slab and frame NALs.

        Column bucketing (1024-halfword granularity, sized by the fattest
        slice) keeps the compiled device slice shape stable across frames
        while downloading ~the compressed payload, as uint16."""
        r = self.h16 // 16
        n_cols = min(
            slice_hw.shape[-1],
            -(-((int(sbytes.max()) + 1) // 2) // 1024) * 1024,
        )
        slab = np.asarray(slice_hw[0, :, :n_cols]).astype(">u2")
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
        for i in range(r):
            rbsp = slab[i].tobytes()[: int(sbytes[i])]
            out += nal.START_CODE + hdr_byte + esc(rbsp)
        self.last_stream = bytes(out)

    def _retire(self, handles, qp: int) -> None:
        """Consume a dispatched frame: metadata sync + wire bitstream."""
        slice_hw, meta_dev = handles
        meta = np.asarray(meta_dev)
        r = self.h16 // 16
        if meta[0]:
            raise RuntimeError("device entropy overflow (host fallback TBD)")
        sbytes = meta[1 : 1 + r]
        sse = meta[1 + r :].view(np.float32)
        self._assemble(slice_hw, sbytes)
        mse = float(sse[0]) / (self.w16 * self.h16)
        self.last_psnr_y = 99.0 if mse == 0 else 10 * np.log10(255.0**2 / mse)
        self.stats.on_encode(1, 0.0, 0.0, 0.0, len(self.last_stream))
        self.stats.on_decode(self.config.streams, 0.0)

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
                n += 1
            pending = handles
        if pending is not None:
            self._retire(pending, qp)
            n += 1
        wall = time.perf_counter() - t0
        snap = self.stats.snapshot(self.config.streams)
        snap["frames"] = n
        snap["pipeline_fps"] = n / wall
        snap["frames_per_s_aggregate"] = n * self.config.streams / wall
        snap["psnr_y"] = self.last_psnr_y
        snap["stream_bytes"] = len(self.last_stream)
        return snap
