"""Device-resident pipeline: the zero-copy transport expressed TPU-natively.

The reference's SharedArrayBuffer ring exists to avoid copying encoded
frames between workers (SURVEY.md L4).  On TPU, the analog is keeping the
codec state in HBM: the encoder's symbol tensors stay on device, the
fan-out decoders reconstruct directly from them, and only two things ever
cross the host link per frame:

  * one fused int16 symbol buffer (for the wire bitstream -- host CAVLC
    pack produces the actual annex-B bytes), and
  * scalar quality metrics (PSNR sums computed on device).

Host<->device transfer is the bottleneck on tunneled dev setups and still
costs real latency on PCIe, so this is the production shape of the
pipeline; the host-centric engine.Pipeline remains the portable path.
"""

from __future__ import annotations

import time
from typing import Dict, Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..core.params import PPS, SPS
from ..entropy import native as entropy_native
from ..entropy import pack as entropy_pack
from ..kernels import iframe
from .config import CodecConfig
from . import sources
from .metrics import StatsWindow


@jax.jit
def _psnr_sums(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    d = a.astype(jnp.int32) - b.astype(jnp.int32)
    return jnp.sum(d * d, axis=(-1, -2))  # per-stream SSE


class DevicePipeline:
    """encode -> (wire bitstream via host pack) -> N-stream fan-out decode,
    all pixel work device-resident."""

    def __init__(self, config: Optional[CodecConfig] = None, **kw):
        if config is None:
            config = CodecConfig(**kw)
        self.config = config
        # pad dims to MB grid
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

    def pump_frame(self, emit_bitstream: bool = True) -> None:
        cfg = self.config
        qp = cfg.qp if cfg.qp is not None else 32
        t_in = time.perf_counter()
        y, u, v = sources.device_yuv_frame(self.w16, self.h16, self.frame_index)
        self.stats.on_input()

        # --- encode (device) ---
        symbols, recon = iframe.encode_iframe_rows(y, u, v, jnp.int32(qp))

        # --- fan-out decode (device): each stream decodes the access unit;
        # the batch IS the worker pool ---
        tiled = iframe.MBSymbols(
            *(jnp.repeat(x, cfg.streams, axis=0) for x in symbols)
        )
        dy, du, dv = iframe.decode_iframe_rows(tiled, jnp.int32(qp))
        sse = _psnr_sums(dy, jnp.repeat(y, cfg.streams, axis=0))
        jax.block_until_ready(sse)
        t_tpu = time.perf_counter()

        # --- wire bitstream: on-device CAVLC assembly; only the payload
        # bytes cross the host link (host does escaping + NAL framing) ---
        nbytes = 0
        if emit_bitstream:
            from ..entropy import device_pack

            streams, overflow = device_pack.assemble_iframe(
                symbols, self.sps, self.pps, qp
            )
            if overflow:  # adversarial content: host packer fallback
                streams = [self._host_pack(symbols, qp)]
            self.last_stream = streams[0]
            nbytes = len(self.last_stream)
        t_done = time.perf_counter()

        mse = float(np.asarray(sse[0]).sum()) / (self.w16 * self.h16)
        self.last_psnr_y = 99.0 if mse == 0 else 10 * np.log10(255.0**2 / mse)
        self.stats.on_encode(
            1, (t_tpu - t_in) * 1e3, 0.0, (t_done - t_tpu) * 1e3, nbytes
        )
        self.stats.on_decode(cfg.streams, (t_tpu - t_in) * 1e3)
        self.frame_index += 1

    def _host_pack(self, symbols, qp: int) -> bytes:
        """Symbol-download fallback path (overflow or no device entropy)."""
        flat = iframe.flatten_symbols(symbols)
        s, r, c = 1, self.h16 // 16, self.w16 // 16
        fields = iframe.unflatten_symbols_np(flat, s, r, c)
        n = r * c
        mb_info = np.ascontiguousarray(
            np.stack(
                [
                    fields["mode"].reshape(n),
                    fields["cmode"].reshape(n),
                    fields["cbp_luma"].reshape(n),
                    fields["cbp_chroma"].reshape(n),
                ],
                axis=1,
            ),
            np.int32,
        )
        return self._entropy.pack_iframe(
            mb_info,
            fields["luma_dc"].reshape(n, 16),
            fields["luma_ac"].reshape(n, 16, 16),
            fields["chroma_dc"].reshape(n, 2, 4),
            fields["chroma_ac"].reshape(n, 2, 4, 15),
            self.sps,
            self.pps,
            qp,
            slice_mode=self.config.slice_mode,
        )

    def run(self, duration_s: float = 5.0, warmup: int = 3) -> Dict[str, float]:
        for _ in range(warmup):
            self.pump_frame()
        self.stats.snapshot(self.config.streams)
        n = 0
        t0 = time.perf_counter()
        deadline = t0 + duration_s
        while time.perf_counter() < deadline:
            self.pump_frame()
            n += 1
        wall = time.perf_counter() - t0
        snap = self.stats.snapshot(self.config.streams)
        snap["frames"] = n
        snap["pipeline_fps"] = n / wall
        snap["frames_per_s_aggregate"] = n * self.config.streams / wall
        snap["psnr_y"] = self.last_psnr_y
        snap["stream_bytes"] = len(self.last_stream)
        return snap
