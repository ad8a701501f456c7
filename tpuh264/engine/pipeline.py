"""Multi-stream fan-out pipeline: 1 encoder -> bounded ring -> N decoders.

This is the reference's L6 orchestrator re-expressed for the TPU engine
(/root/reference/scripts/app.js:312-363,430-526): one encoder produces an
access unit per tick; the frame ring publishes it with refcount = number
of streams (the SAB fan-out, encoder_worker.js:189-191); every stream's
decoder consumes and releases its claim exactly once.  Stream->decoder
assignment is round-robin over the worker count (app.js:521), but on TPU
the workers collapse into ONE batched reconstruction call per tick --
the pool threads live inside the native entropy stage instead.

Keyframe recovery is routed correctly: any decoder raising
`needs_keyframe` triggers `encoder.force_key_frame()` (fixing the
reference's cross-worker no-op, SURVEY.md section 2 keyframe row).
"""

from __future__ import annotations

import time
from typing import Callable, Dict, List, Optional, Tuple

import numpy as np

from .config import CodecConfig
from .decoder import DecoderPool
from .encoder import EncoderSession
from .metrics import StatsWindow
from .ring import FrameRing
from . import sources


class Pipeline:
    """impl="tpu" (default) runs the TPU engine; impl="libav" runs the
    same loop on libx264/libavcodec host sessions -- the reference's
    selectable-backend axis (wasm vs webcodecs, app.js:271-279,616-692)
    so the harness can A/B both implementations end to end."""

    def __init__(self, config: Optional[CodecConfig] = None,
                 impl: str = "tpu", **kw):
        if config is None:
            config = CodecConfig(**kw)
        if config.streams > config.max_decoders:
            raise ValueError(
                f"streams {config.streams} > MAX_DECODERS {config.max_decoders}"
            )
        self.config = config
        self.impl = impl
        if impl == "libav":
            from . import libav_backend

            self.encoder = libav_backend.LibavEncoderSession(config)
            self.decoders = libav_backend.LibavDecoderPool(
                config.max_decoders)
        elif impl == "tpu":
            self.encoder = EncoderSession(config)
            self.decoders = DecoderPool(config.max_decoders)
        else:
            raise ValueError(f"unknown impl {impl!r}")
        for i in range(config.streams):
            self.decoders.init_decoder(i)
        self.ring = FrameRing(config.pool_size, config.max_frame_size)
        self.stats = StatsWindow()
        self.frame_index = 0
        self.last_outputs: Dict[int, Tuple[np.ndarray, np.ndarray, np.ndarray]] = {}

    def pump_frame(
        self, frame: Optional[Tuple[np.ndarray, np.ndarray, np.ndarray]] = None
    ) -> bool:
        """One tick of the pipeline (the requestVideoFrameCallback analog,
        app.js:590-614).  Returns False if the frame was dropped."""
        cfg = self.config
        if frame is None:
            frame = sources.yuv_frame(cfg.width, cfg.height, self.frame_index)
        self.frame_index += 1
        self.stats.on_input()

        encoded = self.encoder.encode_frame_yuv(*frame)[0]
        self.stats.on_encode(
            1,
            encoded.timings["encode_ms"],
            encoded.timings["copy_ms"],
            encoded.timings["entropy_ms"],
            len(encoded.data),
        )

        claim = self.ring.try_publish(encoded.data, fanout=cfg.streams)
        if claim is None:
            self.stats.on_drop("ring")
            return False
        slot, gen = claim

        # fan out: all streams decode the same access unit; one batched
        # TPU call replaces the reference's N worker round-trips
        t0 = time.perf_counter()
        data = self.ring.read(slot, gen)
        items = [(i, data) for i in range(cfg.streams)]
        try:
            results = self.decoders.decode_batch(items)
        finally:
            for i in range(cfg.streams):
                self.ring.release(slot, gen)  # exactly-once per consumer
        dt = (time.perf_counter() - t0) * 1e3
        self.stats.on_decode(cfg.streams, dt)
        self.last_outputs = results

        if any(
            self.decoders[i].needs_keyframe for i in range(cfg.streams)
        ):
            self.encoder.force_key_frame()
        return True

    def run(
        self,
        duration_s: float = 5.0,
        max_frames: Optional[int] = None,
        source: Optional[Callable[[int], tuple]] = None,
    ) -> Dict[str, float]:
        """Run the pipeline for a measurement window and return stats
        (the automation harness's 5 s protocol, automation.js:82-86)."""
        cfg = self.config
        end = time.monotonic() + duration_s
        n = 0
        while time.monotonic() < end:
            frame = source(self.frame_index) if source else None
            self.pump_frame(frame)
            n += 1
            if max_frames is not None and n >= max_frames:
                break
        snap = self.stats.snapshot(cfg.streams)
        snap["frames"] = n
        return snap
