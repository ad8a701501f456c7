"""Live application orchestrator: the reference's `window.app` analog.

The reference exposes a lifecycle + automation API on a RUNNING pipeline
-- start, stop, getStats, setImplementation, setResolution, setStreams,
setThreads, isProcessing (/root/reference/scripts/app.js:827-839) -- with
a graceful two-phase worker shutdown handshake (app.js:158-195) and a
restart-on-reconfigure policy for the live controls (app.js:791-799).

This module provides the same surface for the TPU engine:

* `App.start()` spawns a pump thread that paces the selected pipeline at
  the configured capture rate (the requestVideoFrameCallback analog,
  app.js:590-614).
* `App.stop()` is the two-phase teardown: phase 1 signals the pump loop
  and waits for the in-flight tick to retire (the `cleanup` /
  `cleanup_done` handshake, encoder_worker.js:60-77); phase 2 releases
  codec sessions.  Idempotent, like the reference's stop() (app.js:198).
* `set_implementation/set_resolution/set_streams/set_threads` mirror the
  reference's behavior exactly: changing a control while running
  restarts the pipeline with the new configuration (app.js:791-799).
* Capture backpressure: when the pump falls behind the capture clock by
  more than the frame-pool budget, source frames are DROPPED and
  counted (`dropped_capture`), the encoder-busy drop policy of
  encoder_worker.js:80-88 applied to the fast path.
* `request_keyframe()` routes to the encoder owner (App holds it), fixing
  the reference's cross-worker no-op (SURVEY.md section 2 keyframe row).
"""

from __future__ import annotations

import threading
import time
from typing import Dict, Optional

from .config import RESOLUTIONS, CodecConfig

IMPLEMENTATIONS = ("tpu_gop", "tpu", "libav")


class App:
    """Lifecycle owner for one running pipeline.

    impl:
      "tpu_gop" -- the flagship device IPPP pipeline with decode-from-
                   bits (engine/devpipe.py GOPDevicePipeline);
      "tpu"     -- per-frame session pipeline (engine/pipeline.py), all
                   codec features (CABAC, SVC, multi-ref, rate control);
      "libav"   -- libx264/libavcodec host sessions (the WebCodecs
                   platform-codec analog, app.js:616-692).
    """

    def __init__(self, config: Optional[CodecConfig] = None,
                 impl: str = "tpu_gop", source_kind: str = "moving_gradient",
                 **kw):
        self.config = config if config is not None else CodecConfig(**kw)
        if impl not in IMPLEMENTATIONS:
            raise ValueError(f"unknown impl {impl!r}")
        self.impl = impl
        self.source_kind = source_kind
        self.pipeline = None
        self._thread: Optional[threading.Thread] = None
        self._stop_evt = threading.Event()
        self._tick_done = threading.Event()
        self._lock = threading.RLock()
        self._force_keyframe = False
        self.processing = False
        self.last_stats: Dict[str, float] = {}

    # -- lifecycle -------------------------------------------------------

    def _build(self):
        import dataclasses

        cfg = dataclasses.replace(self.config)  # pipeline owns its copy
        if self.impl == "tpu_gop":
            from .devpipe import GOPDevicePipeline

            k = GOPDevicePipeline.FRAMES_PER_DISPATCH
            gop = max(k, cfg.gop_size // k * k)
            return GOPDevicePipeline(
                cfg, gop_size=gop, source_kind=self.source_kind
            )
        from .pipeline import Pipeline

        return Pipeline(cfg, impl=self.impl)

    def start(self) -> None:
        """Build the pipeline and begin pumping (app.js:240-290)."""
        with self._lock:
            self.stop()  # idempotent teardown first (app.js:241)
            self.pipeline = self._build()
            self._stop_evt.clear()
            self._tick_done.clear()
            self.processing = True
            self._thread = threading.Thread(
                target=self._pump_loop, name="tpuh264-pump", daemon=True
            )
            self._thread.start()

    def stop(self) -> None:
        """Two-phase graceful teardown (app.js:158-195, 198-238)."""
        with self._lock:
            thread = self._thread
            if thread is None:
                return
            # phase 1: signal, then wait for the in-flight tick to retire
            self._stop_evt.set()
            thread.join(timeout=120.0)
            self._thread = None
            self.processing = False
            # phase 2: release codec/session state
            pipe = self.pipeline
            self.pipeline = None
            if pipe is not None and hasattr(pipe, "decoders"):
                for i in range(self.config.streams):
                    try:
                        pipe.decoders.deinit_decoder(i)
                    except Exception:
                        pass

    def is_processing(self) -> bool:
        return self.processing

    # -- pump loop -------------------------------------------------------

    def _pump_loop(self) -> None:
        cfg = self.config
        frame_dt = 1.0 / max(cfg.fps, 1)
        pool_budget = cfg.pool_size  # frames of backlog before dropping
        produced = 0
        t0 = time.monotonic()
        pipe = self.pipeline
        is_gop = hasattr(pipe, "FRAMES_PER_DISPATCH")
        step = pipe.FRAMES_PER_DISPATCH if is_gop else 1
        while not self._stop_evt.is_set():
            if self._force_keyframe:
                self._force_keyframe = False
                if is_gop:
                    pipe.force_idr()
                else:
                    pipe.encoder.force_key_frame()
            pipe.pump_frame()
            produced += step
            # capture-clock pacing + busy-drop backpressure: if encoding
            # lags the capture rate by more than the pool budget, drop
            # source frames instead of queueing them without bound
            # (encoder_worker.js:80-88,177-183)
            due = (time.monotonic() - t0) / frame_dt
            behind = due - produced
            if behind > pool_budget:
                ndrop = int(behind - pool_budget) + 1
                if is_gop:
                    pipe.drop_frames(ndrop)
                else:
                    pipe.stats.on_drop("capture", ndrop)
                    pipe.frame_index += ndrop
                produced += ndrop
            elif behind < 0:
                time.sleep(min(-behind * frame_dt, 0.25))
        self._tick_done.set()

    # -- stats + automation API (app.js:827-839) -------------------------

    def get_stats(self) -> Dict[str, float]:
        pipe = self.pipeline
        if pipe is None:
            return dict(self.last_stats)
        snap = pipe.stats.snapshot(self.config.streams)
        snap["impl"] = self.impl
        snap["resolution"] = self.config.resolution_name
        snap["streams"] = self.config.streams
        snap["threads"] = self.config.effective_threads()
        if hasattr(pipe, "last_psnr_y"):
            snap["psnr_y"] = pipe.last_psnr_y
        self.last_stats = snap
        return snap

    def request_keyframe(self, stream_index: int = 0) -> None:
        """Decoder-side recovery request, routed to the encoder owner."""
        self._force_keyframe = True

    def _reconfigure(self, **changes) -> None:
        """Apply config changes; restart if running (app.js:791-799).

        Teardown happens BEFORE the mutation: the running pump thread
        reads self.config, so changing it first would hand a live
        pipeline a config its arrays were not built for."""
        with self._lock:
            running = self._thread is not None
            if running:
                self.stop()
            for k, v in changes.items():
                setattr(self.config, k, v)
            if running:
                self.start()

    def set_implementation(self, impl: str) -> None:
        if impl not in IMPLEMENTATIONS:
            raise ValueError(f"unknown impl {impl!r}")
        with self._lock:
            running = self._thread is not None
            self.impl = impl
            if running:
                self.start()

    def set_resolution(self, res: str) -> None:
        if res in RESOLUTIONS:
            w, h = RESOLUTIONS[res]
        else:
            ws, hs = res.split("x")
            w, h = int(ws), int(hs)
        self._reconfigure(width=w, height=h)

    def set_streams(self, n: int) -> None:
        if not 1 <= n <= self.config.max_decoders:
            raise ValueError(f"streams must be 1..{self.config.max_decoders}")
        self._reconfigure(streams=n)

    def set_threads(self, n: int) -> None:
        self._reconfigure(threads=n)
