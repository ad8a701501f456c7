"""Live per-stage metrics with the reference's exact semantics.

The reference keeps per-second windowed counters -- input FPS, average
output FPS (decoded frames / numStreams), per-frame encode ms, per-frame
copy ms, total+average decode ms -- reset every tick
(/root/reference/scripts/app.js:71-77,694-721).  Same metric set here,
plus drop counters from the frame ring and codec-quality metrics (PSNR,
bitrate) the reference lacks.
"""

from __future__ import annotations

import threading
import time
from typing import Dict


class StatsWindow:
    """Windowed counters; snapshot() aggregates and resets (1 s semantics)."""

    def __init__(self) -> None:
        self._lock = threading.Lock()
        self._reset()
        self._last_snapshot = time.monotonic()

    def _reset(self) -> None:
        self.input_frames = 0
        self.encoded_frames = 0
        self.decoded_frames = 0
        self.encode_ms = 0.0
        self.copy_ms = 0.0
        self.decode_ms = 0.0
        self.entropy_ms = 0.0
        self.dropped_capture = 0
        self.dropped_ring = 0
        self.dropped_decode = 0
        self.bytes_encoded = 0

    def on_input(self, n: int = 1) -> None:
        with self._lock:
            self.input_frames += n

    def on_encode(self, n: int, encode_ms: float, copy_ms: float,
                  entropy_ms: float, nbytes: int) -> None:
        with self._lock:
            self.encoded_frames += n
            self.encode_ms += encode_ms
            self.copy_ms += copy_ms
            self.entropy_ms += entropy_ms
            self.bytes_encoded += nbytes

    def on_decode(self, n: int, decode_ms: float) -> None:
        with self._lock:
            self.decoded_frames += n
            self.decode_ms += decode_ms

    def on_drop(self, where: str, n: int = 1) -> None:
        with self._lock:
            if where == "capture":
                self.dropped_capture += n
            elif where == "ring":
                self.dropped_ring += n
            else:
                self.dropped_decode += n

    def snapshot(self, num_streams: int = 1) -> Dict[str, float]:
        """Aggregate the window and reset (the reference's 1 s tick)."""
        with self._lock:
            now = time.monotonic()
            dt = max(now - self._last_snapshot, 1e-6)
            self._last_snapshot = now
            enc = max(self.encoded_frames, 1)
            dec = max(self.decoded_frames, 1)
            out = {
                "window_s": dt,
                "input_fps": self.input_frames / dt,
                "output_fps": self.decoded_frames / dt / max(num_streams, 1),
                "avg_encode_ms": self.encode_ms / enc,
                "avg_copy_ms": self.copy_ms / enc,
                "avg_entropy_ms": self.entropy_ms / enc,
                "total_decode_ms": self.decode_ms,
                "avg_decode_ms": self.decode_ms / dec,
                "bitrate_bps": self.bytes_encoded * 8 / dt,
                "dropped_capture": self.dropped_capture,
                "dropped_ring": self.dropped_ring,
                "dropped_decode": self.dropped_decode,
            }
            self._reset()
            return out
