"""Rate control (CBR) -- the RC_BITRATE_MODE analog.

The reference requests RC_BITRATE_MODE at a fixed 1 Mbps from OpenH264
(/root/reference/openh264_wrapper.cpp:211-214, encoder_worker.js:96); the
codec interior that implements it lives here: a per-frame proportional
controller on log-bit error with a leaky virtual buffer, stepping QP by
at most +-3/frame (standard practice; every +6 QP halves bits).

Fixed-QP mode (config.qp set) bypasses the controller -- that is the mode
conformance tests use.
"""

from __future__ import annotations

import math

from .config import CodecConfig


class RateController:
    def __init__(self, config: CodecConfig):
        self.config = config
        self.target_bpf = config.bitrate / max(config.fps, 1)
        self.qp = config.qp if config.qp is not None else 34
        self.buffer_bits = 0.0  # virtual buffer fullness (bits over target)

    def current_qp(self) -> int:
        return int(self.qp)

    def update(self, frame_bytes: float) -> None:
        if self.config.qp is not None:
            return  # fixed-QP mode
        bits = frame_bytes * 8
        self.buffer_bits = max(0.0, self.buffer_bits + bits - self.target_bpf)
        # proportional on instantaneous error + pressure from buffer backlog
        err = math.log2(max(bits, 1.0) / max(self.target_bpf, 1.0))
        pressure = self.buffer_bits / max(self.target_bpf, 1.0)
        step = 3.0 * err / 6.0 + 0.5 * min(pressure, 4.0)
        step = max(-3.0, min(3.0, step))
        self.qp = int(round(max(4, min(51, self.qp + step))))
