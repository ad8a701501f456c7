"""Rate control (CBR) -- the RC_BITRATE_MODE analog.

The reference requests RC_BITRATE_MODE at a fixed 1 Mbps from OpenH264
(/root/reference/openh264_wrapper.cpp:211-214, encoder_worker.js:96); the
codec interior that implements it lives here: a leaky-bucket (HRD/VBV)
model -- the buffer fills with each frame's bits and drains at the
target rate, with FINITE capacity -- plus a proportional term on the
instantaneous log-bit error.  The finite bucket is the point: an IDR
burst raises QP for the bucket's duration and then *releases* (the
round-2 controller integrated overshoot without bound and pinned at
QP 51 long after the stream was back under target).

Fixed-QP mode (config.qp set) bypasses the controller -- that is the
mode conformance tests use.
"""

from __future__ import annotations

import math

from .config import CodecConfig


class RateController:
    """Windowed-rate CBR controller with a small HRD bucket.

    The primary term tracks the achieved rate over a sliding 1-second
    window (one GOP at typical settings), so IDR bursts amortize the
    way the stream actually spends them instead of swamping an
    integrator and pinning QP at an extreme long after the rate is back
    on target (the round-2 failure mode).  A small leaky bucket
    (vbv_s deep, clamped) adds burst pressure for transients.  The QP
    accumulator is float so sub-step corrections integrate."""

    def __init__(self, config: CodecConfig, vbv_s: float = 0.5,
                 step_max: float = 1.5):
        self.config = config
        self.fps = max(config.fps, 1)
        self.target_bits = config.bitrate / self.fps  # per frame
        self.qp = config.qp if config.qp is not None else 34
        self._qp_f = float(self.qp)
        self.vbv_cap = max(config.bitrate * vbv_s, 1.0)
        self.buf = self.vbv_cap / 2.0  # start half-full (steady point)
        self.step_max = step_max
        self._window: list = []

    def current_qp(self) -> int:
        return int(self.qp)

    def update(self, frame_bytes: float) -> None:
        if self.config.qp is not None:
            return  # fixed-QP mode
        bits = frame_bytes * 8.0
        self._window.append(bits)
        if len(self._window) > self.fps:
            del self._window[0]
        rate = sum(self._window) * self.fps / len(self._window)
        self.buf = min(max(self.buf + bits - self.target_bits, 0.0),
                       self.vbv_cap)
        fullness = self.buf / self.vbv_cap
        err = math.log2(max(rate, 1.0) / max(self.config.bitrate, 1))
        # ~8 QP/s of correction at 2x rate error + mild burst pressure
        step = 8.0 * err / self.fps + 2.0 * (fullness - 0.5) / self.fps
        step = max(-self.step_max, min(self.step_max, step))
        self._qp_f = max(4.0, min(51.0, self._qp_f + step))
        self.qp = int(round(self._qp_f))
