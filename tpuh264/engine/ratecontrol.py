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

    # a P frame whose bits exceed this multiple of the rolling P-frame
    # average is called a scene cut: inter prediction has collapsed, so
    # an IDR restart both recovers quality faster than P-coding the new
    # scene and resyncs any decoder (matters most under the RTC preset,
    # which never codes intra MBs inside P slices)
    SCENE_CUT_RATIO = 4.0

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
        self._p_avg_bits: float = 0.0  # rolling interior-P frame bits
        self.scene_cuts = 0

    def current_qp(self) -> int:
        return int(self.qp)

    def p_frame_is_scene_cut(self, frame_bytes: float) -> bool:
        """Report (and learn from) an interior P frame's size; True if
        the bits spike says the scene changed and the caller should
        force an IDR at the next opportunity.  Callers feed ONLY
        interior P frames (IDR access units are naturally large)."""
        bits = frame_bytes * 8.0
        if self._p_avg_bits <= 0.0:
            self._p_avg_bits = bits
            return False
        cut = bits > self.SCENE_CUT_RATIO * self._p_avg_bits
        if cut:
            self.scene_cuts += 1
        else:
            self._p_avg_bits = 0.9 * self._p_avg_bits + 0.1 * bits
        return cut

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
