"""Config system covering the reference's axes (SURVEY.md section 5).

The reference exposes three config tiers: URL params `impl/res/streams/
threads` (app.js:80-84), live dropdowns (resolutions 360p..1080p, streams
1-32, threads 1..hardwareConcurrency, app.js:99-118), and compile-time
constants (pool size 40, max frame 2MB, 32 decoders, 1 Mbps fixed
bitrate).  This dataclass covers all of them plus the codec-interior
knobs the reference delegates to OpenH264 (QP, GOP, slice mode).
"""

from __future__ import annotations

import dataclasses
import os
from typing import Dict, Optional, Tuple

# the reference's resolution ladder (app.js:99-104)
RESOLUTIONS: Dict[str, Tuple[int, int]] = {
    "360p": (640, 360),
    "480p": (854, 480),
    "720p": (1280, 720),
    "1080p": (1920, 1080),
}


@dataclasses.dataclass
class CodecConfig:
    width: int = 854
    height: int = 480
    fps: int = 30
    bitrate: int = 1_000_000  # reference: fixed 1 Mbps (encoder_worker.js:96)
    qp: Optional[int] = None  # fixed-QP mode; None = rate control active
    streams: int = 1  # 1..32 (app.js:106-108)
    threads: int = 0  # 0 = default policy (hardwareConcurrency-2, clamped)
    slice_mode: str = "rows"  # "rows" (parallel) | "single"
    deblock: bool = False  # in-loop deblocking (idc=2: within-slice)
    temporal_layers: int = 1  # 2 or 3 hierarchical-P layers (droppable)
    num_ref_frames: int = 1  # DPB depth; >1 = per-MB reference search
    intra44: bool = False  # enable Intra_4x4 trial on I frames (quality)
    # consider Intra_16x16 candidates inside P slices.  False = the RTC
    # speed preset (the reference runs LOW_COMPLEXITY with scene-change
    # detection off, openh264_wrapper.cpp:216-220): it removes the last
    # sequential column scan from the P encode, making the whole frame
    # one batched program on TPU; recovery relies on the GOP IDR cadence
    intra_in_p: bool = True
    cabac: bool = False  # CABAC entropy coding (Main profile; I frames)
    transform8x8: bool = False  # High profile 8x8 transform (needs cabac)
    gop_size: int = 30  # IDR interval
    profile: str = "baseline"
    # pool constants mirroring app.js:52-53 and openh264_wrapper.cpp:8
    pool_size: int = 40
    max_frame_size: int = 2 * 1024 * 1024
    max_decoders: int = 32

    @property
    def resolution_name(self) -> str:
        for name, (w, h) in RESOLUTIONS.items():
            if (w, h) == (self.width, self.height):
                return name
        return f"{self.width}x{self.height}"

    def effective_threads(self) -> int:
        """Reference thread policy: default = max(1, hardwareConcurrency-2),
        clamped to numStreams (app.js:440-459)."""
        hw = os.cpu_count() or 1
        n = self.threads if self.threads > 0 else max(1, hw - 2)
        return max(1, min(n, self.streams))

    @classmethod
    def from_params(cls, params: Dict[str, str]) -> "CodecConfig":
        """Build from `impl/res/streams/threads`-style params (app.js:80-84)."""
        cfg = cls()
        res = params.get("res", "480p")
        if res in RESOLUTIONS:
            cfg.width, cfg.height = RESOLUTIONS[res]
        elif "x" in res:
            w, h = res.split("x")
            cfg.width, cfg.height = int(w), int(h)
        cfg.streams = int(params.get("streams", 1))
        threads = params.get("threads", "default")
        cfg.threads = 0 if threads == "default" else int(threads)
        if "bitrate" in params:
            cfg.bitrate = int(params["bitrate"])
        if "qp" in params:
            cfg.qp = int(params["qp"])
        return cfg
