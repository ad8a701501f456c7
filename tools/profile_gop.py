"""RTC-sim measurement: S x 1080p IPPP streams, device GOP pipeline.

BASELINE.json config 5 single-chip anchor (the multi-host sharding is
exercised in dist/; this measures the per-chip stream capacity).
"""
import json
import sys
import time

import jax

from tpuh264.engine import CodecConfig
from tpuh264.engine.devpipe import GOPDevicePipeline

streams = int(sys.argv[1]) if len(sys.argv) > 1 else 4
w, h = (1920, 1080) if len(sys.argv) < 3 else (int(sys.argv[2]), int(sys.argv[3]))
print("backend:", jax.default_backend(), "streams:", streams, f"{w}x{h}")

pipe = GOPDevicePipeline(
    CodecConfig(width=w, height=h, qp=32, streams=streams), gop_size=16
)
t0 = time.perf_counter()
pipe.pump_frame()
print("first dispatch (compile):", round(time.perf_counter() - t0, 1), "s")
snap = pipe.run(duration_s=10.0, warmup=2)
print(json.dumps({
    "metric": f"ippp_fps_{h}p_chip",
    "aggregate_fps": round(snap["frames_per_s_aggregate"], 2),
    "per_stream_fps": round(snap["frames_per_s_aggregate"] / streams, 2),
    "psnr_y": round(snap["psnr_y"], 2),
    "stream_bytes_last_frame": snap["stream_bytes"],
}))
