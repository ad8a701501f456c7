"""TPU profile of the decode-from-bits GOP pipeline (round 2)."""
import time, sys
import numpy as np
import jax, os

cache_dir = os.path.join(os.path.dirname(__file__), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

from tpuh264.engine import CodecConfig
from tpuh264.engine.devpipe import GOPDevicePipeline

pipe = GOPDevicePipeline(
    CodecConfig(width=1920, height=1080, streams=4, qp=32), gop_size=16)
print("devices:", jax.devices(), flush=True)
for i in range(6):
    t0 = time.perf_counter()
    pipe.pump_frame()
    print(f"warm pump {i}: {(time.perf_counter()-t0)*1e3:.0f} ms  "
          f"caps={pipe._caps}", flush=True)
snap = pipe.run(duration_s=8.0, warmup=0)
print({k: (round(v, 2) if isinstance(v, float) else v)
       for k, v in snap.items()}, flush=True)
