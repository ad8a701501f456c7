"""Time the fused GOP step variants directly at 1080p on TPU."""
import time

import jax
import jax.numpy as jnp

from tpuh264.engine import CodecConfig
from tpuh264.engine.devpipe import GOPDevicePipeline

S = 4
pipe = GOPDevicePipeline(
    CodecConfig(width=1920, height=1080, qp=32, streams=S), gop_size=16
)
qp = 32
print("backend:", jax.default_backend())

for pos, name in ((0, "start"), (1, "cont")):
    hdr_i, hdr_p = pipe._headers(pos, qp)
    dummy = jnp.zeros((0,), jnp.int32)
    hi = hdr_i if hdr_i is not None else (dummy, dummy)
    step = pipe._steps[pos == 0]
    args = (jnp.int32(0), jnp.int32(qp), pipe._dpb_enc, pipe._dpb_dec,
            hi[0], hi[1], hdr_p[0], hdr_p[1])
    t0 = time.perf_counter()
    out = step(*args)
    jax.block_until_ready(out)
    print(f"step[{name}] compile+run {time.perf_counter()-t0:8.1f} s")
    t0 = time.perf_counter()
    n = 3
    for _ in range(n):
        out = step(*args)
        jax.block_until_ready(out)
    print(f"step[{name}] steady      {(time.perf_counter()-t0)/n*1e3:8.1f} ms")
    # wire download cost
    t0 = time.perf_counter()
    import numpy as np
    w = np.asarray(out[2])
    print(f"wire download {w.nbytes/1e6:.1f} MB in "
          f"{(time.perf_counter()-t0)*1e3:.0f} ms")
