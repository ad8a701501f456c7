"""Stage-level timing of the devpipe dispatch at the bench operating point."""
import time

import jax
import jax.numpy as jnp

from tpuh264.engine import CodecConfig
from tpuh264.engine import sources
from tpuh264.entropy import device_pack
from tpuh264.kernels import entropy_tpu, iframe
from tpuh264.core.params import PPS, SPS

cfg = CodecConfig(width=1920, height=1080, streams=4, qp=32)
w16, h16 = 1920, 1088
K = 4
sps, pps = SPS.for_size(1920, 1080), PPS()
src = jax.jit(sources._device_source_frames(w16, h16, K))
hdr_hw, hdr_len = device_pack.slice_headers_device(sps, pps, 32, 0, True, K)

enc = jax.jit(iframe.encode_iframe_rows)
dec = jax.jit(iframe.decode_iframe_rows)
ent = jax.jit(entropy_tpu.encode_bits_iframe)


def timeit(name, fn, *args, n=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n * 1e3
    print(f"{name:40s} {dt:8.2f} ms")
    return out


y, u, v = timeit("source (K=4 frames)", src, jnp.int32(0))
qp = jnp.int32(32)
symbols, recon = timeit("encode scan (K=4)", enc, y, u, v, qp)
_ = timeit("device entropy (K=4 x 68 slices)", ent, symbols, qp, hdr_hw, hdr_len)

tiled = iframe.MBSymbols(*(jnp.repeat(x, 4, axis=0) for x in symbols))
_ = timeit("decode scan (K*S=16)", dec, tiled, qp)

# full fused step for comparison
from tpuh264.engine.devpipe import DevicePipeline
pipe = DevicePipeline(cfg)
h = pipe._step(jnp.int32(0), qp, hdr_hw, hdr_len)
jax.block_until_ready(h)
t0 = time.perf_counter()
for _ in range(10):
    h = pipe._step(jnp.int32(0), qp, hdr_hw, hdr_len)
jax.block_until_ready(h)
print(f"{'full fused step':40s} {(time.perf_counter()-t0)/10*1e3:8.2f} ms")
