"""Time encode_bits_iframe/pframe: xla vs pallas backend on the chip."""
import time

import jax
import jax.numpy as jnp

from tpuh264.core.params import PPS, SPS
from tpuh264.engine import sources
from tpuh264.entropy import device_pack
from tpuh264.kernels import entropy_tpu as E
from tpuh264.kernels import iframe, pframe

w16, h16, K = 1920, 1088, 4
sps, pps = SPS.for_size(1920, 1080), PPS()
src = jax.jit(sources._device_source_frames(w16, h16, K))
hdr_hw, hdr_len = device_pack.slice_headers_device(sps, pps, 32, 0, True, K)
qp = jnp.int32(32)
y, u, v = src(jnp.int32(0))
symbols, recon = jax.jit(iframe.encode_iframe_rows)(y, u, v, qp)
jax.block_until_ready(symbols)
print("backend:", jax.default_backend())


def timeit(name, fn, *args, n=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    print(f"{name:40s} {(time.perf_counter()-t0)/n*1e3:8.2f} ms")
    return out


for be in ("xla", "pallas"):
    f = jax.jit(lambda s, q, hw, hl, be=be: E.encode_bits_iframe(
        s, q, hw, hl, backend=be))
    o = timeit(f"encode_bits_iframe[{be}]", f, symbols, qp, hdr_hw, hdr_len)

ref = E.encode_bits_iframe(symbols, qp, hdr_hw, hdr_len, backend="xla")
got = E.encode_bits_iframe(symbols, qp, hdr_hw, hdr_len, backend="pallas")
import numpy as np
for a, b in zip(ref, got):
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
print("iframe bit-exact: OK")

# ---- P frame ----
ref_planes = tuple(r.astype(jnp.int32) for r in recon)
y1, u1, v1 = src(jnp.int32(1))
psym, _, _ = jax.jit(pframe.encode_pframe_rows)(
    y1, u1, v1, *ref_planes, qp)
jax.block_until_ready(psym)
from tpuh264.entropy.device_pack import SLICE_P
phdr_hw, phdr_len = device_pack.slice_headers_device(
    sps, pps, 32, 1, False, K, slice_type=SLICE_P)
for be in ("xla", "pallas"):
    f = jax.jit(lambda s, q, hw, hl, be=be: E.encode_bits_pframe(
        s, q, hw, hl, backend=be))
    o = timeit(f"encode_bits_pframe[{be}]", f, psym, qp, phdr_hw, phdr_len)

ref = E.encode_bits_pframe(psym, qp, phdr_hw, phdr_len, backend="xla")
got = E.encode_bits_pframe(psym, qp, phdr_hw, phdr_len, backend="pallas")
for a, b in zip(ref, got):
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
print("pframe bit-exact: OK")
