"""Per-stage timing of the GOP pipeline pieces at 1080p on TPU."""
import time

import jax
import jax.numpy as jnp

from tpuh264.engine import sources
from tpuh264.engine.devpipe import _deblock_i, _deblock_p
from tpuh264.kernels import iframe, pframe

S = 4
w16, h16 = 1920, 1088
src = jax.jit(sources._device_source_gop(w16, h16, 2, S))
y, u, v = src(jnp.int32(0))
y, u, v = (x.astype(jnp.int32) for x in (y, u, v))
qp = jnp.int32(32)
print("backend:", jax.default_backend())


def timeit(name, fn, *args, n=5):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    print(f"{name:36s} {(time.perf_counter()-t0)/n*1e3:9.2f} ms")
    return out


ei = jax.jit(iframe.encode_iframe_rows)
sym_i, recon = timeit("encode_iframe_rows", ei, y[0], u[0], v[0], qp)
sh = sym_i.mode.shape
dbi = jax.jit(lambda r, q: _deblock_i(r, sh, q))
ref = timeit("deblock_i", dbi, recon, qp)

ep = jax.jit(pframe.encode_pframe_rows)
sym, rec_p, motion = timeit("encode_pframe_rows", ep, y[1], u[1], v[1],
                            ref[0], ref[1], ref[2], qp)
dbp = jax.jit(_deblock_p)
timeit("deblock_p", dbp, rec_p, sym, motion, qp)

dp = jax.jit(pframe.decode_pframe_rows_multi)
timeit("decode_pframe_rows", dp, sym, ref[0][None], ref[1][None],
       ref[2][None], qp)

hp = jax.jit(pframe.build_halfpel_planes)
timeit("build_halfpel_planes", hp, ref[0])
