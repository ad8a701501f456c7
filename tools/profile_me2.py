"""TPU per-piece timing of the restructured pframe kernel internals."""
import time

import jax
import jax.numpy as jnp
import numpy as np

import tpuh264.kernels.pframe as P

S, H, W = 4, 1088, 1920
R, C = H // 16, W // 16
rng = np.random.default_rng(0)
y = jnp.asarray(rng.integers(0, 256, (S, H, W), np.int32))
u = jnp.asarray(rng.integers(0, 256, (S, H // 2, W // 2), np.int32))
v = jnp.asarray(rng.integers(0, 256, (S, H // 2, W // 2), np.int32))
qp = jnp.int32(32)
print("backend:", jax.default_backend())


def timeit(name, fn, *args, n=5):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    print(f"{name:30s} {(time.perf_counter()-t0)/n*1e3:9.2f} ms")
    return out


planes = timeit("halfpel_planes", jax.jit(P.build_halfpel_planes), y)
bands = timeit(
    "luma_bands x4",
    jax.jit(lambda ps: [P._luma_bands(p, R, C) for p in ps]),
    planes,
)
lam = P._LAM_ME[32]
src_mbs = y.reshape(S, R, 16, C, 16).transpose(0, 1, 3, 2, 4)
src2 = y[:, ::2, ::2]
f_sad = jax.jit(lambda s2, g: P._sad_field(s2, g, lam, H, W))
iy0, ix0 = timeit("sad_field", f_sad, src2, planes[0])
f_ref = jax.jit(lambda b, s, a, bb: P._int_refine(b, s, a, bb, lam))
iy, ix = timeit("int_refine", f_ref, bands[0], src_mbs, iy0, ix0)
f_w2 = jax.jit(P._extract_w2)
w2 = timeit("extract_w2", f_w2, bands, iy, ix)
f_sub = jax.jit(lambda w, s, a, b: P._subpel_refine(w, s, a, b, lam))
mvx, mvy, sad, cost = timeit("subpel_refine(49)", f_sub, w2, src_mbs, iy, ix)
f_mc = jax.jit(P._mc_from_window)
pred = timeit("mc_from_window", f_mc, w2, mvy - 4 * (mvy >> 2),
              mvx - 4 * (mvx >> 2))
cp = P.SEARCH_PAD // 2 + 2
bu = jax.jit(lambda x: P._mb_bands(P._pad_ref(x, cp).astype(jnp.uint8), 8))(u)
f_cmc = jax.jit(P._mc_chroma_bands)
timeit("chroma bands", jax.jit(
    lambda x: P._mb_bands(P._pad_ref(x, cp).astype(jnp.uint8), 8)), u)
timeit("mc_chroma", f_cmc, bu, mvx, mvy)
f_tx = jax.jit(lambda s, p: P._transform_inter_luma(s, p, qp))
timeit("transform_inter_luma", f_tx, src_mbs, pred)

# full encode / decode for reference
enc = timeit("encode_pframe_rows", jax.jit(P.encode_pframe_rows),
             y, u, v, y, u, v, qp, n=3)
timeit("decode_pframe_rows", jax.jit(P.decode_pframe_rows),
       enc[0], y, u, v, qp, n=3)
