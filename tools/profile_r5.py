"""Round-5 per-piece timing of the P-encode internals at 1080p S=4."""
import time

import jax
import jax.numpy as jnp
import numpy as np

import tpuh264.kernels.pframe as P
from tpuh264.kernels import deblock as kdeblock

S, H, W = 4, 1088, 1920
R, C = H // 16, W // 16
rng = np.random.default_rng(0)
y = jnp.asarray(rng.integers(0, 256, (S, H, W), np.int32))
u = jnp.asarray(rng.integers(0, 256, (S, H // 2, W // 2), np.int32))
v = jnp.asarray(rng.integers(0, 256, (S, H // 2, W // 2), np.int32))
qp = jnp.int32(32)
print("backend:", jax.default_backend(), flush=True)


def timeit(name, fn, *args, n=5):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    print(f"{name:30s} {(time.perf_counter()-t0)/n*1e3:9.2f} ms",
          flush=True)
    return out


lam = P._LAM_ME[32]
planes = timeit("halfpel_planes", jax.jit(P.build_halfpel_planes), y)
bands = timeit(
    "luma_bands x4",
    jax.jit(lambda ps: [P._luma_bands(p, R, C) for p in ps]),
    planes,
)
src_mbs = y.reshape(S, R, 16, C, 16).transpose(0, 1, 3, 2, 4)
src2 = y[:, ::2, ::2]
f_sad = jax.jit(lambda s2, g: P._sad_field(s2, g, H, W))
sads = timeit("sad_field", f_sad, src2, planes[0])
f_win = jax.jit(lambda s: P._int_winner(s, lam))
iy0, ix0, gy, gx = timeit("int_winner", f_win, sads)
gqx = (4 * gx)[:, None, None]
gqy = (4 * gy)[:, None, None]
f_ref = jax.jit(
    lambda b, s, a, bb, x, yy: P._int_refine(b, s, a, bb, lam, x, yy))
iy, ix = timeit("int_refine", f_ref, bands[0], src_mbs, iy0, ix0, gqx, gqy)
f_w2 = jax.jit(P._extract_w2)
w2 = timeit("extract_w2", f_w2, bands, iy, ix)
f_sub = jax.jit(
    lambda w, s, a, b, x, yy: P._subpel_refine(w, s, a, b, lam, x, yy))
mvx, mvy, sad, cost = timeit("subpel_refine(49)", f_sub, w2, src_mbs, iy,
                             ix, gqx, gqy)
cp = P.SEARCH_PAD // 2 + 2
bu = jax.jit(lambda p: P._mb_bands(
    P._pad_ref(p, cp).astype(jnp.uint8), 8))(u)
bv = jax.jit(lambda p: P._mb_bands(
    P._pad_ref(p, cp).astype(jnp.uint8), 8))(v)
f_mc = jax.jit(lambda bl, bu_, bv_, x, yy: P._mc_all(
    [bl], [bu_], [bv_], x, yy, 1, jnp.zeros_like(x)))
preds = timeit("mc_all", f_mc, bands, bu, bv, mvx, mvy)
f_tx = jax.jit(lambda s, p: P._transform_inter_luma(s, p, 32))
timeit("transform_inter_luma", f_tx, src_mbs, preds[0])
enc = timeit(
    "encode_pframe_rows(full)",
    jax.jit(lambda *a: P.encode_pframe_rows_multi(
        a[0], a[1], a[2], a[3][None], a[4][None], a[5][None], a[6],
        intra_in_p=False)),
    y, u, v, y, u, v, qp,
)
