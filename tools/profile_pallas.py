"""Pallas pack_blocks vs XLA block_slots+pack_slots at the bench shape."""
import time

import numpy as np
import jax
import jax.numpy as jnp

from tpuh264.engine import sources
from tpuh264.kernels import cavlc_pallas, entropy_tpu as E, iframe
from tpuh264.core.params import PPS, SPS
from tpuh264.entropy import device_pack

w16, h16, K = 1920, 1088, 4
src = jax.jit(sources._device_source_frames(w16, h16, K))
qp = jnp.int32(32)
y, u, v = src(jnp.int32(0))
symbols, _ = jax.jit(iframe.encode_iframe_rows)(y, u, v, qp)
jax.block_until_ready(symbols)
s, r, c = symbols.mode.shape

# build the 27-chunk inputs exactly as encode_bits_iframe does
lac = symbols.luma_ac.astype(jnp.int32).reshape(s, r, c, 4, 4, 16)
cbp_l = symbols.cbp_luma.astype(jnp.int32)
cbp_c = symbols.cbp_chroma.astype(jnp.int32)
ac_nz = jnp.count_nonzero(lac[..., 1:], axis=-1)
nnz_y = jnp.where(cbp_l[..., None, None] == 1, ac_nz, 0)
nc_y = E._nc_luma_grid(nnz_y)
cac = symbols.chroma_ac.astype(jnp.int32)
cac_nz = jnp.count_nonzero(cac, axis=-1).reshape(s, r, c, 2, 2, 2)
nnz_u = jnp.where(cbp_c[..., None, None] == 2, cac_nz[..., 0, :, :], 0)
nnz_v = jnp.where(cbp_c[..., None, None] == 2, cac_nz[..., 1, :, :], 0)
nc_u = E._nc_chroma_grid(nnz_u)
nc_v = E._nc_chroma_grid(nnz_v)
dc_lv = symbols.luma_dc.astype(jnp.int32)
ac_vec = E._shift_ac(lac[..., 1:]).reshape(s, r, c, 16, 16)
ac_vec = ac_vec[..., E._BLK_SCAN_RASTER, :]
cdc = symbols.chroma_dc.astype(jnp.int32)
cdc_vec = jnp.pad(cdc, ((0, 0),) * 4 + ((0, 12),))
cac_vec = E._shift_ac(cac).reshape(s, r, c, 8, 16)
levels27 = jnp.concatenate([dc_lv[..., None, :], ac_vec, cdc_vec, cac_vec], axis=-2)
nc_flat = nc_y.reshape(s, r, c, 16)[..., E._BLK_SCAN_RASTER]
nc27 = jnp.concatenate(
    [nc_y[..., 0, 0][..., None], nc_flat, jnp.full((s, r, c, 2), -1),
     nc_u.reshape(s, r, c, 4), nc_v.reshape(s, r, c, 4)], axis=-1)
maxc27 = jnp.broadcast_to(
    jnp.asarray([16] + [15] * 16 + [4, 4] + [15] * 8), (s, r, c, 27))

mode = symbols.mode.astype(jnp.int32)
cmode = symbols.cmode.astype(jnp.int32)
mb_type = 1 + mode + 4 * cbp_c + 12 * cbp_l
h1l, h1v = E._ue_slot(mb_type)
h2l, h2v = E._ue_slot(cmode)
zeros3 = jnp.zeros((s, r, c, 27, 3), jnp.int32)
hdr_l = zeros3.at[..., 0, 0].set(h1l).at[..., 0, 1].set(h2l).at[..., 0, 2].set(1)
hdr_v = zeros3.at[..., 0, 0].set(h1v).at[..., 0, 1].set(h2v).at[..., 0, 2].set(1)

args = (levels27, nc27, maxc27, hdr_l, hdr_v)
jax.block_until_ready(args)


@jax.jit
def pallas_path(levels, nc, maxc, hl, hv):
    return cavlc_pallas.pack_blocks(levels, nc, maxc, hl, hv, 20, 3)


@jax.jit
def xla_path(levels, nc, maxc, hl, hv):
    sl, sv, _ = E.block_slots(levels, nc, maxc)
    sl = jnp.concatenate([hl, sl], axis=-1)
    sv = jnp.concatenate([hv, sv], axis=-1)
    return E.pack_slots(sl, sv, 20)


def timeit(name, fn, n=10):
    t0 = time.perf_counter()
    out = fn(*args)
    jax.block_until_ready(out)
    print(f"{name:32s} compile+1st {time.perf_counter()-t0:6.1f} s")
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    print(f"{name:32s} {(time.perf_counter()-t0)/n*1e3:8.2f} ms")
    return out


got = timeit("pallas pack_blocks", pallas_path)
ref = timeit("xla block+pack", xla_path)
np.testing.assert_array_equal(np.asarray(ref[1]), np.asarray(got[1]))
ok = np.asarray(ref[1]) <= 32 * 20
np.testing.assert_array_equal(np.asarray(ref[0])[ok], np.asarray(got[0])[ok])
print("BIT-EXACT on TPU at bench shape")
