"""Sub-stage timing of the device entropy path at the bench point."""
import time

import jax
import jax.numpy as jnp

from tpuh264.engine import sources
from tpuh264.entropy import device_pack
from tpuh264.kernels import entropy_tpu as E
from tpuh264.kernels import iframe
from tpuh264.core.params import PPS, SPS

w16, h16, K = 1920, 1088, 4
sps, pps = SPS.for_size(1920, 1080), PPS()
src = jax.jit(sources._device_source_frames(w16, h16, K))
hdr_hw, hdr_len = device_pack.slice_headers_device(sps, pps, 32, 0, True, K)
qp = jnp.int32(32)
y, u, v = src(jnp.int32(0))
symbols, _ = jax.jit(iframe.encode_iframe_rows)(y, u, v, qp)
jax.block_until_ready(symbols)
s, r, c = symbols.mode.shape
print(f"S={s} R={r} C={c}")


def timeit(name, fn, *args, n=10, static=()):
    f = jax.jit(fn, static_argnums=static)
    out = f(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(*args)
    jax.block_until_ready(out)
    print(f"{name:44s} {(time.perf_counter()-t0)/n*1e3:8.2f} ms")
    return out


# stage 1+2: block slots over 27 chunks (reproduce encode_bits_iframe prologue)
def slots_stage(symbols):
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
    levels27 = jnp.concatenate(
        [dc_lv[..., None, :], ac_vec, cdc_vec, cac_vec], axis=-2
    )
    nc_flat = nc_y.reshape(s, r, c, 16)[..., E._BLK_SCAN_RASTER]
    nc27 = jnp.concatenate(
        [nc_y[..., 0, 0][..., None], nc_flat, jnp.full((s, r, c, 2), -1),
         nc_u.reshape(s, r, c, 4), nc_v.reshape(s, r, c, 4)], axis=-1)
    maxc27 = jnp.asarray([16] + [15] * 16 + [4, 4] + [15] * 8)
    sl27, sv27, _ = E.block_slots(levels27, nc27, maxc27)
    return sl27, sv27


sl27, sv27 = timeit("block_slots (27 chunks/MB)", slots_stage, symbols)
jax.block_until_ready((sl27, sv27))

zeros3 = jnp.zeros((s, r, c, 27, 3), jnp.int32)
sl = jnp.concatenate([zeros3, sl27], -1)
sv = jnp.concatenate([zeros3, sv27], -1)

chunks = timeit("pack_slots -> BLOCK_W=20", E.pack_slots, sl, sv, E.BLOCK_W, static=(2,))
chunks_hw, chunks_bits = chunks

mb = timeit("tree_merge chunks -> MB_W=128", E.tree_merge, chunks_hw, chunks_bits, E.MB_W, static=(2,))
mb_hw, mb_bits = mb

hdr_pad = jnp.pad(hdr_hw, ((0, 0), (0, 0), (0, E.MB_W - hdr_hw.shape[-1])))
slice_chunks = jnp.concatenate([hdr_pad[..., None, :], mb_hw], axis=-2)
slice_bits_in = jnp.concatenate([hdr_len[..., None], mb_bits], axis=-1)

_ = timeit("slice merge -> SLICE_W=8192", E._finish_slices, slice_chunks, slice_bits_in, s, r, static=(2,3))

print("mb_bits max:", int(jnp.max(mb_bits)), "slice bits max:",
      int(jnp.max(jnp.sum(slice_bits_in, -1))))
