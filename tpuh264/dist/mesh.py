"""Device-mesh sharding of the codec (SURVEY.md section 2 parallelism table).

Two mesh axes map the codec's independence structure onto chips:

  * `streams` -- independent input streams (the reference's stream/data
    parallelism: round-robin worker assignment at app.js:351,521 becomes
    a sharded batch axis).
  * `rows` -- MB-row slices within a frame (the reference has nothing
    like this; it is BASELINE.json config 4's multi-slice parallel
    encode).  In row-slice mode MB rows share no state, so a frame's
    rows shard across chips with zero halo traffic; the per-frame
    bit/PSNR accounting is a `psum` over the mesh.

Single-slice wavefront mode (cross-row prediction) will add `ppermute`
halo exchange of slice-boundary rows -- the ICI pattern reserved for the
P-frame/DPB round (BASELINE.json north star).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..kernels import iframe


def make_codec_mesh(
    n_streams_shards: Optional[int] = None,
    n_row_shards: Optional[int] = None,
    devices=None,
) -> Mesh:
    """Build a (streams, rows) mesh over the available devices."""
    devices = np.asarray(devices if devices is not None else jax.devices())
    n = devices.size
    if n_streams_shards is None and n_row_shards is None:
        # favor stream parallelism (independent work, zero comms)
        n_streams_shards, n_row_shards = n, 1
    elif n_streams_shards is None:
        n_streams_shards = n // n_row_shards
    elif n_row_shards is None:
        n_row_shards = n // n_streams_shards
    assert n_streams_shards * n_row_shards == n, (n_streams_shards, n_row_shards, n)
    return Mesh(
        devices.reshape(n_streams_shards, n_row_shards), ("streams", "rows")
    )


def sharded_encode_step(mesh: Mesh):
    """Return a pjit-ed encode step sharded over (streams, rows).

    Input planes [S, H, W] shard as P('streams', 'rows', None): each chip
    encodes its own streams' own row band.  Row-slices make the bands
    independent, so XLA inserts no collectives in the hot loop; the
    summary statistics (total bits proxy, sum of |levels|) are explicit
    `psum`s over the mesh -- the per-frame accounting rate control needs.
    """

    def step(y, u, v, qp):
        symbols, recon = iframe.encode_iframe_rows(y, u, v, qp)
        level_l1 = (
            jnp.abs(symbols.luma_dc).sum()
            + jnp.abs(symbols.luma_ac).sum()
            + jnp.abs(symbols.chroma_dc).sum()
            + jnp.abs(symbols.chroma_ac).sum()
        )
        nonzero = (
            (symbols.luma_dc != 0).sum()
            + (symbols.luma_ac != 0).sum()
            + (symbols.chroma_dc != 0).sum()
            + (symbols.chroma_ac != 0).sum()
        )
        stats = jax.lax.psum(
            jnp.stack([level_l1, nonzero]).astype(jnp.int32), ("streams", "rows")
        )
        return symbols, recon, stats

    plane = P("streams", "rows", None)
    sym3 = P("streams", "rows", None)
    specs_symbols = iframe.MBSymbols(
        mode=sym3,
        cmode=sym3,
        cbp_luma=sym3,
        cbp_chroma=sym3,
        luma_dc=P("streams", "rows", None, None),
        luma_ac=P("streams", "rows", None, None, None),
        chroma_dc=P("streams", "rows", None, None, None),
        chroma_ac=P("streams", "rows", None, None, None, None),
        i4modes=P("streams", "rows", None, None),
    )
    out_specs = (specs_symbols, (plane, plane, plane), P())
    fn = shard_map(
        step,
        mesh=mesh,
        in_specs=(plane, plane, plane, P()),
        out_specs=out_specs,
        check_rep=False,
    )
    return jax.jit(fn)


def shard_inputs(mesh: Mesh, y, u, v):
    """Place host arrays with the (streams, rows) sharding."""
    spec = NamedSharding(mesh, P("streams", "rows", None))
    return (
        jax.device_put(y, spec),
        jax.device_put(u, spec),
        jax.device_put(v, spec),
    )


def _halo_extend(plane, halo: int, axis_name: str):
    """Vertically extend a row-sharded plane with neighbor rows over ICI.

    plane [S, H_loc, W] per shard.  Each shard receives the bottom `halo`
    rows of the shard above and the top `halo` rows of the shard below
    (two `ppermute`s -- the DPB page exchange of the BASELINE north
    star).  Edge shards get edge-replicated rows instead, matching the
    normative Clip3 sample clamp, so the extended reference is exactly
    what the unsharded kernel sees."""
    n = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)
    top_rows = plane[:, :halo]       # my top rows -> neighbor above's tail
    bot_rows = plane[:, -halo:]      # my bottom rows -> neighbor below's head
    if n > 1:
        from_above = jax.lax.ppermute(
            bot_rows, axis_name, [(i, i + 1) for i in range(n - 1)]
        )
        from_below = jax.lax.ppermute(
            top_rows, axis_name, [(i + 1, i) for i in range(n - 1)]
        )
    else:
        from_above = jnp.zeros_like(bot_rows)
        from_below = jnp.zeros_like(top_rows)
    edge_top = jnp.repeat(plane[:, :1], halo, axis=1)
    edge_bot = jnp.repeat(plane[:, -1:], halo, axis=1)
    head = jnp.where(idx > 0, from_above, edge_top)
    tail = jnp.where(idx < n - 1, from_below, edge_bot)
    return jnp.concatenate([head, plane, tail], axis=1)


def _halo_extend_yuv(ry, ru, rv, halo_y: int, halo_c: int, axis_name: str):
    """Fused DPB halo exchange of all three reference planes.

    One uint8 message pair per step instead of three int32 pairs: the
    reference samples are 8-bit, and the three planes' boundary rows
    pack into a single [S, halo_y*W + 2*halo_c*(W/2)] buffer -- 4x less
    wire volume and 1/3 the message count on the rows axis (ICI on
    chips; Gloo/DCN across hosts).  Returns the three vertically
    extended int32 planes, bit-identical to per-plane _halo_extend."""
    n = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)
    s = ry.shape[0]
    w = ry.shape[2]
    wc = ru.shape[2]

    def pack(py, pu, pv):
        return jnp.concatenate(
            [py.astype(jnp.uint8).reshape(s, -1),
             pu.astype(jnp.uint8).reshape(s, -1),
             pv.astype(jnp.uint8).reshape(s, -1)],
            axis=1,
        )

    def unpack(buf):
        oy = halo_y * w
        oc = halo_c * wc
        return (
            buf[:, :oy].reshape(s, halo_y, w).astype(jnp.int32),
            buf[:, oy:oy + oc].reshape(s, halo_c, wc).astype(jnp.int32),
            buf[:, oy + oc:].reshape(s, halo_c, wc).astype(jnp.int32),
        )

    top = pack(ry[:, :halo_y], ru[:, :halo_c], rv[:, :halo_c])
    bot = pack(ry[:, -halo_y:], ru[:, -halo_c:], rv[:, -halo_c:])
    if n > 1:
        from_above = jax.lax.ppermute(
            bot, axis_name, [(i, i + 1) for i in range(n - 1)]
        )
        from_below = jax.lax.ppermute(
            top, axis_name, [(i + 1, i) for i in range(n - 1)]
        )
    else:
        from_above = jnp.zeros_like(bot)
        from_below = jnp.zeros_like(top)
    ay, au, av = unpack(from_above)
    by, bu, bv = unpack(from_below)

    def ext(plane, head, tail, halo):
        edge_top = jnp.repeat(plane[:, :1], halo, axis=1)
        edge_bot = jnp.repeat(plane[:, -1:], halo, axis=1)
        head = jnp.where(idx > 0, head, edge_top)
        tail = jnp.where(idx < n - 1, tail, edge_bot)
        return jnp.concatenate([head, plane.astype(jnp.int32), tail],
                               axis=1)

    return (
        ext(ry, ay, by, halo_y),
        ext(ru, au, bu, halo_c),
        ext(rv, av, bv, halo_c),
    )


def sharded_gop_step(mesh: Mesh, fused_halo: bool = True):
    """pjit-ed (I, P) encode steps over a (streams, rows) mesh with a
    row-sharded device-resident DPB.

    Returns (i_step, p_step):
      i_step(y, u, v, qp) -> (symbols, recon)
      p_step(y, u, v, ry, ru, rv, qp) -> (symbols, recon, motion)
    where every plane (input, recon, reference) carries the
    P('streams', 'rows', None) sharding.  The P step exchanges
    HALO_Y/HALO_C reference rows with neighbor shards via `ppermute`
    before motion search -- inter prediction crosses shard boundaries
    exactly as in the unsharded kernel (tests enforce bit equality).

    `fused_halo` selects the halo-exchange implementation, which is a
    pure performance choice (both are bit-identical): the fused uint8
    single-message form wins when the rows axis crosses a process
    boundary (DCN/Gloo charges per message and per byte), while the
    plain per-plane form wins in-process, where the pack/unpack
    shuffles cost more than the three cheap local permutes they save.
    Callers that know the topology (dist/multihost.py) pass
    fused_halo = (rows axis spans processes)."""
    from ..kernels import pframe

    plane = P("streams", "rows", None)
    sym3 = P("streams", "rows", None)

    def i_step(y, u, v, qp):
        return iframe.encode_iframe_rows(y, u, v, qp)

    def p_step(y, u, v, ry, ru, rv, qp):
        if fused_halo:
            ry_ext, ru_ext, rv_ext = _halo_extend_yuv(
                ry.astype(jnp.int32), ru.astype(jnp.int32),
                rv.astype(jnp.int32), pframe.HALO_Y, pframe.HALO_C,
                "rows",
            )
        else:
            ry_ext = _halo_extend(
                ry.astype(jnp.int32), pframe.HALO_Y, "rows")
            ru_ext = _halo_extend(
                ru.astype(jnp.int32), pframe.HALO_C, "rows")
            rv_ext = _halo_extend(
                rv.astype(jnp.int32), pframe.HALO_C, "rows")
        return pframe.encode_pframe_rows_multi(
            y, u, v, ry_ext[None], ru_ext[None], rv_ext[None], qp,
            halo=True, axis_name="rows",
        )

    specs_i = iframe.MBSymbols(
        mode=sym3, cmode=sym3, cbp_luma=sym3, cbp_chroma=sym3,
        luma_dc=P("streams", "rows", None, None),
        luma_ac=P("streams", "rows", None, None, None),
        chroma_dc=P("streams", "rows", None, None, None),
        chroma_ac=P("streams", "rows", None, None, None, None),
        i4modes=P("streams", "rows", None, None),
    )
    specs_p = pframe.MBSymbolsP(
        kind=sym3, mode=sym3, cmode=sym3, cbp_luma=sym3, cbp_chroma=sym3,
        mvdx=sym3, mvdy=sym3,
        luma_dc=P("streams", "rows", None, None),
        luma_ac=P("streams", "rows", None, None, None),
        chroma_dc=P("streams", "rows", None, None, None),
        chroma_ac=P("streams", "rows", None, None, None, None),
        refidx=sym3,
        t8=sym3,
    )
    i_fn = jax.jit(shard_map(
        i_step, mesh=mesh,
        in_specs=(plane, plane, plane, P()),
        out_specs=(specs_i, (plane, plane, plane)),
        check_rep=False,
    ))
    p_fn = jax.jit(shard_map(
        p_step, mesh=mesh,
        in_specs=(plane,) * 6 + (P(),),
        out_specs=(specs_p, (plane, plane, plane), (sym3, sym3)),
        check_rep=False,
    ))
    return i_fn, p_fn
