"""Mesh sharding: results must be identical to the unsharded encoder."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tpuh264.dist import make_codec_mesh, sharded_encode_step
from tpuh264.dist.mesh import shard_inputs
from tpuh264.engine import sources
from tpuh264.kernels import iframe

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 (virtual) devices"
)


def _batch(s, h, w):
    frames = [sources.yuv_frame(w, h, t) for t in range(s)]
    return (
        np.stack([f[0] for f in frames]).astype(np.int32),
        np.stack([f[1] for f in frames]).astype(np.int32),
        np.stack([f[2] for f in frames]).astype(np.int32),
    )


def test_streams_by_rows_mesh_matches_single_device():
    mesh = make_codec_mesh(4, 2)
    assert mesh.devices.shape == (4, 2)
    y, u, v = _batch(4, 64, 64)  # 4 streams, 4 MB rows (2 per shard)
    step = sharded_encode_step(mesh)
    with mesh:
        ys, us, vs = shard_inputs(mesh, y, u, v)
        symbols, recon, stats = step(ys, us, vs, jnp.int32(30))
    ref_symbols, ref_recon = iframe.encode_iframe_rows(y, u, v, jnp.int32(30))
    np.testing.assert_array_equal(np.asarray(recon[0]), np.asarray(ref_recon[0]))
    np.testing.assert_array_equal(
        np.asarray(symbols.luma_dc), np.asarray(ref_symbols.luma_dc)
    )
    np.testing.assert_array_equal(
        np.asarray(symbols.luma_ac), np.asarray(ref_symbols.luma_ac)
    )
    # psum accounting over the mesh equals global sums
    ref_nz = sum(
        int(np.count_nonzero(np.asarray(x)))
        for x in (ref_symbols.luma_dc, ref_symbols.luma_ac,
                  ref_symbols.chroma_dc, ref_symbols.chroma_ac)
    )
    assert int(stats[1]) == ref_nz


def test_streams_only_mesh():
    mesh = make_codec_mesh(8, 1)
    y, u, v = _batch(8, 32, 48)
    step = sharded_encode_step(mesh)
    with mesh:
        ys, us, vs = shard_inputs(mesh, y, u, v)
        symbols, recon, stats = step(ys, us, vs, jnp.int32(26))
    ref_symbols, _ = iframe.encode_iframe_rows(y, u, v, jnp.int32(26))
    np.testing.assert_array_equal(
        np.asarray(symbols.luma_dc), np.asarray(ref_symbols.luma_dc)
    )


def test_sharded_gop_halo_exchange_bit_exact():
    """Row-sharded IPPP over the mesh: the P step exchanges reference
    halos via ppermute; output must be bit-identical to the unsharded
    kernels (inter prediction crossing shard boundaries correctly)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P
    from tpuh264.dist import mesh as dmesh
    from tpuh264.kernels import iframe, pframe
    from tests.test_golden_pframe import moving_sequence

    mesh = dmesh.make_codec_mesh(2, 4)  # 2 stream shards x 4 row shards
    i_fn, p_fn = dmesh.sharded_gop_step(mesh)

    frames = moving_sequence(128, 64, 3, seed=7)  # 8 MB rows / 4 shards
    y0 = np.stack([frames[0][0], frames[1][0]])  # 2 streams
    u0 = np.stack([frames[0][1], frames[1][1]])
    v0 = np.stack([frames[0][2], frames[1][2]])
    y1 = np.stack([frames[1][0], frames[2][0]])
    u1 = np.stack([frames[1][1], frames[2][1]])
    v1 = np.stack([frames[1][2], frames[2][2]])

    ys, us, vs = dmesh.shard_inputs(mesh, y0, u0, v0)
    sym_i, recon = i_fn(ys, us, vs, jnp.int32(30))
    # unsharded oracle
    sym_i0, recon0 = iframe.encode_iframe_rows(
        jnp.asarray(y0, jnp.int32), jnp.asarray(u0, jnp.int32),
        jnp.asarray(v0, jnp.int32), jnp.int32(30))
    np.testing.assert_array_equal(np.asarray(recon[0]), np.asarray(recon0[0]))

    y1s, u1s, v1s = dmesh.shard_inputs(mesh, y1, u1, v1)
    sym_p, recon_p, motion = p_fn(
        y1s, u1s, v1s, recon[0], recon[1], recon[2], jnp.int32(30))
    sym_p0, recon_p0, motion0 = pframe.encode_pframe_rows(
        jnp.asarray(y1, jnp.int32), jnp.asarray(u1, jnp.int32),
        jnp.asarray(v1, jnp.int32),
        recon0[0], recon0[1], recon0[2], jnp.int32(30))
    np.testing.assert_array_equal(
        np.asarray(recon_p[0]), np.asarray(recon_p0[0]))
    np.testing.assert_array_equal(
        np.asarray(recon_p[1]), np.asarray(recon_p0[1]))
    for a, b in zip(sym_p, sym_p0):
        if a is None or b is None:
            continue
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # MVs must actually cross shard boundaries for the test to mean much
    assert np.abs(np.asarray(motion[1])).max() > 0
