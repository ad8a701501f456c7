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
