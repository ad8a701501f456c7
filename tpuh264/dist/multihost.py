"""Multi-host distribution: jax.distributed process groups (config 5).

The reference never leaves one machine -- its only scaling axis is a
worker pool in one browser (app.js:430-526).  The north star requires
scaling the codec across HOSTS: `jax.distributed` process groups where
each process owns a slice of the device mesh, stream/GOP sharding across
processes (the DCN axis), and row sharding with DPB halo exchange inside
and -- when the mesh is laid out that way -- across process boundaries.

This module is both a library (initialize + mesh builders + the
multi-process GOP encode step) and a runnable worker::

    python -m tpuh264.dist.multihost --process-id I --num-processes N \
        [--coordinator localhost:29800] [--rows-across-hosts]

Every process runs the same SPMD program over the global mesh; arrays
are placed shard-wise with jax.make_array_from_callback so no process
ever materializes another host's data.  On CPU (tests,
xla_force_host_platform_device_count) the collectives ride Gloo; on TPU
pods the same program rides ICI/DCN -- that substitution is the whole
point of expressing distribution through the mesh.

Verification strategy (SURVEY.md section 4 gap: the reference has no
multi-node story to test): tests/test_dist_multihost.py launches two of
these workers; each encodes an IPPP sequence over the 2-process mesh,
allgathers the reconstruction, and bit-compares against the local
unsharded oracle.  Bit-exactness across the process boundary proves the
DPB halo exchange crossed DCN correctly.
"""

from __future__ import annotations

import argparse
import json
import os
import time
from typing import Optional, Tuple

import numpy as np


def initialize(
    coordinator: str,
    num_processes: int,
    process_id: int,
    local_devices: int = 4,
    platform: str = "cpu",
) -> None:
    """Join the process group.  Must run before any other jax use.

    On CPU backends this forces `local_devices` virtual devices per
    process (the test topology); on TPU backends device count comes from
    the hardware and `local_devices` is ignored.
    """
    if platform == "cpu":
        os.environ["JAX_PLATFORMS"] = "cpu"
        flags = os.environ.get("XLA_FLAGS", "")
        if "xla_force_host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags
                + f" --xla_force_host_platform_device_count={local_devices}"
            ).strip()
    import jax

    if platform == "cpu":
        # the axon site hook may have pinned another platform
        jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )


def global_codec_mesh(rows_across_hosts: bool = False,
                      shape: Optional[Tuple[int, int]] = None):
    """(streams, rows) mesh over ALL processes' devices.

    rows_across_hosts=False: the streams axis spans processes (pure
    data parallelism over DCN, zero inter-host traffic -- the scaled-out
    form of the reference's stream pool).  True: the rows axis spans
    processes, so the P-step DPB halo `ppermute` crosses the host
    boundary -- reference rows page between hosts every frame (the
    north-star DPB-page-exchange pattern).

    `shape`: force the (streams, rows) mesh shape regardless of process
    count -- used for scaling measurements where the 1-process baseline
    must run the IDENTICAL global mesh/workload as the N-process run.
    """
    import jax
    from jax.sharding import Mesh

    devs = np.asarray(jax.devices())  # process-major order
    n = devs.size
    if rows_across_hosts:
        import jax as _j

        npro = _j.process_count()
        per = n // npro
        # rows axis = process-crossing pairs: shape (streams, rows) with
        # rows index striding across processes
        grid = devs.reshape(npro, per).T  # [per, npro]
        if shape is not None:
            grid = grid.reshape(shape)
        return Mesh(grid, ("streams", "rows"))
    grid = devs.reshape(jax.process_count(), n // jax.process_count())
    if shape is not None:
        grid = grid.reshape(shape)
    return Mesh(grid, ("streams", "rows"))


def place_global(mesh, arr: np.ndarray):
    """Shard a (deterministically reproducible) host array onto the
    global mesh without gathering it anywhere."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    sharding = NamedSharding(mesh, P("streams", "rows", None))
    return jax.make_array_from_callback(
        arr.shape, sharding, lambda idx: arr[idx]
    )


def run_gop_worker(
    coordinator: str,
    num_processes: int,
    process_id: int,
    rows_across_hosts: bool = True,
    width: int = 128,
    height: int = 64,
    qp: int = 30,
    bench_reps: int = 0,
    mesh_shape: Optional[Tuple[int, int]] = None,
) -> dict:
    """Encode I + 2 P frames over the global mesh and verify against the
    local unsharded oracle.  Returns a result dict (also used as the
    JSON the test reads)."""
    # 8 global virtual devices regardless of process count, so scaling
    # runs compare identical workloads (1 x 8dev vs 2 x 4dev)
    initialize(coordinator, num_processes, process_id,
               local_devices=max(1, 8 // num_processes))
    import jax
    import jax.numpy as jnp
    from jax.experimental import multihost_utils

    from ..engine import sources
    from ..kernels import iframe, pframe
    from . import mesh as dmesh

    mesh = global_codec_mesh(rows_across_hosts, shape=mesh_shape)
    s_shards, r_shards = mesh.devices.shape
    # halo implementation per topology: fused uint8 message pair only
    # when the rows axis actually crosses a process boundary (see
    # dist/mesh.py sharded_gop_step docstring); both are bit-identical
    rows_cross = rows_across_hosts and num_processes > 1
    i_fn, p_fn = dmesh.sharded_gop_step(mesh, fused_halo=rows_cross)

    # deterministic moving content, identical in every process
    def batch(t):
        frames = [
            sources.yuv_frame(width, height, t + 3 * si)
            for si in range(s_shards)
        ]
        return tuple(
            np.stack([f[i] for f in frames]).astype(np.int32)
            for i in range(3)
        )

    y0, u0, v0 = batch(0)
    seq = [batch(t) for t in range(1, 3)]

    ys, us, vs = (place_global(mesh, a) for a in (y0, u0, v0))
    sym_i, recon = i_fn(ys, us, vs, jnp.int32(qp))
    recs = [recon]
    for (y, u, v) in seq:
        yps, ups, vps = (place_global(mesh, a) for a in (y, u, v))
        sym_p, recon, motion = p_fn(
            yps, ups, vps, recs[-1][0], recs[-1][1], recs[-1][2],
            jnp.int32(qp),
        )
        recs.append(recon)

    # gather the final reconstruction to every process and compare with
    # the local single-process oracle (bit-exact across the DCN halo)
    got_y = multihost_utils.process_allgather(recs[-1][0], tiled=True)
    got_u = multihost_utils.process_allgather(recs[-1][1], tiled=True)

    _, ref = iframe.encode_iframe_rows(
        jnp.asarray(y0), jnp.asarray(u0), jnp.asarray(v0), jnp.int32(qp)
    )
    refs = [ref]
    for (y, u, v) in seq:
        _, ref, _ = pframe.encode_pframe_rows(
            jnp.asarray(y), jnp.asarray(u), jnp.asarray(v),
            refs[-1][0], refs[-1][1], refs[-1][2], jnp.int32(qp),
        )
        refs.append(ref)
    ok_y = bool(np.array_equal(np.asarray(got_y), np.asarray(refs[-1][0])))
    ok_u = bool(np.array_equal(np.asarray(got_u), np.asarray(refs[-1][1])))

    result = {
        "process_id": process_id,
        "processes": num_processes,
        "mesh": [int(s_shards), int(r_shards)],
        "rows_across_hosts": bool(rows_across_hosts),
        "fused_halo": bool(rows_cross),
        "bitexact": ok_y and ok_u,
    }

    if bench_reps:
        # scaling measurement: steady-state sharded P-step time
        yps, ups, vps = (place_global(mesh, a) for a in seq[-1])
        args = (yps, ups, vps, recs[-1][0], recs[-1][1], recs[-1][2],
                jnp.int32(qp))
        p_fn(*args)[1][0].block_until_ready()
        t0 = time.perf_counter()
        for _ in range(bench_reps):
            out = p_fn(*args)
        out[1][0].block_until_ready()
        result["p_step_ms"] = (time.perf_counter() - t0) / bench_reps * 1e3
    return result


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--coordinator", default="localhost:29800")
    ap.add_argument("--num-processes", type=int, required=True)
    ap.add_argument("--process-id", type=int, required=True)
    ap.add_argument("--rows-across-hosts", action="store_true")
    ap.add_argument("--width", type=int, default=128)
    ap.add_argument("--height", type=int, default=64)
    ap.add_argument("--bench-reps", type=int, default=0)
    ap.add_argument(
        "--mesh", default=None,
        help="force (streams, rows) mesh shape, e.g. 4x2 -- for scaling "
             "runs where 1-process and N-process must share the workload",
    )
    args = ap.parse_args()
    shape = None
    if args.mesh:
        s_, r_ = args.mesh.split("x")
        shape = (int(s_), int(r_))
    result = run_gop_worker(
        args.coordinator, args.num_processes, args.process_id,
        rows_across_hosts=args.rows_across_hosts,
        width=args.width, height=args.height, bench_reps=args.bench_reps,
        mesh_shape=shape,
    )
    print("MULTIHOST_RESULT " + json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
