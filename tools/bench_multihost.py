"""2-host scaling-efficiency measurement (BASELINE north star: >= 80%).

Runs the sharded IPPP GOP P-step on an 8-device virtual CPU mesh twice
with the IDENTICAL global mesh shape and workload:

  1. one process owning all 8 devices (no DCN; in-process collectives);
  2. two jax.distributed processes x 4 devices with the rows axis
     spanning the process boundary, so the per-frame DPB halo
     `ppermute` crosses Gloo (the CPU stand-in for DCN).

Efficiency = t_1proc / t_2proc.  On real multi-host TPU the same entry
point runs over ICI/DCN (dist/multihost.py initialize(platform="tpu")).

Usage: python tools/bench_multihost.py [--reps 30] [--width 832
--height 480]
"""

from __future__ import annotations

import argparse
import json
import os
import socket
import subprocess
import sys

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _launch(port, num_processes, pid, reps, width, height, devices):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={devices}"
    )
    env.setdefault(
        "JAX_COMPILATION_CACHE_DIR", os.path.join(_ROOT, ".jax_cache")
    )
    cmd = [
        sys.executable, "-m", "tpuh264.dist.multihost",
        "--coordinator", f"localhost:{port}",
        "--num-processes", str(num_processes), "--process-id", str(pid),
        "--rows-across-hosts", "--mesh", "4x2",
        "--bench-reps", str(reps),
        "--width", str(width), "--height", str(height),
    ]
    return subprocess.Popen(
        cmd, env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
        cwd=_ROOT, text=True,
    )


def _result(proc) -> dict:
    out, err = proc.communicate(timeout=1800)
    if proc.returncode != 0:
        raise RuntimeError(f"worker failed:\n{err[-3000:]}")
    for line in out.splitlines():
        if line.startswith("MULTIHOST_RESULT "):
            return json.loads(line.split(" ", 1)[1])
    raise RuntimeError(f"no result line:\n{out[-500:]}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=30)
    ap.add_argument("--width", type=int, default=832)
    ap.add_argument("--height", type=int, default=480)
    args = ap.parse_args()

    # 1 process x 8 devices (identical 4x2 mesh, no process boundary)
    p = _launch(_free_port(), 1, 0, args.reps, args.width, args.height, 8)
    r1 = _result(p)
    assert r1["bitexact"], r1

    # 2 processes x 4 devices, rows axis crossing the boundary
    port = _free_port()
    procs = [
        _launch(port, 2, 0, args.reps, args.width, args.height, 4),
        _launch(port, 2, 1, args.reps, args.width, args.height, 4),
    ]
    r2s = [_result(p) for p in procs]
    for r in r2s:
        assert r["bitexact"], r
    t1 = r1["p_step_ms"]
    t2 = max(r["p_step_ms"] for r in r2s)
    eff = t1 / t2
    # sanity: identical total hardware cannot legitimately scale >1; a
    # figure above ~1 means the 1-proc baseline is not the best-known
    # configuration (the round-4 mistake this guard now catches)
    assert eff <= 1.05, (
        f"efficiency {eff:.3f} > 1.05: 1-proc baseline is not the best "
        "1-proc configuration -- fix the baseline, not the ratio"
    )
    print(json.dumps({
        "metric": "2host_scaling_efficiency",
        "width": args.width, "height": args.height,
        "mesh": "4x2 (rows across hosts)",
        "halo_1proc": "per-plane (best 1-proc)",
        "halo_2proc": "fused uint8 (best cross-process)",
        "p_step_ms_1proc": round(t1, 2),
        "p_step_ms_2proc": round(t2, 2),
        "efficiency": round(eff, 3),
    }))


if __name__ == "__main__":
    main()
