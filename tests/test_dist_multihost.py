"""Multi-host distribution: 2 jax.distributed processes, bit-exact GOP.

Launches two real OS processes (4 virtual CPU devices each -> an
8-device global mesh) that encode an IPPP sequence with the rows axis
spanning the process boundary, so the P-step's DPB halo `ppermute`
crosses DCN (Gloo on CPU).  Each process compares the allgathered
reconstruction against its local unsharded oracle (VERDICT r1 next-round
item 3; BASELINE north star: multi-host scaling).
"""

import json
import os
import socket
import subprocess
import sys

import pytest


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _launch(port: int, pid: int, rows_across: bool):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env.setdefault(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.join(os.path.dirname(__file__), "..", ".jax_cache"),
    )
    cmd = [
        sys.executable, "-m", "tpuh264.dist.multihost",
        "--coordinator", f"localhost:{port}",
        "--num-processes", "2", "--process-id", str(pid),
    ]
    if rows_across:
        cmd.append("--rows-across-hosts")
    return subprocess.Popen(
        cmd, env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
        cwd=os.path.join(os.path.dirname(__file__), ".."), text=True,
    )


@pytest.mark.parametrize("rows_across", [True, False],
                         ids=["dcn-halo", "stream-parallel"])
def test_two_process_gop_bitexact(rows_across):
    port = _free_port()
    procs = [_launch(port, 0, rows_across), _launch(port, 1, rows_across)]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, f"worker failed:\n{err[-3000:]}"
        outs.append(out)
    for out in outs:
        line = [l for l in out.splitlines()
                if l.startswith("MULTIHOST_RESULT ")]
        assert line, f"no result line in: {out[-500:]}"
        result = json.loads(line[0].split(" ", 1)[1])
        assert result["bitexact"], result
        assert result["processes"] == 2
