"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Must set env vars before jax initializes (see task notes: multi-chip
hardware is unavailable; sharding is validated on virtual CPU devices).
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
# persistent compile cache: repeated test runs skip the big XLA compiles
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(__file__), "..", ".jax_cache"),
)
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")

# The axon site hook registers a TPU backend at interpreter start and
# overrides JAX_PLATFORMS; force the CPU backend programmatically so the
# suite runs on the virtual 8-device mesh (and leaves the chip to bench).
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: long-running (Pallas interpret-mode) tests; skipped unless "
        "--runslow or TPUH264_RUN_SLOW=1",
    )


def pytest_addoption(parser):
    parser.addoption(
        "--runslow", action="store_true", default=False,
        help="run tests marked slow (Pallas interpret mode, minutes each)",
    )


def pytest_collection_modifyitems(config, items):
    if config.getoption("--runslow") or os.environ.get("TPUH264_RUN_SLOW"):
        return
    skip = pytest.mark.skip(
        reason="slow (interpret-mode) test: pass --runslow to include"
    )
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)
