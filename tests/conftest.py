"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI; sharding correctness is
validated on `xla_force_host_platform_device_count=8` CPU devices, and the
driver separately dry-run-compiles the multi-chip path via
`__graft_entry__.dryrun_multichip`.
"""

import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

# NOTE: the JAX_PLATFORMS env var is overridden by the axon TPU plugin in this
# image; the config update is authoritative.
jax.config.update("jax_platforms", "cpu")

# NOTE: do NOT enable the persistent compilation cache here — writing the
# multi-hundred-MB serialized SLAM executable segfaults inside
# jax.compilation_cache.put_executable_and_time (zstd path) on this image.

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def pytest_addoption(parser):
    parser.addoption("--heavy", action="store_true", default=False,
                     help="also run tests marked 'heavy' (monster-compile/scale tests)")


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "heavy: long-compile or large-scale test, excluded from the default run "
        "(opt in with --heavy; CI latency policy in IMPLEMENTATION_STATUS.md)",
    )


def pytest_collection_modifyitems(config, items):
    if config.getoption("--heavy"):
        return
    skip = pytest.mark.skip(reason="heavy: opt in with --heavy")
    for item in items:
        if "heavy" in item.keywords:
            item.add_marker(skip)
