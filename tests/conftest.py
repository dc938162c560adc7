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

# persistent compilation cache: the SLAM pipeline programs are large; caching
# amortizes their compile time across test runs
_cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
