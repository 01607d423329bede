"""Test configuration: force an 8-virtual-device CPU platform so sharding
tests run without TPU hardware, and keep all kernel tests deterministic.

Must set env vars before the first ``import jax`` anywhere in the test
process.
"""

import os

# Hard override: the shell environment pins JAX_PLATFORMS=axon (the real
# TPU tunnel); tests must run on the virtual-device CPU platform.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402

# persistent compile cache: CPU test-graph compiles dominate suite time;
# warm runs skip them entirely
import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


@pytest.fixture
def rng():
    return np.random.default_rng(0)
