"""Test configuration: force an 8-virtual-device CPU platform so sharding
tests run without TPU hardware, and keep all kernel tests deterministic.

The environment's sitecustomize registers the ``axon`` TPU-tunnel plugin
at interpreter start and PREPENDS it to the ``jax_platforms`` config, so
setting ``JAX_PLATFORMS=cpu`` (env or os.environ) is silently ignored —
the override must go through ``jax.config.update`` before any backend
initializes. XLA_FLAGS is still read at CPU-client creation, so the
device-count flag can be set here.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

# determinism: tests must exercise the estimator paths, never budgets a
# previous process settled on (graph/frame.py tuned-config record)
os.environ["RENDERENGINE_TUNED_CACHE"] = "0"

import numpy as np  # noqa: E402
import pytest  # noqa: E402

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# persistent compile cache: CPU test-graph compiles dominate suite time;
# warm runs skip them entirely
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

assert jax.default_backend() == "cpu" and len(jax.devices()) >= 8, (
    "tests must run on the 8-virtual-device CPU platform, got "
    f"{jax.default_backend()} x{len(jax.devices())}")


@pytest.fixture
def rng():
    return np.random.default_rng(0)
