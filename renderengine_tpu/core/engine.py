"""Engine bootstrap.

The analog of the reference's process init (instance/device singletons,
``main.cpp:188-195``) plus its shader-cache persistence
(``Intermediate/Projects/shader_cache.json``,
``Scripts/compile-shaders.py:154-213``): here the compiled artifacts are
XLA executables, persisted via JAX's compilation cache so a scene's
"pipelines" survive process restarts.
"""

from __future__ import annotations

import os
from pathlib import Path

_initialized = False


def cache_dir() -> str:
    """The persistent engine cache directory (compiled XLA executables +
    the tuned-config record — the reference's ``Intermediate/Projects``
    analog, ``compile-shaders.py:154-162``)."""
    return os.environ.get(
        "RENDERENGINE_CACHE_DIR",
        str(Path(__file__).resolve().parents[2] / ".jax_cache"))


def init(compile_cache_dir: str | None = None) -> None:
    """Idempotent engine init: persistent compile cache + sane defaults.
    Call before creating renderers (apps and bench do)."""
    global _initialized
    if _initialized:
        return
    _initialized = True
    import jax

    cache = compile_cache_dir or cache_dir()
    Path(cache).mkdir(parents=True, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # older jax without the knobs

    # warm the host->device path with a tiny transfer: through remote-
    # device relays the FIRST transfer of a process runs a slow cold path
    # whose cost scales with size (measured: an 82 MB scene upload takes
    # ~70 s cold vs 0.1 s after any warm transfer). Pay the fixed cold
    # cost on 4 KB instead of the whole scene.
    try:
        import numpy as _np

        jax.block_until_ready(jax.device_put(_np.zeros((8, 128), _np.float32)))
    except Exception:
        pass  # no device available (e.g. docs builds) — harmless


def device_info() -> dict:
    """The PhysicalDevice-pick analog: report what we're running on."""
    import jax

    d = jax.devices()[0]
    return {
        "platform": d.platform,
        "device_kind": getattr(d, "device_kind", "unknown"),
        "n_devices": jax.device_count(),
        "default_backend": jax.default_backend(),
    }
