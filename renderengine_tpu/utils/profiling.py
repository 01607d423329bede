"""Profiling + tracing — the observability subsystem the reference never
built (``todo.md:20`` RenderDoc debug info; SURVEY §5 'tracing: none').

Two tools:
- ``time_jitted``: wall-clock a jitted function with a forced scalar
  readback (``block_until_ready`` is unreliable through remote-device
  relays; a one-scalar fetch bounds execution by dataflow).
- ``trace``: context manager around ``jax.profiler.trace`` for TensorBoard
  traces of a frame.
"""

from __future__ import annotations

import contextlib
import time

import jax
import jax.numpy as jnp
import numpy as np


def _sync(out) -> None:
    leaves = jax.tree.leaves(out)
    if leaves:
        np.asarray(leaves[-1].ravel()[-1:])


def time_jitted(fn, *args, reps: int = 8, inner: int = 1, warmup: int = 1) -> dict:
    """Median/min wall time of ``fn(*args)`` in seconds."""
    for _ in range(warmup):
        _sync(fn(*args))
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = None
        for _ in range(inner):
            out = fn(*args)
        _sync(out)
        times.append((time.perf_counter() - t0) / inner)
    return {"median": float(np.median(times)), "min": float(min(times)),
            "max": float(max(times)), "reps": reps}


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/renderengine_trace"):
    """Capture a device trace viewable in TensorBoard/Perfetto."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def profile_frame(renderer, reps: int = 6) -> dict:
    """Per-pass breakdown for a FrameRenderer (steady-state frame and the
    shadow pass separately)."""
    import jax

    u = jax.device_put(renderer.uniform_for_camera())
    out = {}
    if renderer.n_shadows > 0:
        out["shadow_pass"] = time_jitted(
            lambda: renderer._shadow_fn(renderer.scene_dev, u), reps=reps)
        sm = renderer._shadow_fn(renderer.scene_dev, u)
        if isinstance(sm, tuple):   # (packed maps, overflow counter)
            sm = sm[0]
    else:
        sm = None
    out["frame"] = time_jitted(
        lambda: renderer._fn(renderer.scene_dev, u, sm), reps=reps)
    return out
