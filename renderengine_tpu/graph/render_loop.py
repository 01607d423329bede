"""The frame driver.

Reference: ``Source/VkRHI/RHI/RenderLoop.{h,cpp}`` — an abstract run loop:
~60 FPS pacing by yield-spin (``RenderLoop.h:51``), 2 frames in flight
(``constants.h:7``), acquire/record/submit/present, resize-triggered
swapchain recreation (``RenderLoop.cpp:150-171``).

TPU-native mapping:
- "command recording + submit" = one jitted frame dispatch (async — JAX
  returns before the device finishes, exactly the fence-pipelined submit).
- frames in flight = a bounded queue of un-fetched device images; we block
  (fetch) the frame N-2 before dispatching frame N.
- "present" = a host callback receiving the fetched RGBA8 numpy frame.
- resize = a new FrameRenderer at the new static (H, W) — a jit-cache
  entry per resolution, as the reference rebuilds pipelines per extent.
"""

from __future__ import annotations

import time
from collections import deque

import numpy as np

from ..core.config import RenderConfig
from .frame import FrameRenderer

MAX_FRAMES_IN_FLIGHT = 2  # reference constants.h:7


class RenderLoop:
    """Concrete driver: subclass or pass callbacks.

    on_update(dt_s) -> bool    host-side per-frame update (camera etc.);
                               return False to stop the loop.
    on_present(frame: np.ndarray) -> None   receives fetched RGBA8 frames.
    """

    def __init__(self, scene_host, config: RenderConfig,
                 on_update=None, on_present=None, target_fps: float = 60.0,
                 backend: str | None = None, view_props_fn=None):
        self.scene_host = scene_host
        self.config = config
        self.renderer = FrameRenderer(scene_host, config, backend=backend)
        self.on_update = on_update
        self.on_present = on_present
        self.view_props_fn = view_props_fn  # () -> ViewProperties | None
        self.target_fps = target_fps
        self._inflight: deque = deque()
        self.frame_index = 0
        self.frame_times: deque = deque(maxlen=120)

    def resize(self, width: int, height: int) -> None:
        """Swapchain-recreation analog: re-jit at the new extent."""
        self.drain()
        self.config = self.config.replace(width=width, height=height)
        self.scene_host.camera.set_image_extent(width, height)
        self.renderer = FrameRenderer(self.scene_host, self.config,
                                      backend=self.renderer.backend)

    def render_one(self):
        """Dispatch one frame; fetch + present the oldest once the
        in-flight window is full. Returns the dispatched device array."""
        vp = self.view_props_fn() if self.view_props_fn else None
        img = self.renderer.render(vp)
        self._inflight.append(img)
        if len(self._inflight) > MAX_FRAMES_IN_FLIGHT:
            done = np.asarray(self._inflight.popleft())
            if self.on_present:
                self.on_present(done)
        self.frame_index += 1
        return img

    def drain(self) -> None:
        """Fence-wait analog: fetch and present everything in flight."""
        while self._inflight:
            done = np.asarray(self._inflight.popleft())
            if self.on_present:
                self.on_present(done)

    def run(self, max_frames: int | None = None) -> None:
        """The Run() loop (``RenderLoop.cpp:52-67``): update -> render,
        paced to ``target_fps`` by sleep-yield."""
        period = 1.0 / self.target_fps if self.target_fps > 0 else 0.0
        last = time.perf_counter()
        while max_frames is None or self.frame_index < max_frames:
            now = time.perf_counter()
            dt = now - last
            if period and dt < period:
                time.sleep(period - dt)
                continue
            last = now
            self.frame_times.append(dt)
            if self.on_update is not None and self.on_update(dt) is False:
                break
            self.render_one()
        self.drain()

    def fps(self) -> float:
        if not self.frame_times:
            return 0.0
        return len(self.frame_times) / max(sum(self.frame_times), 1e-9)
