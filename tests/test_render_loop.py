"""RenderLoop semantics: frames-in-flight presentation, resize (the
swapchain-recreation analog, RenderLoop.cpp:150-171), and the sharded
renderer's shadow dirty-flag caching (RenderScene.cpp:170-181)."""

import numpy as np
import jax

from renderengine_tpu.core.config import RenderConfig
from renderengine_tpu.graph.render_loop import RenderLoop, MAX_FRAMES_IN_FLIGHT
from renderengine_tpu.parallel import sharded
from renderengine_tpu.scene import procedural


class TestRenderLoop:
    def test_frames_in_flight_and_resize(self):
        sc = procedural.cube_scene(width=64, height=48)
        cfg = RenderConfig(width=64, height=48, shadow_extent=32,
                           translucency=False)
        presented = []
        loop = RenderLoop(sc, cfg, on_present=presented.append,
                          target_fps=0.0)
        for _ in range(MAX_FRAMES_IN_FLIGHT + 2):
            loop.render_one()
        # the in-flight window bounds un-presented frames (fence analog)
        assert len(presented) == 2
        loop.drain()
        assert len(presented) == MAX_FRAMES_IN_FLIGHT + 2
        assert presented[0].shape == (48, 64, 4)

        # resize = re-jit at the new extent, like swapchain recreation
        loop.resize(96, 32)
        loop.render_one()
        loop.drain()
        assert presented[-1].shape == (32, 96, 4)
        assert loop.renderer.config.width == 96

    def test_sharded_shadow_dirty_flag(self):
        sc = procedural.cube_scene(width=64, height=32)
        cfg = RenderConfig(width=64, height=32, shadow_extent=32,
                           translucency=False)
        r = sharded.ShardedRenderer(sc, cfg, sharded.make_mesh(2),
                                    backend="tiled")
        img0 = np.asarray(r.render())
        maps0 = r._shadow_maps
        np.asarray(r.render())
        assert r._shadow_maps is maps0, "shadow pass must be cached"
        r.mark_shadows_dirty()
        np.asarray(r.render())
        assert r._shadow_maps is not maps0, "dirty flag must re-render"
        assert img0.any()
