import argparse, time, numpy as np, jax
from renderengine_tpu.core import engine; engine.init()
from renderengine_tpu.core.config import RenderConfig
from renderengine_tpu.graph.frame import FrameRenderer
from renderengine_tpu.scene import procedural
from renderengine_tpu.utils.profiling import time_jitted, profile_frame

sc = procedural.sponza_scene(width=1920, height=1080, n_textures=200, target_tris=260000)
for transl in (False, True):
    cfg = RenderConfig(width=1920, height=1080, shadow_extent=2048, translucency=transl)
    r = FrameRenderer(sc, cfg)
    img = r.render(); np.asarray(img)  # compile + shadow
    u = jax.device_put(r.uniform_for_camera())
    res = time_jitted(lambda: r._fn(r.scene_dev, u, r._shadow_maps), reps=4)
    print(f"translucency={transl}: frame {res['median']*1000:.0f} ms (min {res['min']*1000:.0f})", flush=True)
