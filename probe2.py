import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import numpy as np
from renderengine_tpu.scene import procedural
from renderengine_tpu.core.config import RenderConfig
from renderengine_tpu.graph.frame import FrameRenderer
from renderengine_tpu.utils import png
sp = procedural.sponza_scene(width=640, height=360, n_textures=48, target_tris=40000)
r2 = FrameRenderer(sp, RenderConfig(width=640, height=360, shadow_extent=1024))
img3 = np.asarray(r2.render())
png.write_png('/tmp/sponza3.png', img3)
print('ok')
