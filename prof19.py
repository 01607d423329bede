import numpy as np, jax, jax.numpy as jnp
from renderengine_tpu.core import engine; engine.init()
from renderengine_tpu.core.config import RenderConfig, CullMode
from renderengine_tpu.graph import frame as fg
from renderengine_tpu.graph.frame import FrameRenderer, cached_vertex_outputs, _pair_budget
from renderengine_tpu.graph.uniforms import unpack_params
from renderengine_tpu.raster.setup import triangle_setup
from renderengine_tpu.raster import pallas_raster as pr
from renderengine_tpu.scene import procedural
from renderengine_tpu.utils.profiling import time_jitted

W,H = 1920,1080
sc = procedural.sponza_scene(width=W, height=H, n_textures=200, target_tris=260000)
cfg = RenderConfig(width=W, height=H, shadow_extent=2048)
r = FrameRenderer(sc, cfg)
dev = r.scene_dev; img = r.render(); np.asarray(img)
u = jax.device_put(r.uniform_for_camera())
mp = _pair_budget(dev['tri_vidx'].shape[0], 4)

def frag_interp(s, uu):
    p = unpack_params(uu, 1)
    vo = cached_vertex_outputs(s, p['view'], p['proj'])
    st = triangle_setup(vo.clip, s['tri_vidx'], s['n_opaque'], W, H, CullMode.BACK)
    ap = pr.attribute_planes(st, vo, s['tri_vidx'])
    g, attrs = pr.rasterize_pallas(st, H, W, max_pairs=mp, attr_planes=ap)
    return attrs

def frag_resolve(s, uu):
    p = unpack_params(uu, 1)
    vo = cached_vertex_outputs(s, p['view'], p['proj'])
    st = triangle_setup(vo.clip, s['tri_vidx'], s['n_opaque'], W, H, CullMode.BACK)
    g = pr.rasterize_pallas(st, H, W, max_pairs=mp)
    return fg.resolve_attributes(s, vo, st.coef, g, H, W)

for name, f in (("raster+interp(kernel)", frag_interp), ("raster+resolve(gathers)", frag_resolve)):
    res = time_jitted(jax.jit(f), dev, u, reps=5)
    print(f'{name:26s} {res["median"]*1000:8.1f} ms  (min {res["min"]*1000:.1f})', flush=True)
