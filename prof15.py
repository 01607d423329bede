import numpy as np, jax, jax.numpy as jnp
from renderengine_tpu.core import engine; engine.init()
from renderengine_tpu.core.config import RenderConfig, CullMode
from renderengine_tpu.graph import frame as fg
from renderengine_tpu.graph.frame import FrameRenderer
from renderengine_tpu.graph.uniforms import unpack_params
from renderengine_tpu.raster.setup import triangle_setup, vertex_transform
from renderengine_tpu.raster.binning import bin_triangles
from renderengine_tpu.raster import pallas_raster as pr
from renderengine_tpu.shading import pbr, skybox
from renderengine_tpu.scene import procedural
from renderengine_tpu.utils.profiling import time_jitted

W,H = 1920,1080
sc = procedural.sponza_scene(width=W, height=H, n_textures=200, target_tris=260000)
cfg = RenderConfig(width=W, height=H, shadow_extent=2048, translucency=False)
r = FrameRenderer(sc, cfg)
dev = r.scene_dev
img = r.render(); np.asarray(img)
u = jax.device_put(r.uniform_for_camera())
sm = r._shadow_maps
mp = 8*int(dev['tri_vidx'].shape[0])+4096
print('T padded:', dev['tri_vidx'].shape[0], 'budget pairs:', mp, flush=True)

def stage(name, fn):
    f = jax.jit(fn)
    res = time_jitted(lambda: f(dev, u), reps=4)
    print(f'{name:22s} {res["median"]*1000:9.1f} ms', flush=True)

def vert(s,uu):
    p = unpack_params(uu, 1)
    return vertex_transform(s, p['view'], p['proj'])
stage('vertex', vert)
def upto_setup(s,uu):
    vo = vert(s,uu)
    return triangle_setup(vo.clip, s['tri_vidx'], s['n_opaque'], W, H, CullMode.BACK)
stage('+setup', upto_setup)
def upto_bin(s,uu):
    return bin_triangles(upto_setup(s,uu), H, W, 8, 128, mp)
stage('+bin', upto_bin)
def upto_rast(s,uu):
    return pr.rasterize_pallas(upto_setup(s,uu), H, W, max_pairs=mp)
stage('+pack+raster', upto_rast)
def upto_resolve(s,uu):
    vo = vert(s,uu)
    st = triangle_setup(vo.clip, s['tri_vidx'], s['n_opaque'], W, H, CullMode.BACK)
    g = pr.rasterize_pallas(st, H, W, max_pairs=mp)
    return fg.resolve_attributes(s, vo, st.coef, g.tri_id, H, W)
stage('+resolve', upto_resolve)
def upto_shade(s,uu):
    p = unpack_params(uu, 1)
    vo = vert(s,uu)
    st = triangle_setup(vo.clip, s['tri_vidx'], s['n_opaque'], W, H, CullMode.BACK)
    g = pr.rasterize_pallas(st, H, W, max_pairs=mp)
    fr = fg.resolve_attributes(s, vo, st.coef, g.tri_id, H, W)
    va = {"view_pos": p["view_pos"], "exposure": p["exposure"],
          "debug_input": p["debug_input"], "debug_equation": p["debug_equation"]}
    return pbr.brdf_lighting(s, fr['pos'], fr['uv'], fr['normal'], fr['mat_id'], va, sm, p['shadow_viewproj'])
stage('+shade', upto_shade)
res = time_jitted(lambda: r._fn(dev, u, sm), reps=4)
print(f'{"FULL":22s} {res["median"]*1000:9.1f} ms')
# binning internals: pairs actually used
b = jax.jit(lambda s,uu: bin_triangles(upto_setup(s,uu), H, W, 8, 128, mp))(dev, u)
print('live pairs:', int(np.asarray(b.pair_valid).sum()), 'overflow:', int(b.n_overflow))
