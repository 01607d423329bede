import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import time, numpy as np, jax.numpy as jnp
from renderengine_tpu.scene import procedural
from renderengine_tpu.core.config import RenderConfig, CullMode
from renderengine_tpu.raster.setup import triangle_setup, vertex_transform
from renderengine_tpu.raster.binning import bin_triangles
from renderengine_tpu.raster import pallas_raster as pr
from renderengine_tpu.graph.frame import FrameRenderer
from renderengine_tpu.graph.uniforms import unpack_params

W,H = 640,480
sc = procedural.sponza_scene(width=W, height=H, n_textures=64, target_tris=60000)
cfg = RenderConfig(width=W, height=H, shadow_extent=1024)
r = FrameRenderer(sc, cfg)
dev = r.scene_dev
t0=time.time(); img = r.render(); np.asarray(img); print('first frame', time.time()-t0)
u = jax.device_put(r.uniform_for_camera())
sm = r._shadow_maps
mp = 8*int(dev['tri_vidx'].shape[0])+4096

def timeit(name, f, *args):
    o = f(*args); np.asarray(jax.tree.leaves(o)[0].ravel()[:1])
    t0=time.time()
    for _ in range(8): o = f(*args)
    np.asarray(jax.tree.leaves(o)[0].ravel()[:1])
    print(f'{name:24s} {(time.time()-t0)/8*1000:9.2f} ms', flush=True)

@jax.jit
def upto_bin(s,u):
    p = unpack_params(u, 1)
    vo = vertex_transform(s, p['view'], p['proj'])
    st = triangle_setup(vo.clip, s['tri_vidx'], s['n_opaque'], W, H, CullMode.BACK)
    return bin_triangles(st, H, W, 8, 128, mp)

@jax.jit
def upto_rast(s,u):
    p = unpack_params(u, 1)
    vo = vertex_transform(s, p['view'], p['proj'])
    st = triangle_setup(vo.clip, s['tri_vidx'], s['n_opaque'], W, H, CullMode.BACK)
    return pr.rasterize_pallas(st, H, W, max_pairs=mp)

timeit('thru binning', upto_bin, dev, u)
timeit('thru raster', upto_rast, dev, u)
timeit('FULL (shadow cached)', r._fn, dev, u, sm)
