import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import time, numpy as np, jax.numpy as jnp
from renderengine_tpu.scene import procedural
from renderengine_tpu.core.config import RenderConfig, CullMode
from renderengine_tpu.graph import frame as fg
from renderengine_tpu.raster.setup import triangle_setup, vertex_transform
from renderengine_tpu.raster import pallas_raster as pr
from renderengine_tpu.shading import pbr, sampling, shadow as shdw
from renderengine_tpu.graph.frame import FrameRenderer
from renderengine_tpu.graph.uniforms import unpack_params

W,H = 640,480
sc = procedural.sponza_scene(width=W, height=H, n_textures=64, target_tris=60000)
cfg = RenderConfig(width=W, height=H, shadow_extent=1024)
r = FrameRenderer(sc, cfg)
dev = r.scene_dev
img = r.render(); np.asarray(img)
u = jax.device_put(r.uniform_for_camera())
sm = r._shadow_maps
mp = 8*int(dev['tri_vidx'].shape[0])+4096

@jax.jit
def gbufs(s,uu):
    p = unpack_params(uu, 1)
    vo = vertex_transform(s, p['view'], p['proj'])
    st = triangle_setup(vo.clip, s['tri_vidx'], s['n_opaque'], W, H, CullMode.BACK)
    g = pr.rasterize_pallas(st, H, W, max_pairs=mp)
    fr = fg.resolve_attributes(s, vo, st.coef, g.tri_id, H, W)
    return fr
frag = jax.device_put(jax.tree.map(lambda x: x, gbufs(dev, u)))

def timeit(name, f, *args):
    ff = jax.jit(f)
    o = ff(*args); np.asarray(jax.tree.leaves(o)[0].ravel()[:1])
    t0=time.time()
    for _ in range(8): o = ff(*args)
    np.asarray(jax.tree.leaves(o)[0].ravel()[:1])
    print(f'{name:30s} {(time.time()-t0)/8*1000:9.2f} ms', flush=True)

timeit('raster+resolve', lambda s,uu: gbufs(s,uu), dev, u)

def remap_only(s, fr):
    return pbr.remap_material(s, fr['mat_id'], fr['pos'], fr['uv'], fr['normal'])
timeit('remap_material (4 tex slots)', remap_only, dev, frag)

def one_tex(s, fr):
    h = s['mat_tex_base'][fr['mat_id']]
    duv_dx = sampling.quad_dfdx(fr['uv']); duv_dy = sampling.quad_dfdy(fr['uv'])
    lod = pbr._material_lod(s, h, duv_dx, duv_dy)
    return sampling.sample_texture(s['atlas'], s['tex_table'], s['mip_y'], h, fr['uv'], lod)
timeit('1 trilinear texture sample', one_tex, dev, frag)

def pcf_only(s, fr, sm, uu):
    p = unpack_params(uu, 1)
    return shdw.compute_shadow_directional(sm, p['shadow_viewproj'], jnp.int32(0),
                                           s['light_pos'][0], fr['pos'], fr['normal'])
timeit('PCF 9-tap', pcf_only, dev, frag, sm, u)
