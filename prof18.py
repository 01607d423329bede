import numpy as np, jax, jax.numpy as jnp
from renderengine_tpu.core import engine; engine.init()
from renderengine_tpu.core.config import RenderConfig, CullMode
from renderengine_tpu.graph.frame import FrameRenderer, cached_vertex_outputs, _pair_budget
from renderengine_tpu.graph.uniforms import unpack_params
from renderengine_tpu.raster.setup import triangle_setup
from renderengine_tpu.raster import binning as B
from renderengine_tpu.scene import procedural
from renderengine_tpu.utils.profiling import time_jitted

W,H = 1920,1080
sc = procedural.sponza_scene(width=W, height=H, n_textures=200, target_tris=260000)
cfg = RenderConfig(width=W, height=H, shadow_extent=2048)
r = FrameRenderer(sc, cfg)
dev = r.scene_dev; img = r.render(); np.asarray(img)
u = jax.device_put(r.uniform_for_camera())
mp = _pair_budget(dev['tri_vidx'].shape[0], 4)

def setup_of(s, uu):
    p = unpack_params(uu, 1)
    vo = cached_vertex_outputs(s, p['view'], p['proj'])
    return triangle_setup(vo.clip, s['tri_vidx'], s['n_opaque'], W, H, CullMode.BACK)

tile_h, tile_w = 8, 128
ntx = -(-W // tile_w); nty = -(-H // tile_h); n_tiles = ntx*nty

def b_partial(level):
    def f(s, uu):
        setup = setup_of(s, uu)
        bbox = setup.bbox
        tx0 = bbox[:, 0] // tile_w; ty0 = bbox[:, 1] // tile_h
        tx1 = bbox[:, 2] // tile_w; ty1 = bbox[:, 3] // tile_h
        nx = (tx1 - tx0 + 1); ny = (ty1 - ty0 + 1)
        span = jnp.where(setup.valid, nx * ny, 0).astype(jnp.int32)
        offsets = jnp.cumsum(span) - span
        if level == 1: return offsets
        tri = B._segment_ids_from_offsets(offsets, span, mp)
        if level == 2: return tri
        slots = jnp.arange(mp, dtype=jnp.int32)
        local = slots - offsets[tri]
        dy = local // nx[tri]
        dx = local - dy * nx[tri]
        tile = (ty0[tri] + dy) * ntx + (tx0[tri] + dx)
        total = offsets[-1] + span[-1]
        slot_valid = slots < jnp.minimum(total, mp)
        key = jnp.where(slot_valid, tile, n_tiles).astype(jnp.int32)
        if level == 3: return key
        sk, st = jax.lax.sort((key, tri), dimension=0, num_keys=1, is_stable=True)
        if level == 4: return st
        pos = jnp.arange(mp, dtype=jnp.int32)
        starts = jnp.full(n_tiles + 1, mp, jnp.int32).at[sk].min(pos, mode="drop")[:n_tiles]
        counts = jnp.zeros(n_tiles + 1, jnp.int32).at[sk].add(1, mode="drop")[:n_tiles]
        return starts + counts
    return f

for lvl, name in ((1,'offsets'),(2,'+segment ids'),(3,'+tile calc'),(4,'+sort'),(5,'+starts/counts')):
    res = time_jitted(jax.jit(b_partial(lvl)), dev, u, reps=4)
    print(f'{name:16s} {res["median"]*1000:8.1f} ms', flush=True)
