#!/usr/bin/env python
"""Frame time at the headline config AFTER the observation re-tunes
(per-layer blend budgets + penumbra budget) — i.e. the steady state the
bench's timed rounds see. Prints observed stats and before/after times."""

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    from renderengine_tpu.core import engine
    engine.init()
    from renderengine_tpu.core.config import RenderConfig
    from renderengine_tpu.graph.frame import FrameRenderer
    from renderengine_tpu.scene import procedural
    from renderengine_tpu.utils.profiling import time_jitted

    w, h = 1920, 1080
    scene = procedural.sponza_scene(width=w, height=h, n_textures=200,
                                    target_tris=260_000)
    cfg = RenderConfig(width=w, height=h, shadow_extent=4096,
                       debug_views=False)
    r = FrameRenderer(scene, cfg, backend="pallas")
    print(f"# init: penumbra={r.config.penumbra_tile_budget} "
          f"blend_layers={r.config.blend_layer_tile_budgets} "
          f"opq={r.config.raster.pair_budget}", file=sys.stderr)

    t0 = time.time()
    np.asarray(r.render())
    print(f"# first frame+compile {time.time()-t0:.1f}s", file=sys.stderr)
    # time the device program, not the 8MB tunnel readback: bench frames
    # dispatch asynchronously and sync once (render_loop semantics)
    u = r.uniform_for_camera()
    import jax
    uj = jax.device_put(np.asarray(u))
    t = time_jitted(lambda: r._fn(r.scene_dev, uj, r._shadow_maps), reps=5)
    print(f"pre-retune frame {t['min']*1e3:8.2f} ms (med {t['median']*1e3:.2f})",
          file=sys.stderr)
    st = r._pending_overflow[-1]
    print(f"# observed: penumbra_tiles={int(np.asarray(st.get('penumbra_tiles', -1)))} "
          f"blend_shade_tiles={np.asarray(st.get('blend_shade_tiles', []))} "
          f"pen_ov={int(np.asarray(st.get('penumbra_overflow', -1)))}",
          file=sys.stderr)

    # let the retunes land (each render polls; re-jit compiles lazily)
    t0 = time.time()
    for _ in range(4):
        np.asarray(r.render())
    print(f"# retune renders {time.time()-t0:.1f}s; now "
          f"penumbra={r.config.penumbra_tile_budget} "
          f"blend_layers={r.config.blend_layer_tile_budgets}", file=sys.stderr)
    t = time_jitted(lambda: r._fn(r.scene_dev, uj, r._shadow_maps), reps=8)
    print(f"post-retune frame {t['min']*1e3:8.2f} ms (med {t['median']*1e3:.2f})",
          file=sys.stderr)


if __name__ == "__main__":
    main()
