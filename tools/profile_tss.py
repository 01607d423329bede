#!/usr/bin/env python
"""Texture-space-shading profile at the headline config: TSS frame vs
per-pixel frame, plus the isolated TSS stages (chart light pass, block
pack, screen-gather) so the next lever is measured, not guessed.

Run on chip: python tools/profile_tss.py
"""

import argparse
import sys

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=6)
    ap.add_argument("--shadow-extent", type=int, default=4096)
    ap.add_argument("--density", type=float, default=0.5)
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--height", type=int, default=1080)
    ap.add_argument("--tris", type=int, default=260_000)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from renderengine_tpu.core import engine
    engine.init()
    from renderengine_tpu.core.config import RenderConfig
    from renderengine_tpu.graph.frame import FrameRenderer
    from renderengine_tpu.scene import procedural
    from renderengine_tpu.shading import lightchart
    from renderengine_tpu.utils.profiling import time_jitted

    w, h = args.width, args.height
    scene = procedural.sponza_scene(width=w, height=h, n_textures=200,
                                    target_tris=args.tris)

    def build(tag, **kw):
        cfg = RenderConfig(width=w, height=h, debug_views=False,
                           shadow_extent=args.shadow_extent, **kw)
        r = FrameRenderer(scene, cfg, backend="pallas")
        u = jax.device_put(np.asarray(r.uniform_for_camera()))
        sm = None
        if r.n_shadows > 0:
            sm_t = r._shadow_fn(r.scene_dev, u)
            sm = sm_t[0] if isinstance(sm_t, tuple) else sm_t
        t = time_jitted(lambda: r._fn(r.scene_dev, u, sm), reps=args.reps)
        print(f"{tag:42s} {t['min']*1e3:8.2f} ms (med {t['median']*1e3:.2f})",
              file=sys.stderr)
        return r, u, sm

    r_pp, _, _ = build("per-pixel frame")
    r, u, sm = build("TSS frame", texture_space=True,
                     chart_density=args.density)

    ah = int(r.scene_dev["chart_pos"].shape[1])
    aw = int(r.scene_dev["chart_pos"].shape[2])
    live = float(jnp.mean((r.scene_dev["chart_mat"][15] > 0)))
    print(f"# chart atlas {ah}x{aw} = {ah*aw/1e6:.2f} Mtexels, "
          f"{live:.1%} live", file=sys.stderr)

    from renderengine_tpu.graph.uniforms import unpack_params
    params = jax.jit(lambda uu: unpack_params(uu, r.n_shadows))(u)
    va = {"view_pos": params["view_pos"], "exposure": params["exposure"]}

    spec_fn = jax.jit(lambda sc: lightchart.chart_light_spec(
        sc, sc["chart_pos"], sc["chart_normal"], sc["chart_mat"],
        sc["chart_vis"], va))
    t = time_jitted(spec_fn, r.scene_dev, reps=args.reps)
    print(f"{'  chart_light_spec (per frame)':42s} {t['min']*1e3:8.2f} ms",
          file=sys.stderr)

    atlas = spec_fn(r.scene_dev)
    pack_fn = jax.jit(lightchart.pack_rgbe_blocks)
    t = time_jitted(pack_fn, atlas, reps=args.reps)
    print(f"{'  pack_rgbe_blocks (per frame)':42s} {t['min']*1e3:8.2f} ms",
          file=sys.stderr)

    ld_fn = jax.jit(lambda sc: lightchart.pack_rgbe_blocks(
        lightchart.chart_light_static(
            sc, sc["chart_pos"], sc["chart_normal"], sc["chart_mat"],
            sc["chart_vis"], 1.0)))
    t = time_jitted(ld_fn, r.scene_dev, reps=3)
    print(f"{'  ld bake (amortized)':42s} {t['min']*1e3:8.2f} ms",
          file=sys.stderr)

    blocks = pack_fn(atlas)
    key = jax.random.PRNGKey(0)
    uv = jax.random.uniform(key, (h, w, 2)) * jnp.array(
        [aw - 1.0, ah - 1.0])
    light8 = jax.jit(lambda sc, a: lightchart.merge_light_planes(
        sc["chart_ld"], lightchart.pack_rgbe_planes(a)))(r.scene_dev, atlas)
    gather_fn = jax.jit(lambda b, q: lightchart.sample_light8(
        b, q, ah, aw)[0])
    t = time_jitted(gather_fn, light8, uv, reps=args.reps)
    print(f"{'  merged light gather (2M px, per shade)':42s} "
          f"{t['min']*1e3:8.2f} ms", file=sys.stderr)

    # bakes (amortized: once per upload / shadow-dirty)
    geo_fn = jax.jit(lightchart.bake_geometry)
    t = time_jitted(geo_fn, r.scene_dev, reps=3)
    print(f"{'  bake_geometry (per upload)':42s} {t['min']*1e3:8.2f} ms",
          file=sys.stderr)
    vis = r.scene_dev["chart_vis"]
    print(f"# chart_vis {vis.shape} ({vis.nbytes/1e6:.0f} MB)",
          file=sys.stderr)


if __name__ == "__main__":
    main()
