#!/usr/bin/env python
"""Stage-isolated frame breakdown at the headline bench config.

Times each pass of the frame pipeline as its own jit (realistic inputs
passed from the previous stage's output), printing a table like PERF.md's.
Run on the real chip:  python tools/profile_breakdown.py [--small]
"""

import argparse
import sys

import numpy as np

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", action="store_true")
    ap.add_argument("--shadow-extent", type=int, default=4096)
    ap.add_argument("--reps", type=int, default=6)
    ap.add_argument("--backend", type=str, default=None)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from renderengine_tpu.core import engine
    engine.init()
    from renderengine_tpu.core.config import RenderConfig, RasterConfig, CullMode
    from renderengine_tpu.graph.frame import (
        FrameRenderer, cached_vertex_outputs, _pair_budget)
    from renderengine_tpu.graph import uniforms
    from renderengine_tpu.graph.uniforms import unpack_params
    from renderengine_tpu.raster.setup import triangle_setup
    from renderengine_tpu.raster.binning import bin_triangles
    from renderengine_tpu.raster import pallas_raster as pr
    from renderengine_tpu.scene import procedural
    from renderengine_tpu.shading import pbr, shadow as shadow_mod
    from renderengine_tpu.shading.srgb import encode_srgb8
    from renderengine_tpu.utils.profiling import time_jitted

    if args.small:
        w, h, tris, ntex = 640, 480, 60_000, 64
        args.shadow_extent = min(args.shadow_extent, 1024)
    else:
        w, h, tris, ntex = 1920, 1080, 260_000, 200

    scene = procedural.sponza_scene(width=w, height=h, n_textures=ntex,
                                    target_tris=tris)
    cfg = RenderConfig(width=w, height=h, shadow_extent=args.shadow_extent,
                       translucency=True)
    r = FrameRenderer(scene, cfg, backend=args.backend)
    cfg = r.config
    print(f"# backend={r.backend} shadows={args.shadow_extent} "
          f"opq_budget={cfg.raster.pair_budget} "
          f"blend_budget={cfg.blend_pair_budget} "
          f"tile_frac={cfg.translucency_tile_fraction:.3f} "
          f"blend_tiles={cfg.blend_tile_budget}", file=sys.stderr)

    dev = r.scene_dev
    u = jax.device_put(jnp.asarray(r.uniform_for_camera()))
    rows = []

    def stage(name, fn, *a, **kw):
        jf = jax.jit(fn)
        t = time_jitted(jf, *a, reps=args.reps, **kw)
        rows.append((name, t["min"] * 1e3))
        print(f"{name:42s} {t['min']*1e3:8.2f} ms  (med {t['median']*1e3:.2f})",
              file=sys.stderr)
        return jf(*a)

    ns = r.n_shadows
    params = unpack_params(u, ns)

    # --- full frame + shadow pass -------------------------------------
    sm_t = r._shadow_fn(dev, u)
    sm = sm_t[0] if isinstance(sm_t, tuple) else sm_t
    t = time_jitted(lambda: r._fn(dev, u, sm), reps=args.reps)
    print(f"{'FULL FRAME':42s} {t['min']*1e3:8.2f} ms  (med {t['median']*1e3:.2f})",
          file=sys.stderr)
    t = time_jitted(lambda: r._shadow_fn(dev, u), reps=2)
    print(f"{'shadow pass (cached across frames)':42s} {t['min']*1e3:8.2f} ms",
          file=sys.stderr)

    # --- vertex + setup + planes --------------------------------------
    def f_vertex(dev, u):
        params = unpack_params(u, ns)
        vo = cached_vertex_outputs(dev, params["view"], params["proj"])
        s = triangle_setup(vo.clip, dev["tri_vidx"], dev["n_opaque"], w, h,
                           cfg.cull_mode)
        ap_ = pr.attribute_planes(s, vo, dev["tri_vidx"])
        return s.coef.sum() + ap_.sum()
    stage("vertex+setup+attr planes (opaque)", f_vertex, dev, u)

    vo = jax.jit(lambda dev, u: cached_vertex_outputs(
        dev, unpack_params(u, ns)["view"], unpack_params(u, ns)["proj"]))(dev, u)
    setup = jax.jit(lambda vo, dev: triangle_setup(
        vo.clip, dev["tri_vidx"], dev["n_opaque"], w, h, cfg.cull_mode))(vo, dev)
    ap_ = jax.jit(lambda s, vo, dev: pr.attribute_planes(
        s, vo, dev["tri_vidx"]))(setup, vo, dev)
    budget = cfg.raster.pair_budget or _pair_budget(
        setup.coef.shape[0], cfg.raster.pairs_per_tri)

    # --- binning + pack -----------------------------------------------
    stage(f"binning (budget {budget})",
          lambda s: bin_triangles(s, h, w, pr.TILE_H, pr.TILE_W, budget).pair_tri.sum(),
          setup)
    bins = jax.jit(lambda s: bin_triangles(s, h, w, pr.TILE_H, pr.TILE_W,
                                           budget))(setup)
    stage("pack pair rows",
          lambda s, b, a, m: pr._pack_pairs(s, b, 0, a, m).pair_data.sum(),
          setup, bins, ap_, dev["tri_material"])
    prep = jax.jit(lambda s, b, a, m: pr._pack_pairs(s, b, 0, a, m))(
        setup, bins, ap_, dev["tri_material"])

    # --- opaque raster kernel -----------------------------------------
    def f_raster(s, prep):
        g, attrs = pr.rasterize_pallas(s, h, w, max_pairs=budget,
                                       attr_planes=ap_, prepared=prep)
        return g.depth.sum() + attrs.sum()
    if r.backend == "pallas":
        stage("raster kernel (opaque, attrs)", f_raster, setup, prep)
        g, attrs = jax.jit(lambda s, p: pr.rasterize_pallas(
            s, h, w, max_pairs=budget, attr_planes=ap_, prepared=p))(setup, prep)
    else:
        print("(non-pallas backend: skipping kernel stages)", file=sys.stderr)
        return

    frag = {"pos": attrs[..., 0:3], "normal": attrs[..., 3:6],
            "uv": attrs[..., 6:8], "mat_id": g.mat_id,
            "covered": g.tri_id >= 0}
    view_args = {"view_pos": params["view_pos"], "exposure": params["exposure"],
                 "debug_input": params["debug_input"],
                 "debug_equation": params["debug_equation"]}
    slots_used = r._slots_used
    stf = params["shadow_viewproj"] if ns else None

    # --- opaque shade, split ------------------------------------------
    def f_shade(dev, frag, sm):
        return pbr.brdf_lighting(dev, frag["pos"], frag["uv"], frag["normal"],
                                 frag["mat_id"], view_args, sm, stf,
                                 slots_used=slots_used,
                                 shadow_lights=r._shadow_lights).sum()
    stage("opaque shade (full: taps+PCF+BRDF)", f_shade, dev, frag, sm)

    def f_shade_nodebug(dev, frag, sm):
        return pbr.brdf_lighting(dev, frag["pos"], frag["uv"], frag["normal"],
                                 frag["mat_id"], view_args, sm, stf,
                                 slots_used=slots_used,
                                 shadow_lights=r._shadow_lights,
                                 debug_views=False).sum()
    stage("opaque shade, debug selects off", f_shade_nodebug, dev, frag, sm)

    def f_shade_noshadow(dev, frag):
        return pbr.brdf_lighting(dev, frag["pos"], frag["uv"], frag["normal"],
                                 frag["mat_id"], view_args, None, None,
                                 slots_used=slots_used,
                                 shadow_lights=r._shadow_lights).sum()
    stage("opaque shade w/o PCF", f_shade_noshadow, dev, frag)

    def f_shade_notex(dev, frag):
        return pbr.brdf_lighting(dev, frag["pos"], frag["uv"], frag["normal"],
                                 frag["mat_id"], view_args, None, None,
                                 slots_used=(False, False, False, False),
                                 shadow_lights=r._shadow_lights).sum()
    stage("opaque shade w/o PCF w/o taps (BRDF tail)", f_shade_notex, dev, frag)

    def f_pcf(dev, frag, sm):
        return shadow_mod.compute_shadow_directional(
            sm, stf, jnp.int32(0), dev["light_pos"][0], frag["pos"],
            frag["normal"]).sum()
    if ns:
        stage("PCF window gather+compare alone", f_pcf, dev, frag, sm)

    def f_mat(dev, frag):
        m = pbr.remap_material(dev, frag["mat_id"], frag["pos"], frag["uv"],
                               frag["normal"], slots_used)
        return m["base_color"].sum() + m["normal"].sum()
    stage("material fetch+taps+TBN alone", f_mat, dev, frag)

    # --- srgb encode ---------------------------------------------------
    stage("sRGB encode u8", lambda x: encode_srgb8(x[..., :3]).sum(),
          jnp.abs(attrs[..., :3]) % 1.0)

    # --- translucent peels --------------------------------------------
    if int(np.asarray(dev["n_blend"])) > 0:
        setup_t = jax.jit(lambda vo, dev: triangle_setup(
            vo.clip, dev["blend_tri_vidx"], dev["n_blend"], w, h,
            CullMode.NONE))(vo, dev)
        ap_t = jax.jit(lambda s, vo, dev: pr.attribute_planes(
            s, vo, dev["blend_tri_vidx"]))(setup_t, vo, dev)
        bb = cfg.blend_pair_budget or 4096
        stage(f"blend bin+pack (budget {bb})",
              lambda s, a, m: pr.prepare_pallas_pairs(
                  s, h, w, max_pairs=bb, attr_planes=a,
                  tri_mat=m).pair_data.sum(),
              setup_t, ap_t, dev["blend_tri_material"])
        prep_t = jax.jit(lambda s, a, m: pr.prepare_pallas_pairs(
            s, h, w, max_pairs=bb, attr_planes=a, tri_mat=m))(
            setup_t, ap_t, dev["blend_tri_material"])
        active = cfg.blend_tile_budget or None

        def f_peel(s, p, g):
            prev = jnp.full((h, w), -1.0, jnp.float32)
            gt, at = pr.rasterize_pallas(s, h, w, max_pairs=bb,
                                         peel_bounds=(prev, g.depth),
                                         attr_planes=ap_t, prepared=p,
                                         active_tiles=active)
            return gt.depth.sum() + at.sum()
        stage("peel raster (1 layer, sparse grid)", f_peel, setup_t, prep_t, g)

        prev = jnp.full((h, w), -1.0, jnp.float32)
        gt, at = jax.jit(lambda s, p, g: pr.rasterize_pallas(
            s, h, w, max_pairs=bb, peel_bounds=(prev, g.depth),
            attr_planes=ap_t, prepared=p, active_tiles=active))(setup_t, prep_t, g)
        fragt = {"pos": at[..., 0:3], "normal": at[..., 3:6],
                 "uv": at[..., 6:8], "mat_id": gt.mat_id,
                 "covered": gt.tri_id >= 0}
        cov = float(np.asarray(jnp.mean(fragt["covered"].astype(jnp.float32))))
        print(f"# peel layer-1 coverage: {cov:.1%}", file=sys.stderr)
        stage("peel shade (full-screen dense)", f_shade, dev, fragt, sm)

    tot = sum(ms for _, ms in rows)
    print(f"# stage sum {tot:.1f} ms", file=sys.stderr)


if __name__ == "__main__":
    main()
