"""The render graph: one jitted pure function per (resolution, config).

This layer replaces the reference's command-buffer recording + render
passes (``RenderScene::Render``, ``RenderScene.cpp:168-242``): shadow depth
pass -> opaque base pass -> skybox -> (translucent) -> sRGB encode, as
straight function composition over arrays. There are no barriers or
layout transitions — XLA's dataflow is the synchronization.

Pipeline-cache analog: ``FrameRenderer`` memoizes jit-compiled executables
keyed by RenderConfig (as vkPipelines are keyed by GraphicsPipelineInfo,
``GraphicsPipelineCache.h:38-56``); resize = new (H, W) static shape = new
cache entry (``RenderLoop.cpp:150-171``).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..core.config import CullMode, RasterConfig, RenderConfig
from ..raster import reference_raster as rref
from ..raster.setup import (corner_clip, triangle_setup,
                            triangle_setup_corners, vertex_transform)
from ..raster.tiled import rasterize_tiled
from ..raster.pallas_raster import rasterize_pallas
from ..shading import pbr, phong, skybox
from ..shading import grid as grid_mod
from ..shading import shadow as shadow_mod
from ..shading.textured_quad import draw_textured_quad
from ..shading.srgb import encode_srgb8
from ..scene.camera import ViewProperties
from . import uniforms
from .uniforms import unpack_params


# test hook: force separate opaque/peel launches even where the merged
# opaque+dual-peel kernel applies (parity tests compare both paths)
_FORCE_UNMERGED = False


# --- tuned-config persistence ----------------------------------------------
# The reference persists its compiled-shader state across runs
# (Intermediate/Projects/shader_cache.json, compile-shaders.py:154-213); the
# analog here is (a) the XLA compile cache (core/engine.py) and (b) THIS
# record: the budget controller's settled values. Without it every process
# re-runs the estimators AND re-pays device compiles for each budget re-tune
# the warmup discovers; with it the first jit of a warm process is already
# the settled config — which is also exactly the executable the XLA cache
# holds from last time.

_TUNED_CFG_FIELDS = ("translucency_tile_fraction", "penumbra_tile_budget",
                     "blend_pair_budget", "blend_tile_budget",
                     "blend_layer_tile_budgets")
_TUNED_RASTER_FIELDS = ("pairs_per_tri", "pair_budget", "dense_k")


def _tuned_path():
    from ..core import engine
    import os
    return os.path.join(engine.cache_dir(), "tuned_configs.json")


def _tuned_enabled() -> bool:
    import os
    return os.environ.get("RENDERENGINE_TUNED_CACHE", "1") != "0"


def _load_tuned(key: str) -> dict | None:
    import json
    import os
    if not _tuned_enabled():
        return None
    try:
        with open(_tuned_path()) as f:
            rec = json.load(f).get(key)
        if rec:
            rec = dict(rec)
            if "blend_layer_tile_budgets" in rec:
                rec["blend_layer_tile_budgets"] = tuple(
                    rec["blend_layer_tile_budgets"])
        return rec
    except (OSError, ValueError):
        return None


def _save_tuned(key: str, rec: dict) -> None:
    import json
    import os
    if not _tuned_enabled():
        return
    path = _tuned_path()
    try:
        os.makedirs(os.path.dirname(path), exist_ok=True)
        try:
            with open(path) as f:
                all_rec = json.load(f)
        except (OSError, ValueError):
            all_rec = {}
        all_rec[key] = rec
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(all_rec, f, indent=1)
        os.replace(tmp, path)
    except OSError:
        pass  # cache dir unwritable — purely an optimization


def _static_shadow_lights(dev) -> tuple:
    """Static per-light "pays the shadow lookup" flags — traced
    light-type tests can't skip the PCF window gather, so the gate must
    be trace-time. 0 = no lookup; 1 = planar map (directional or spot);
    6 = point-light cube (six consecutive face maps). Spot and point
    shadow maps exceed the reference, whose live path renders only the
    directional map (shadow.glsl:27)."""
    lt = np.asarray(dev["light_type"])
    si = np.asarray(dev["light_shadow_index"])
    nl = int(np.asarray(dev["n_lights"]))

    def flag(i: int) -> int:
        if not (i < nl and si[i] >= 0):
            return 0
        return {1: 1, 2: 6, 3: 1}.get(int(lt[i]), 0)

    return tuple(flag(i) for i in range(lt.shape[0]))


def _pair_budget(n_tris: int, pairs_per_tri: int = 4) -> int:
    """Static pair-table budget. Overflow is counted, not silent; the
    counter is surfaced via FrameRenderer.check_binning()."""
    return pairs_per_tri * n_tris + 8192


def _effective_tiles(rc: RasterConfig, backend: str) -> tuple[int, int]:
    """Binning tile dims per backend: the pallas kernel owns its subtile
    shape (8x16 = one vreg of lanes); the jnp tiled backend uses the
    RasterConfig dims (8x128 dense vreg tiles)."""
    if backend == "pallas":
        from ..raster.pallas_raster import TILE_H, TILE_W
        return TILE_H, TILE_W
    return rc.tile_h, rc.tile_w


def rasterize(setup, height: int, width: int, rc: RasterConfig, backend: str,
              tri_offset: int = 0, y0=0, full_height: int | None = None,
              peel_bounds=None, attr_planes=None, tri_mat=None,
              prepared=None, max_pairs: int | None = None,
              active_tiles: int | None = None, peel_layers: int = 1,
              planar_attrs: bool = False):
    """Raster backend dispatch — decided at trace time (one compiled
    executable per backend, like pipelines per GraphicsPipelineInfo).
    ``y0``/``full_height`` render a row slice of a taller virtual viewport
    (multi-chip image sharding). Returns (GBuffer, attrs-or-None): the
    pallas backend interpolates vertex attributes in-kernel when
    ``attr_planes`` is given, and fills GBuffer.mat_id when ``tri_mat``
    is given. ``prepared`` reuses a pallas bin+pack across peel layers."""
    if max_pairs is None:
        max_pairs = _pair_budget(setup.coef.shape[0], rc.pairs_per_tri)
    if backend == "pallas":
        out = rasterize_pallas(setup, height, width,
                               max_pairs=max_pairs,
                               tri_offset=tri_offset, y0=y0,
                               full_height=full_height,
                               interpret=rc.pallas_interpret,
                               peel_bounds=peel_bounds,
                               attr_planes=attr_planes, tri_mat=tri_mat,
                               prepared=prepared, active_tiles=active_tiles,
                               peel_layers=peel_layers,
                               planar_attrs=planar_attrs)
        if peel_layers == 2:
            return out                    # [(g, attrs), (g, attrs)]
        return out if attr_planes is not None else (out, None)
    if peel_layers == 2:
        raise ValueError("peel_layers=2 is a pallas-only fast path")
    if backend == "tiled":
        return rasterize_tiled(setup, height, width, rc.tile_h, rc.tile_w,
                               rc.tri_chunk, max_pairs,
                               tri_offset, y0=y0, full_height=full_height,
                               peel_bounds=peel_bounds), None
    return rref.rasterize_reference(setup, height, width, tri_offset=tri_offset,
                                    y0=y0, full_height=full_height,
                                    peel_bounds=peel_bounds), None


def resolve_attributes(scene, vo, coef, g, height, width,
                       y0=0, full_height: int | None = None,
                       tri_table: str = "tri_packed"):
    """G-buffer resolve: per-pixel perspective-correct vertex attributes.
    Replaces hardware attribute interpolation feeding surface_pbr.frag.

    Gather budget per pixel: 1 tri row (vidx+material) + 3 packed
    vertex-attribute rows; barycentrics come straight from the pallas
    kernel when available (g.bary), else are recomputed from coef.
    """
    tri_id = g.tri_id
    if g.bary is not None:
        b01 = g.bary
        bary = jnp.concatenate([b01, 1.0 - b01[..., :1] - b01[..., 1:2]], axis=-1)
    else:
        bary, _ = rref.barycentrics_at(coef, tri_id, height, width, y0, full_height)
    safe_tri = jnp.maximum(tri_id, 0)
    trow = scene[tri_table][safe_tri]             # [H,W,8] one gather
    vidx = trow[..., 0:3]
    b = bary[..., None]

    # per-frame packed world attrs: pos3 | normal3 | uv2 (one [V,8] row
    # per corner instead of three narrow gathers)
    vattr = jnp.concatenate([vo.world_pos, vo.world_normal, vo.uv], axis=-1)
    corners = vattr[vidx]                         # [H,W,3,8]
    interp = (corners * b).sum(-2)                # [H,W,8]

    return {
        "pos": interp[..., 0:3],
        "normal": interp[..., 3:6],
        "uv": interp[..., 6:8],
        "mat_id": trow[..., 3],
        "covered": tri_id >= 0,
    }


def shade_sparse(shade_fn, frag, height: int, width: int,
                 tile_h: int = 8, tile_w: int = 128,
                 max_tiles: int | None = None,
                 full_height: int | None = None):
    """Run a resolve+shade function only on tiles with coverage — for
    passes that touch few pixels (translucent peel layers). Covered tiles
    are gathered into a compact pseudo-image (quad derivatives stay
    tile-local), processed, and scattered back.

    Selection is per TILE-ROW: the full-frame tile budget ``max_tiles``
    converts to k = ceil(max_tiles / full-frame tile rows) tiles per tile
    row, picked by per-row top-k coverage count (ties to the lowest tile
    index). Each tile row's selection depends only on its own 8 pixel
    rows, so an image-row sharding whose slice boundaries land on tile
    rows computes bit-identical selections AND drops to the single-chip
    pass — the shard-invariant-compaction rule (sampling.row_segments;
    a global top-k over the slice drops different tiles per shard the
    moment coverage exceeds the budget, tests/test_sharded.py sweep).
    Tiles beyond k in their row go unshaded (the caller counts them and
    re-tunes).

    ``frag``: dict of [H,W(,C)] planes handed to ``shade_fn`` compacted;
    must contain "covered". ``full_height``: full framebuffer height when
    ``height`` is a shard slice. Returns rgba [H,W,4], zeros where
    unshaded.
    """
    nty = -(-height // tile_h)
    ntx = -(-width // tile_w)
    n_tiles = nty * ntx
    nty_full = -(-(full_height or height) // tile_h)
    if max_tiles is None:
        max_tiles = max(1, nty_full * ntx // 4)
    k_row = max(1, min(-(-max_tiles // nty_full), ntx))
    ph, pw = nty * tile_h - height, ntx * tile_w - width

    def tilefy(a, fill=0):
        """[H,W(,C)] -> [nty, ntx, th, tw(,C)]."""
        a = jnp.pad(a, ((0, ph), (0, pw)) + ((0, 0),) * (a.ndim - 2),
                    constant_values=fill)
        a = a.reshape(nty, tile_h, ntx, tile_w, *a.shape[2:])
        return jnp.moveaxis(a, 2, 1)

    cov_rows = tilefy(frag["covered"])               # [nty, ntx, th, tw]
    cov_cnt = cov_rows.reshape(nty, ntx, -1).sum(-1)
    _, sel = jax.lax.top_k(cov_cnt, k_row)           # [nty, k_row]

    def gather_img(a):
        t = jnp.take_along_axis(
            tilefy(a), sel.reshape(nty, k_row, *(1,) * a.ndim),
            axis=1)                                  # [nty,k,th,tw,...]
        return t.reshape(nty * k_row * tile_h, tile_w, *t.shape[4:])

    sub = {k: gather_img(v) for k, v in frag.items()}
    rgba_sub = shade_fn(sub)

    # scatter tiles back
    r = rgba_sub.reshape(nty, k_row, tile_h, tile_w, 4)
    out = jnp.zeros((nty, ntx, tile_h, tile_w, 4), rgba_sub.dtype)
    rows = jnp.arange(nty, dtype=jnp.int32)[:, None]
    out = out.at[rows, sel].set(r, mode="drop")
    out = jnp.moveaxis(out, 2, 1).reshape(nty * tile_h, ntx * tile_w, 4)
    return out[:height, :width]


# per-raster-call tile-count ceiling for the pallas kernel: its scalar
# prefetch arrays (tile_map/starts/counts/phase, 4B each per tile) live in
# SMEM; 32768 tiles (= a full 2048^2 map at 8x16 tiles) is known-good,
# 4096^2 in one call (131072 tiles) exceeds SMEM. Bigger maps render as
# row slices through the same y0/full_height path the sharded frame uses.
_PALLAS_TILE_LIMIT = 32768


def shadow_slices(extent: int, backend: str) -> int:
    """Static row-slice count for a depth-only raster at ``extent``^2."""
    if backend != "pallas":
        return 1
    from ..raster.pallas_raster import TILE_H, TILE_W
    n_tiles = (-(-extent // TILE_H)) * (-(-extent // TILE_W))
    n = -(-n_tiles // _PALLAS_TILE_LIMIT)
    while extent % n or (extent // n) % TILE_H:
        n += 1
    return n


def render_shadow_maps(scene, shadow_viewproj, extent: int,
                       n_shadows: int, rc: RasterConfig, backend: str,
                       max_pairs: int | None = None):
    """Depth-only raster per shadow map (reference ``ShadowSystem::Render``,
    front-culled to reduce peter-panning, ``ShadowSystem.cpp:37-53``).
    shadow_viewproj: [NS,4,4]. Returns ([NS,E,E] f32, overflow i32): the
    shadow views' tile spans differ from the camera view's, so their
    binning overflow is counted separately ('overflow is counted, not
    silent' holds for every raster pass). 4096^2-class maps raster as row
    slices (see ``_PALLAS_TILE_LIMIT``); ``max_pairs`` is the per-slice
    budget."""
    from ..raster.setup import restrict_rows

    maps = []
    overflow = jnp.zeros((), jnp.int32)
    n_slices = shadow_slices(extent, backend)
    slice_h = extent // n_slices
    for si in range(n_shadows):
        m = shadow_viewproj[si]
        c = corner_clip(scene["corner_attr"][..., 0:3], m)
        s = triangle_setup_corners(c, scene["n_tris"], extent, extent,
                                   CullMode.FRONT)
        budget = max_pairs or _pair_budget(s.coef.shape[0], rc.pairs_per_tri)

        def slice_body(ov, y0, s=s, budget=budget):
            ss = restrict_rows(s, y0, slice_h, extent)
            if backend == "pallas":
                from ..raster.pallas_raster import prepare_pallas_pairs
                prep = prepare_pallas_pairs(ss, slice_h, extent,
                                            max_pairs=budget)
                ov = ov + prep.bins.n_overflow
                g, _ = rasterize(ss, slice_h, extent, rc, backend,
                                 prepared=prep, max_pairs=budget,
                                 y0=y0, full_height=extent)
            else:
                if backend == "tiled":
                    from ..raster.binning import count_span_overflow
                    ov = ov + count_span_overflow(
                        ss, rc.tile_h, rc.tile_w, budget)
                g, _ = rasterize(ss, slice_h, extent, rc, backend,
                                 max_pairs=budget, y0=y0, full_height=extent)
            return ov, g.depth

        if n_slices == 1:
            if backend == "pallas":
                from ..raster.pallas_raster import prepare_pallas_pairs
                prep = prepare_pallas_pairs(s, slice_h, extent,
                                            max_pairs=budget)
                overflow = overflow + prep.bins.n_overflow
                g, _ = rasterize(s, slice_h, extent, rc, backend,
                                 prepared=prep, max_pairs=budget)
            else:
                if backend == "tiled":
                    from ..raster.binning import count_span_overflow
                    overflow = overflow + count_span_overflow(
                        s, rc.tile_h, rc.tile_w, budget)
                g, _ = rasterize(s, slice_h, extent, rc, backend,
                                 max_pairs=budget)
            maps.append(g.depth)
        else:
            # lax.scan over row slices: big maps (4096^2 = 8 slices past
            # _PALLAS_TILE_LIMIT) used to UNROLL the whole bin+sort+pack+
            # kernel chain per slice — 8x the generated code (the 22 MB
            # shadow program, round-5 compile-size fix). restrict_rows
            # takes a traced y0, so one slice body serves all slices.
            ov, rows = jax.lax.scan(
                slice_body, jnp.zeros((), jnp.int32),
                jnp.arange(n_slices, dtype=jnp.int32) * slice_h)
            overflow = overflow + ov
            maps.append(rows.reshape(extent, extent))
    return jnp.stack(maps), overflow


def render_shadow_pass(scene, uniform, config: RenderConfig, n_shadows: int,
                       backend: str = "reference", max_pairs: int | None = None,
                       return_overflow: bool = False):
    """Standalone shadow depth pass, cached across frames by the caller —
    the reference renders it once until marked dirty
    (``RenderScene.cpp:170-181``), while the shadow *transforms* keep
    updating per frame (``ShadowSystem::Update``); we replicate both."""
    params = unpack_params(uniform, n_shadows)
    maps, overflow = render_shadow_maps(
        scene, params["shadow_viewproj"],
        config.shadow_extent, n_shadows, config.raster, backend,
        max_pairs=max_pairs)
    # pack once per (cached) render: 3x3 PCF becomes 4 block gathers
    packed = shadow_mod.pack_shadow_blocks(maps)
    return (packed, overflow) if return_overflow else packed


def cached_vertex_outputs(scene, view, proj):
    """Vertex stage over the world-space cache (static transforms paid at
    upload): per-frame work is one 4x4 application per vertex, no gathers."""
    from ..raster.setup import VertexOutputs

    world = scene["world_pos"]
    proj = jnp.asarray(proj, jnp.float32)
    view = jnp.asarray(view, jnp.float32)
    vp = (proj[:, :, None] * view[None, :, :]).sum(1)
    world_h = jnp.concatenate([world, jnp.ones_like(world[:, :1])], axis=-1)
    clip = (vp[None, :, :] * world_h[:, None, :]).sum(-1)
    return VertexOutputs(world, scene["world_normal"], scene["uvs"], clip)


def render_frame(scene, uniform, shadow_maps, config: RenderConfig,
                 n_shadows: int, backend: str = "reference",
                 has_translucent: bool = False,
                 slots_used=(True, True, True, True),
                 return_stats: bool = False,
                 shadow_lights=None, has_mask: bool = False,
                 alpha_is_factor: bool = False):
    """The per-frame pass chain (minus the cached shadow depth).
    scene: device dict; uniform: packed per-frame float32 vector
    (``graph.uniforms``); shadow_maps: packed blocks or None.
    Returns [H,W,4] uint8 (sRGB-encoded, like the swapchain); with
    ``return_stats`` also a dict with ``pair_overflow`` (i32 scalar: binned
    pairs that did not fit the static budget this frame — nonzero means
    dropped triangles; FrameRenderer reacts by re-tuning + re-jitting)."""
    params = unpack_params(uniform, n_shadows)
    vo = cached_vertex_outputs(scene, params["view"], params["proj"])
    out = _frame_core(scene, params, vo, shadow_maps, config, n_shadows,
                      backend, has_translucent, slots_used, return_stats,
                      shadow_lights=shadow_lights, has_mask=has_mask,
                      alpha_is_factor=alpha_is_factor)
    return out if return_stats else out[0]


def _frame_core(scene, params, vo, shadow_maps, config: RenderConfig,
                n_shadows: int, backend: str,
                has_translucent: bool, slots_used,
                return_stats: bool = False,
                y0=0, slice_h: int | None = None,
                shadow_lights=None, has_mask: bool = False,
                alpha_is_factor: bool = False, ls_atlas=None):
    """Slice-aware frame body shared by the single-chip path (y0=0,
    slice_h=H) and the multi-chip image-row-sharded path
    (``parallel.sharded``: y0 = device row offset, traced under
    shard_map). Returns (img [slice_h,W,4] u8, stats dict) — one code
    path, so multi-chip has the full single-chip feature set by
    construction."""
    from ..raster.setup import restrict_rows

    fh, w = config.render_extent()
    slice_h = fh if slice_h is None else slice_h
    is_full = slice_h == fh
    overflow = jnp.zeros((), jnp.int32)
    tail_overflow = jnp.zeros((), jnp.int32)   # span>dense_k big-cap drops
    blend_overflow = jnp.zeros((), jnp.int32)
    shade_tile_counts = []   # observed covered shade tiles per peel layer
    shadow_stats = []        # (penumbra tiles, overflow) per shadow lookup

    shadow_tf = None
    if config.shadows and n_shadows > 0:
        shadow_tf = params["shadow_viewproj"]

    view_args = {
        "view_pos": params["view_pos"],
        "exposure": params["exposure"],
        "debug_input": params["debug_input"],
        "debug_equation": params["debug_equation"],
    }

    from ..core.config import ShadingModel
    from functools import partial as _partial
    base_shade = (pbr.brdf_lighting if config.shading == ShadingModel.PBR
                  else phong.phong_lighting)
    shade = _partial(base_shade, slots_used=slots_used,
                     shadow_lights=shadow_lights,
                     max_aniso=config.aniso(),
                     dither=config.dither_trilinear,
                     debug_views=config.debug_views,
                     penumbra_tiles=config.penumbra_tile_budget,
                     penumbra_full_h=fh,
                     shadow_stats=shadow_stats,
                     ibl_diffuse=config.ibl_diffuse)

    # texture-space mode: run the per-frame SPECULAR chart pass once
    # (dense VPU over chart texels, zero gathers — shading/lightchart.py);
    # the diffuse table scene["chart_ld"] is static (baked on upload /
    # shadow-dirty / exposure change). Every raster pass below then
    # shades via one albedo tap + two 16-byte light gathers instead of
    # the full per-pixel BRDF chain.
    tss = config.texture_space
    if tss:
        from ..shading import lightchart
        if ls_atlas is None:
            # (the sharded path computes this pass row-sharded over the
            # atlas and passes the gathered result in — see
            # parallel.sharded.render_frame_sharded)
            ls_atlas = lightchart.chart_light_spec(
                scene, scene["chart_pos"], scene["chart_normal"],
                scene["chart_mat"], scene["chart_vis"], view_args)
        c_ah, c_aw = ls_atlas.shape[1:]          # planar [3,Ah,Aw]
        pre_any = config.tss_preshaded or config.tss_preshaded_blend
        if pre_any:
            # PRE-SHADED charts: compose rgb = albedo*ld + ls in CHART
            # space per frame (dense VPU + one rgb9e5 re-pack); a
            # pre-shaded screen pass is ONE 16-byte block gather per pixel
            # (+ a 4-byte alpha block when the pass blends)
            rgb_blocks = lightchart.pack_rgbe_blocks(
                scene["chart_base"] + ls_atlas)
            a_blocks = scene["chart_a"]

            def tss_shade_pre_px(chart_uv, uv, mat_id, need_alpha=True,
                                 covered=None):
                # alpha_is_factor (bake-time check): no base texture
                # modulates alpha, so the peel alpha is the material
                # factor — a small-table MXU lookup beats a per-pixel
                # alpha-block gather (gathers price per index)
                out = lightchart.tss_shade_pre(
                    rgb_blocks, a_blocks, chart_uv, c_ah, c_aw,
                    need_alpha=need_alpha and not alpha_is_factor)
                if need_alpha and alpha_is_factor:
                    from ..shading import sampling
                    fa = sampling.table_lookup_planar(
                        scene["mat_all"], mat_id, (3,))[0]
                    out = jnp.concatenate(
                        [out[..., :3],
                         fa[..., None].astype(jnp.float32)], axis=-1)
                return out

            use_halfres_pre = (config.chart_density <= 0.5
                               if config.tss_halfres_light < 0
                               else bool(config.tss_halfres_light))

            def tss_shade_pre_dense(chart_uv, uv, mat_id, need_alpha=True,
                                    covered=None):
                # DENSE full-screen pre-shaded pass: gather the rgb block
                # table on the half grid + chart-uv-guided upsample (the
                # pre-shaded chart varies at chart density anyway); alpha
                # stays exact via the material-factor path when possible
                if not use_halfres_pre:
                    return tss_shade_pre_px(chart_uv, uv, mat_id,
                                            need_alpha)
                out = lightchart.tss_shade_pre_halfres(
                    rgb_blocks, a_blocks, chart_uv, c_ah, c_aw, y0=y0,
                    need_alpha=need_alpha and not alpha_is_factor)
                if need_alpha and alpha_is_factor:
                    from ..shading import sampling
                    fa = sampling.table_lookup_planar(
                        scene["mat_all"], mat_id, (3,))[0]
                    out = jnp.concatenate(
                        [out[..., :3],
                         fa[..., None].astype(jnp.float32)], axis=-1)
                return out

        if config.tss_preshaded:
            tss_shade_px = tss_shade_pre_px
            tss_shade_dense = tss_shade_pre_dense
        else:
            # ONE merged [Ah*Aw,8] row table: static diffuse planes
            # (chart_ld) + per-frame specular planes — every light lookup
            # is then a single 32-byte gather
            light8 = lightchart.merge_light_planes(
                scene["chart_ld"], lightchart.pack_rgbe_planes(ls_atlas))

            def tss_shade_px(chart_uv, uv, mat_id, need_alpha=True,
                             covered=None):
                return lightchart.tss_shade(
                    scene, chart_uv, uv, mat_id, light8,
                    c_ah, c_aw,
                    slots_used=slots_used, max_aniso=config.aniso(),
                    dither=config.dither_trilinear, covered=covered)

            use_halfres = (config.chart_density <= 0.5
                           if config.tss_halfres_light < 0
                           else bool(config.tss_halfres_light))

            def tss_shade_dense(chart_uv, uv, mat_id, need_alpha=True,
                                covered=None):
                # any DENSE [slice_h, W] pass at <= half-pixel chart
                # density samples the light field on the half-res pixel
                # grid (4x fewer gather indices; albedo/alpha stay
                # full-res) — this covers the opaque base pass AND
                # full-coverage peel layers (a screen-filling banner costs
                # two dense shades otherwise)
                if use_halfres:
                    return lightchart.tss_shade_halfres(
                        scene, chart_uv, uv, mat_id, light8,
                        c_ah, c_aw, y0=y0,
                        slots_used=slots_used,
                        max_aniso=config.aniso(),
                        dither=config.dither_trilinear, covered=covered)
                return tss_shade_px(chart_uv, uv, mat_id, covered=covered)

        # blend-peel shade fns: pre-shaded when any preshaded flag is on
        # (chart-res albedo behind alpha blending is visually mild — the
        # cheap 80% of tss_preshaded), else the factored fns above
        if tss and pre_any:
            tss_shade_blend_px = tss_shade_pre_px
            tss_shade_blend_dense = tss_shade_pre_dense
        elif tss:
            tss_shade_blend_px = tss_shade_px
            tss_shade_blend_dense = tss_shade_dense

    # opaque base pass
    from ..raster.pallas_raster import attribute_planes

    # opaque count: with the cutoff pass on, MASK tris leave the opaque list
    # (they sit between n_opaque_strict and n_opaque) and draw in their own
    # peeled pass below; otherwise they draw opaque (reference parity)
    n_opq = (scene["n_opaque_strict"] if (config.alpha_mask and has_mask)
             else scene["n_opaque"])
    # zero-gather setup path: clip corners are a dense FMA over the STATIC
    # per-corner attr tables (scene.upload), not a clip[tri_vidx] gather
    vpm = (params["proj"][:, :, None] * params["view"][None, :, :]).sum(1)
    setup = triangle_setup_corners(
        corner_clip(scene["corner_attr"][..., 0:3], vpm), n_opq, w,
        fh, config.cull_mode)
    setup_s = setup if is_full else restrict_rows(setup, y0, slice_h, fh)
    if backend != "pallas":
        ap = None
    elif tss:
        from ..shading.lightchart import tss_attribute_planes
        ap = tss_attribute_planes(setup, corner_uv=scene["chart_corner"],
                                  uv_corners=scene["corner_attr"][..., 6:8])
    else:
        ap = attribute_planes(setup, corners=scene["corner_attr"])
    opq_budget = (config.raster.pair_budget
                  or _pair_budget(setup.coef.shape[0],
                                  config.raster.pairs_per_tri))
    prep = None
    if backend == "pallas":
        from ..raster.pallas_raster import prepare_pallas_pairs
        prep = prepare_pallas_pairs(
            setup_s, slice_h, w, max_pairs=opq_budget,
            attr_planes=ap, tri_mat=scene["tri_material"],
            dense_k=config.raster.dense_k or None)
        overflow = overflow + prep.bins.n_overflow
        tail_overflow = tail_overflow + prep.bins.n_tail
    elif return_stats and backend == "tiled":
        from ..raster.binning import count_span_overflow
        overflow = overflow + count_span_overflow(
            setup_s, config.raster.tile_h, config.raster.tile_w, opq_budget)

    # merged launch: on the TSS pallas path the opaque base pass and the
    # first TWO translucent peel layers share ONE tile walk (the former
    # dual-peel launch was intercept-dominated: a full per-tile sweep for
    # a ~66k-pair blend list at the headline)
    merged_ok = (backend == "pallas" and tss and config.translucency
                 and has_translucent and config.translucency_layers >= 2
                 and not (config.alpha_mask and has_mask)
                 and not _FORCE_UNMERGED)
    merged_layers = None
    setup_ts = ap_t = prep_t = None
    if config.translucency and has_translucent:
        setup_t = triangle_setup_corners(
            corner_clip(scene["corner_attr_blend"][..., 0:3], vpm),
            scene["n_blend"], w, fh, CullMode.NONE)
        setup_ts = (setup_t if is_full
                    else restrict_rows(setup_t, y0, slice_h, fh))
        if backend != "pallas":
            ap_t = None
        elif tss:
            from ..shading.lightchart import tss_attribute_planes
            ap_t = tss_attribute_planes(
                setup_t, corner_uv=scene["chart_corner_blend"],
                uv_corners=scene["corner_attr_blend"][..., 6:8])
        else:
            ap_t = attribute_planes(setup_t,
                                    corners=scene["corner_attr_blend"])
        blend_budget = (config.blend_pair_budget
                        or _pair_budget(setup_t.coef.shape[0],
                                        config.raster.pairs_per_tri))
        if backend == "pallas":
            # bin + pack ONCE: every peel rasters the same blend geometry
            from ..raster.pallas_raster import prepare_pallas_pairs
            prep_t = prepare_pallas_pairs(
                setup_ts, slice_h, w, max_pairs=blend_budget,
                attr_planes=ap_t, tri_mat=scene["blend_tri_material"],
                dense_k=config.raster.dense_k or None)
            blend_overflow = prep_t.bins.n_overflow
            tail_overflow = tail_overflow + prep_t.bins.n_tail
        elif return_stats and backend == "tiled":
            from ..raster.binning import count_span_overflow
            blend_overflow = count_span_overflow(
                setup_ts, config.raster.tile_h, config.raster.tile_w,
                blend_budget)

    if merged_ok:
        from ..raster.pallas_raster import rasterize_pallas_merged
        # pre-shaded peels consume chart_uv only: the kernel's blend
        # stream interpolates just that prefix (uv planes drop out of the
        # dual tracker's FMA + select chains)
        nab = 2 if (config.tss_preshaded or config.tss_preshaded_blend) \
            else None
        (g, attrs), merged_layers = rasterize_pallas_merged(
            setup_s, slice_h, w, prep, prep_t,
            interpret=config.raster.pallas_interpret,
            y0=y0, full_height=fh, n_attrs_b=nab)
    else:
        g, attrs = rasterize(setup_s, slice_h, w, config.raster, backend,
                             attr_planes=ap, y0=y0, full_height=fh,
                             tri_mat=scene["tri_material"], prepared=prep,
                             max_pairs=opq_budget, planar_attrs=tss)

    if tss:
        from ..shading.lightchart import resolve_tss
        if attrs is not None:
            # planar attrs: chart_uv / uv ride as 2D plane pairs (minor-
            # dim slices of a stacked [...,4] cost real relayout ms)
            mat_id = (g.mat_id if g.mat_id is not None
                      else scene["tri_material"][jnp.maximum(g.tri_id, 0)])
            frag = {"chart_uv": (attrs[0], attrs[1]),
                    "uv": (attrs[2], attrs[3]),
                    "mat_id": mat_id, "covered": g.tri_id >= 0}
        else:
            frag = resolve_tss(scene, setup.coef, g, slice_h, w,
                               y0=y0, full_height=fh)
        rgba = tss_shade_dense(frag["chart_uv"], frag["uv"],
                               frag["mat_id"], need_alpha=False,
                               covered=frag["covered"])
    elif attrs is not None:
        if g.mat_id is not None:
            mat_id = g.mat_id          # rode the pair-aux word: no gather
        else:
            mat_id = scene["tri_material"][jnp.maximum(g.tri_id, 0)]
        frag = {"pos": attrs[..., 0:3], "normal": attrs[..., 3:6],
                "uv": attrs[..., 6:8], "mat_id": mat_id,
                "covered": g.tri_id >= 0}
        rgba = shade(scene, frag["pos"], frag["uv"], frag["normal"],
                     frag["mat_id"], view_args, shadow_maps, shadow_tf,
                     covered=frag["covered"])
    else:
        frag = resolve_attributes(scene, vo, setup.coef, g, slice_h, w,
                                  y0=y0, full_height=fh)
        rgba = shade(scene, frag["pos"], frag["uv"], frag["normal"],
                     frag["mat_id"], view_args, shadow_maps, shadow_tf,
                     covered=frag["covered"])
    covered = frag["covered"]
    depth_eff = g.depth

    # alpha-MASK cutoff pass (beyond the reference's live path, which draws
    # MASK opaque — GraphicsPipelineCache.cpp creates only opaque/blend
    # pipelines): glTF semantics say discard fragments with sampled alpha <
    # material.alphaCutoff. Discarding under a z-buffer means the surface
    # BEHIND shows through, so we depth-peel the (small) MASK draw list
    # front-to-back and keep the nearest PASSING fragment per pixel;
    # stacked discarded layers beyond config.mask_layers fall back to the
    # opaque surface. Shadows still treat MASK as opaque casters (parity).
    if config.alpha_mask and has_mask:
        setup_m = triangle_setup_corners(
            corner_clip(scene["corner_attr_mask"][..., 0:3], vpm),
            scene["n_mask"], w, fh, config.cull_mode)
        setup_ms = (setup_m if is_full
                    else restrict_rows(setup_m, y0, slice_h, fh))
        ap_m = (attribute_planes(setup_m,
                                 corners=scene["corner_attr_mask"])
                if backend == "pallas" else None)
        mask_budget = _pair_budget(setup_m.coef.shape[0],
                                   config.raster.pairs_per_tri)
        prep_m = None
        if backend == "pallas":
            from ..raster.pallas_raster import prepare_pallas_pairs
            prep_m = prepare_pallas_pairs(
                setup_ms, slice_h, w, max_pairs=mask_budget,
                attr_planes=ap_m, tri_mat=scene["mask_tri_material"],
                dense_k=config.raster.dense_k or None)
            overflow = overflow + prep_m.bins.n_overflow
            tail_overflow = tail_overflow + prep_m.bins.n_tail
        prev_m = jnp.full((slice_h, w), -1.0, jnp.float32)
        resolved = jnp.zeros((slice_h, w), bool)
        for _ in range(config.mask_layers):
            gm, attrs_m = rasterize(setup_ms, slice_h, w, config.raster,
                                    backend, peel_bounds=(prev_m, depth_eff),
                                    attr_planes=ap_m, prepared=prep_m,
                                    y0=y0, full_height=fh,
                                    tri_mat=scene["mask_tri_material"],
                                    max_pairs=mask_budget)
            covered_m = gm.tri_id >= 0
            if attrs_m is not None:
                mat_m = (gm.mat_id if gm.mat_id is not None
                         else scene["mask_tri_material"][jnp.maximum(gm.tri_id, 0)])
                frag_m = {"pos": attrs_m[..., 0:3], "normal": attrs_m[..., 3:6],
                          "uv": attrs_m[..., 6:8], "mat_id": mat_m}
            else:
                frag_m = resolve_attributes(scene, vo, setup_m.coef, gm,
                                            slice_h, w, y0=y0, full_height=fh,
                                            tri_table="mask_tri_packed")
            rgba_m = shade(scene, frag_m["pos"], frag_m["uv"],
                           frag_m["normal"], frag_m["mat_id"], view_args,
                           shadow_maps, shadow_tf, covered=covered_m)
            cutoff = scene["mat_core"][frag_m["mat_id"], 13]
            accept = covered_m & (rgba_m[..., 3] >= cutoff) & ~resolved
            rgba = jnp.where(accept[..., None], rgba_m, rgba)
            depth_eff = jnp.where(accept, gm.depth, depth_eff)
            resolved = resolved | accept
            prev_m = jnp.where(covered_m, gm.depth, 2.0)
        covered = covered | resolved

    # skybox where nothing was drawn (reference draws it last at far depth).
    # Reference quirk kept: the cubemap is a Unorm format sampled raw
    # (skybox.frag:30), so its stored (sRGB-encoded) values pass through as
    # if linear and get re-encoded by the swapchain.
    if config.skybox:
        sky_fn = (skybox.render_skybox_halfres if config.sky_halfres
                  else skybox.render_skybox)
        sky = sky_fn(scene["cubemap"], params["inv_vp_rot"],
                     slice_h, w, y0=y0, full_height=fh)
        rgb = jnp.where(covered[..., None], rgba[..., :3], sky[..., :3])
    else:
        rgb = jnp.where(covered[..., None], rgba[..., :3], 0.0)

    # translucent pass: depth-peeled K nearest layers, composited
    # back-to-front with src-alpha blending — the order-correct version of
    # the reference's per-mesh back-to-front sorted draws with culling off
    # (RenderScene.cpp:127-159, GraphicsPipelineCache.cpp:307).
    if config.translucency and has_translucent:
        # (the blend draw list's setup/binning was hoisted above the
        # opaque raster so the merged launch could consume it)
        prev = jnp.full((slice_h, w), -1.0, jnp.float32)
        layers = []
        # budgets are stated in FULL-FRAME tiles (shard-invariance rule:
        # shade_sparse converts to a per-tile-row k by the full height, so
        # a row-sharded slice selects and drops identically to single-chip)
        ntx_b = -(-w // config.raster.tile_w)
        nty_full_b = -(-fh // config.raster.tile_h)
        n_tiles = nty_full_b * ntx_b
        shared_budget = max(1, int(n_tiles * config.translucency_tile_fraction))
        layer_budgets = config.blend_layer_tile_budgets

        def resolve_and_shade(fr, dense=False):
            # resolve + shade on the compacted pseudo-image (few tiles);
            # ``dense``: fr holds full [slice_h, W] planes (a full-coverage
            # peel layer), so the half-res light path applies
            tss_sh = tss_shade_blend_dense if (tss and dense) else (
                tss_shade_blend_px if tss else None)
            if "attrs" in fr or "cu_x" in fr:
                if "mat_id" in fr:
                    mat_t = fr["mat_id"]
                else:
                    mat_t = scene["blend_tri_material"][jnp.maximum(fr["tri_id"], 0)]
                if tss:
                    if "cu_x" in fr:   # planar attr planes (pallas+tss)
                        # pre-shaded peels carry no uv planes (the shade
                        # fn ignores uv; the kernel skipped them)
                        uv_pl = ((fr["u_x"], fr["u_y"])
                                 if "u_x" in fr else None)
                        return tss_sh((fr["cu_x"], fr["cu_y"]),
                                      uv_pl, mat_t, covered=fr["covered"])
                    return tss_sh(fr["attrs"][..., 0:2],
                                  fr["attrs"][..., 2:4], mat_t,
                                  covered=fr["covered"])
                fsub = {"pos": fr["attrs"][..., 0:3],
                        "normal": fr["attrs"][..., 3:6],
                        "uv": fr["attrs"][..., 6:8],
                        "mat_id": mat_t}
            else:
                gsub = rref.GBuffer(depth=None, tri_id=fr["tri_id"], bary=fr["bary"])
                if tss:
                    from ..shading.lightchart import resolve_tss
                    fsub = resolve_tss(scene, setup_t.coef, gsub,
                                       *fr["tri_id"].shape,
                                       tri_table="blend_tri_packed",
                                       corner_table="chart_corner_blend")
                    return tss_sh(fsub["chart_uv"], fsub["uv"],
                                  fsub["mat_id"], covered=fr["covered"])
                fsub = resolve_attributes(scene, vo, setup_t.coef, gsub,
                                          *fr["tri_id"].shape,
                                          tri_table="blend_tri_packed")
            return shade(scene, fsub["pos"], fsub["uv"], fsub["normal"],
                         fsub["mat_id"], view_args, shadow_maps, shadow_tf,
                         covered=fr["covered"])

        active = (config.blend_tile_budget or None) if backend == "pallas" \
            else None
        if backend == "pallas" and active:
            # sparse peel grid correctness guard: covered tiles beyond the
            # static budget would render empty
            blend_overflow = blend_overflow + jnp.maximum(
                (prep_t.bins.counts > 0).sum() - active, 0)
        # pallas: successive peel layers raster PAIRWISE in one launch
        # (the dual two-min kernel) — each launch pays the full per-tile
        # walk + DMA sweep, so halving launches halves that fixed cost.
        # The first two layers usually arrive from the MERGED launch
        # (shared with the opaque pass — zero extra tile walks).
        raster_layers = []
        li = 0
        if merged_layers is not None:
            raster_layers.extend(merged_layers)
            g_last = merged_layers[1][0]
            prev = jnp.where(g_last.tri_id >= 0, g_last.depth, 2.0)
            li = 2
        while li < config.translucency_layers:
            if backend == "pallas" and li + 1 < config.translucency_layers:
                pair = rasterize(setup_ts, slice_h, w, config.raster,
                                 backend, peel_bounds=(prev, depth_eff),
                                 attr_planes=ap_t, prepared=prep_t,
                                 y0=y0, full_height=fh,
                                 max_pairs=blend_budget,
                                 active_tiles=active, peel_layers=2,
                                 planar_attrs=tss)
                raster_layers.extend(pair)
                g_last = pair[1][0]
                li += 2
            else:
                g_a = rasterize(setup_ts, slice_h, w, config.raster,
                                backend, peel_bounds=(prev, depth_eff),
                                attr_planes=ap_t, prepared=prep_t,
                                y0=y0, full_height=fh,
                                max_pairs=blend_budget,
                                active_tiles=active, planar_attrs=tss)
                raster_layers.append(g_a)
                g_last = g_a[0]
                li += 1
            prev = jnp.where(g_last.tri_id >= 0, g_last.depth, 2.0)
        for li, (gt, attrs_t) in enumerate(raster_layers):
            budget = (layer_budgets[li] if li < len(layer_budgets)
                      else shared_budget)
            budget = max(1, min(int(budget), n_tiles))
            covered_t = gt.tri_id >= 0
            sp_in = {"covered": covered_t, "tri_id": gt.tri_id}
            if gt.mat_id is not None:
                sp_in["mat_id"] = gt.mat_id
            if attrs_t is not None and isinstance(attrs_t, list):
                # planar attr planes (pallas+tss): separate dict keys so
                # the sparse tile gather/scatter stays per-plane; merged
                # pre-shaded peels carry chart_uv only (uv never consumed
                # there — and dropping it also skips its sparse gathers)
                sp_in["cu_x"], sp_in["cu_y"] = attrs_t[0], attrs_t[1]
                if len(attrs_t) > 2:
                    sp_in["u_x"], sp_in["u_y"] = attrs_t[2], attrs_t[3]
            elif attrs_t is not None:
                sp_in["attrs"] = attrs_t
            elif gt.bary is not None:
                sp_in["bary"] = gt.bary
            else:  # non-pallas backends: recompute bary densely
                bary_t, _ = rref.barycentrics_at(setup_t.coef, gt.tri_id,
                                                 slice_h, w, y0, fh)
                sp_in["bary"] = bary_t[..., :2]
            if budget >= n_tiles:
                # full-coverage layer (e.g. a screen-filling banner):
                # the sparse tilefy/top-k/gather/scatter is pure overhead
                rgba_t = resolve_and_shade(sp_in, dense=True)
            else:
                rgba_t = shade_sparse(
                    resolve_and_shade, sp_in,
                    slice_h, w, config.raster.tile_h, config.raster.tile_w,
                    max_tiles=budget, full_height=fh)
            if return_stats:
                # observed need per layer in BUDGET-equivalent units
                # (budget >= need <=> the per-row k covers the busiest
                # tile row — mirrors shade_sparse's conversion); beyond-k
                # tiles went unshaded => fold into the overflow counter
                th_, tw_ = config.raster.tile_h, config.raster.tile_w
                nty_ = -(-slice_h // th_)
                ph_ = nty_ * th_ - slice_h
                pw_ = ntx_b * tw_ - w
                ct = jnp.pad(covered_t, ((0, ph_), (0, pw_)))
                ct = ct.reshape(nty_, th_, ntx_b, tw_)
                row_need = ct.any(axis=(1, 3)).sum(-1)       # [nty]
                shade_tile_counts.append(row_need.max() * nty_full_b)
                if budget < n_tiles:
                    k_row_ = max(1, min(-(-budget // nty_full_b), ntx_b))
                    blend_overflow = blend_overflow + jnp.maximum(
                        row_need - k_row_, 0).sum()
            layers.append((covered_t, rgba_t))
        for covered_t, rgba_t in reversed(layers):
            a = jnp.clip(rgba_t[..., 3], 0.0, 1.0) * covered_t
            rgb = rgb * (1.0 - a[..., None]) + rgba_t[..., :3] * a[..., None]

    # editor ground grid (drawable form of the reference's never-drawn
    # Grid, SURVEY 2.3; blended + depth-tested against the opaque z-buffer)
    if config.grid:
        rgb = grid_mod.render_grid(params["inv_vp"], params["view"],
                                   params["proj"], depth_eff, rgb,
                                   y0=y0, full_height=fh)

    # shadow-map preview overlay (TexturedQuad grayscale mode; anchored to
    # a screen corner, so full-frame only — the sharded path composites it
    # host-side if ever needed)
    if config.show_shadow_quad and shadow_maps is not None and is_full:
        # packed u32-pair 4x4 stride-2 windows: even texel (2a-2, 2b-2)
        # is the low u16 of word 0; a half-res preview is plenty
        draw_src = (shadow_maps.blocks[0, 1:, 1:, 0]
                    & jnp.uint32(0xFFFF)).astype(jnp.float32) / 65535.0
        rgb = draw_textured_quad(rgb, draw_src, grayscale=True)

    if config.ssaa > 1:
        f = config.ssaa
        assert slice_h % f == 0, "slice height must divide the SSAA factor"
        rgb = rgb.reshape(slice_h // f, f, config.width, f, 3).mean(axis=(1, 3))

    img = encode_srgb8(rgb)
    stats = {"pair_overflow": overflow,
             "pair_tail_overflow": tail_overflow,
             "blend_pair_overflow": blend_overflow}
    if shade_tile_counts:
        stats["blend_shade_tiles"] = jnp.stack(shade_tile_counts)
    if shadow_stats:
        n_pen = shadow_stats[0][0]
        pen_ov = jnp.zeros((), jnp.int32)
        for np_, ov_ in shadow_stats:
            n_pen = jnp.maximum(n_pen, np_)
            pen_ov = pen_ov + ov_
        stats["penumbra_tiles"] = n_pen
        stats["penumbra_overflow"] = pen_ov
    return img, stats


class FrameRenderer:
    """Holds the jit cache and marshals host state into device args.

    The analog of Renderer+RenderScene's per-frame path
    (``Renderer.cpp:98-111``). Per-frame host->device traffic is ONE packed
    uniform vector; the shadow depth pass is cached until
    ``mark_shadows_dirty()`` (reference dirty-flag semantics).
    """

    def __init__(self, scene_host, config: RenderConfig, device=None,
                 backend: str | None = None):
        from ..shading import fitting  # local import to avoid cycles

        self._fitting = fitting
        self.scene_host = scene_host
        self.config = config
        self.n_shadows = scene_host.n_shadow_maps if config.shadows else 0
        if config.texture_space:
            # subdivide huge-footprint triangles at upload so every chart
            # fits MAX_R texels at the requested density (a 40 m floor
            # otherwise caps at one MAX_R^2 square and blurs near the
            # camera — scene._chart_subdivide)
            _vp0 = ViewProperties.from_camera(scene_host.camera)
            dev = scene_host.upload(chart_subdiv=dict(
                viewproj=np.asarray(_vp0.proj) @ np.asarray(_vp0.view),
                width=config.width, height=config.height,
                density=config.chart_density))
        else:
            dev = scene_host.upload()
        if config.texture_space:
            # light-chart layout (host, once) — charts sized from the
            # INITIAL camera footprint (shading/lightchart.py)
            from ..core.config import ShadingModel as _SM
            from ..shading import lightchart
            assert config.shading == _SM.PBR and not config.alpha_mask, \
                "texture_space supports the PBR path without the MASK pass"
            assert not config.debug_views, \
                "texture_space: set debug_views=False (no debug taps in " \
                "the factored screen pass)"
        else:
            assert not (config.tss_preshaded or config.tss_preshaded_blend), \
                "tss_preshaded(_blend) requires texture_space=True"
        if config.texture_space:
            vp0 = ViewProperties.from_camera(scene_host.camera)
            viewproj = np.asarray(vp0.proj) @ np.asarray(vp0.view)
            lightchart.attach_chart_layout(dev, viewproj, config)
        # keep the (small) geometry slice of the host dict: the budget
        # estimates below are host-side PLANNING, so they jit on the local
        # CPU backend — through a remote-device tunnel every compile RPC
        # costs ~15-20 s of fixed latency, and init used to pay five of
        # them for scalar budget numbers
        self._est_np = {k: np.asarray(dev[k]) for k in (
            "world_pos", "world_normal", "uvs", "tri_vidx", "n_tris",
            "n_opaque", "blend_tri_vidx", "n_blend") if k in dev}
        self.scene_dev = jax.device_put(dev, device)
        if backend is None:
            # Pallas on real TPUs; dense-jnp tiled loop elsewhere. Tiny
            # scenes fall back to brute force (less launch overhead).
            if config.raster.use_pallas and jax.default_backend() == "tpu":
                backend = "pallas"
            elif int(dev["n_tris"]) <= 256:
                backend = "reference"
            else:
                backend = "tiled"
        self.backend = backend
        # tuned-config record: adopt the previous process's SETTLED budgets
        # (controller grows ratchet, so the record converges) — the warm
        # process then jits the settled config first, which is exactly the
        # executable the persistent XLA cache holds
        self._tuned_key = self._make_tuned_key(dev)
        tuned = (_load_tuned(self._tuned_key)
                 if backend in ("pallas", "tiled")
                 and config.raster.auto_tune_pairs else None)
        self._tuned_shadow_budget = None
        if tuned:
            rc_kw = {k: tuned[k] for k in _TUNED_RASTER_FIELDS if k in tuned}
            cfg_kw = {k: tuned[k] for k in _TUNED_CFG_FIELDS if k in tuned}
            if rc_kw:
                cfg_kw["raster"] = dataclasses.replace(config.raster, **rc_kw)
            self.config = config = config.replace(**cfg_kw)
            self._tuned_shadow_budget = tuned.get("shadow_budget")
        elif backend in ("pallas", "tiled") and config.raster.auto_tune_pairs:
            ppt, abs_budget, dense_k = self._estimate_pair_budget()
            self.config = config = config.replace(
                raster=dataclasses.replace(
                    config.raster, pairs_per_tri=ppt,
                    pair_budget=abs_budget, dense_k=dense_k))
        has_translucent = int(dev["n_blend"]) > 0
        if (not tuned and has_translucent and config.translucency
                and backend in ("pallas", "tiled")
                and config.raster.auto_tune_pairs):
            frac, blend_budget, tile_budget = self._estimate_blend_budgets()
            self.config = config = config.replace(
                translucency_tile_fraction=min(
                    config.translucency_tile_fraction, frac),
                blend_pair_budget=blend_budget,
                blend_tile_budget=tile_budget)
        slots_used = tuple(bool((dev[k] >= 0).any()) for k in
                           ("mat_tex_base", "mat_tex_emissive",
                            "mat_tex_orm", "mat_tex_normal"))
        self._has_translucent = has_translucent
        self._has_mask = int(dev.get("n_mask", 0)) > 0
        self._slots_used = slots_used
        if config.texture_space:
            # alpha_is_factor decided HOST-side (texture alpha channels +
            # material factors) so the frame fn's static config is final
            # BEFORE the bake compiles — the AOT prewarm below then
            # overlaps the frame/shadow compiles with the bake compile
            # instead of serializing behind a device readback
            from ..shading import lightchart
            self._alpha_is_factor = lightchart.host_alpha_is_factor(
                dev, getattr(scene_host, "textures", None))
        self._shadow_lights = _static_shadow_lights(dev)
        # react-to-overflow: the frame fn also reports the binning
        # overflow counter; render() polls it (without stalling the
        # async pipeline) and re-tunes + re-jits when triangles dropped
        self._react_overflow = (backend in ("pallas", "tiled")
                                and config.raster.auto_tune_pairs)
        self._pending_overflow = []
        # observed per-peel-layer coverage (drives reactive re-tune)
        self._blend_obs = []
        self._polls_since_blend_retune = 0
        # consecutive low observations before a shrink re-jit. Must exceed
        # the period of typical camera motion (an orbit/turntable revisits
        # its densest view every few dozen frames): a shrink based on a
        # window SHORTER than the motion period re-overflows at the next
        # peak and the controller oscillates, paying a compile per cycle.
        self.blend_shrink_after = 64
        self.blend_tile_floor = 16     # smallest per-layer shade budget
        self._pen_obs = []
        self._polls_since_pen_retune = 0
        self._pen_tuned = False
        # shrink floors: budgets an overflow proved insufficient (ratchet)
        self._blend_floor = ()
        self._pen_floor = 0
        # two-stage PCF pays once the window table dwarfs the coarse one;
        # start at 35% of tiles and let observation tighten it
        if (self.n_shadows > 0 and backend in ("pallas", "tiled")
                and config.raster.auto_tune_pairs
                and config.shadow_extent >= 1024
                and config.penumbra_tile_budget == 0):
            self.config = config = config.replace(
                penumbra_tile_budget=max(
                    256, self._shade_tile_total() * 35 // 100))
        # shadow pass keeps its own pair budget: its tile spans differ
        # wildly from the camera view's (a 4096^2 ortho fit of the whole
        # scene), so measure them once at init — a mis-sized budget either
        # drops shadow geometry or re-jits the expensive 4096^2 pass
        if self._tuned_shadow_budget:
            self._shadow_budget_val = int(self._tuned_shadow_budget)
        elif self.n_shadows > 0 and backend in ("pallas", "tiled") \
                and config.raster.auto_tune_pairs:
            self._shadow_budget_val = self._estimate_shadow_budget()
        else:
            self._shadow_budget_val = _pair_budget(
                int(dev["tri_vidx"].shape[0]), config.raster.pairs_per_tri)
        self._rebuild_frame_fn()
        self._shadow_maps = None
        self._shadows_dirty = True
        self._shadow_vp_cache = None
        # kick off the frame + shadow AOT compiles NOW (background
        # thread), then run the TSS bake on this thread — the two big
        # compile RPCs overlap instead of serializing (round-5 cold-start
        # fix: bake ~25 s + frame/shadow ~60 s used to add up)
        self._prewarm_thread = None
        self._start_prewarm()
        if config.texture_space:
            # device bakes (once per upload): per-texel geometry, full
            # material remap, optional pre-shaded albedo, static light
            # tables — shared with ShardedRenderer (lightchart.py)
            from ..shading import lightchart
            self._baked_exposure = float(scene_host.camera.exposure)
            up, self._ld_fn, self._alpha_is_factor = \
                lightchart.setup_scene_tss(self.scene_dev, config,
                                           slots_used,
                                           self._baked_exposure,
                                           self._alpha_is_factor)
            self.scene_dev.update(up)
        if not tuned and backend in ("pallas", "tiled") \
                and config.raster.auto_tune_pairs:
            self._save_tuned_now()   # estimator results; re-tunes update it
        # the geometry slice exists only for the init-time budget
        # estimators above (reactive re-tunes use overflow counters);
        # holding it would pin tens of MB of host memory per renderer.
        # _estimate_* methods guard on this with an explanatory error.
        self._est_np = None

    def _make_tuned_key(self, dev) -> str:
        """Content key for the tuned-config record: scene geometry + the
        BASE config (tuned fields zeroed) + backend."""
        import hashlib
        h = hashlib.md5()
        for k in ("positions", "tri_vidx", "n_tris", "n_blend"):
            if k in dev:
                h.update(np.ascontiguousarray(np.asarray(dev[k])).tobytes())
        base = self.config.replace(
            **{k: getattr(RenderConfig(), k) for k in _TUNED_CFG_FIELDS})
        base = base.replace(raster=dataclasses.replace(
            base.raster, **{k: getattr(RasterConfig(), k)
                            for k in _TUNED_RASTER_FIELDS}))
        h.update(repr(base).encode())
        h.update(self.backend.encode())
        h.update(str(self.n_shadows).encode())
        return h.hexdigest()

    def _save_tuned_now(self) -> None:
        """Write the CURRENT budgets to the tuned-config record (called
        after init estimation and after every controller re-tune)."""
        if not getattr(self, "_tuned_key", None):
            return
        cfg = self.config
        rec = {k: getattr(cfg, k) for k in _TUNED_CFG_FIELDS}
        rec["blend_layer_tile_budgets"] = list(rec["blend_layer_tile_budgets"])
        for k in _TUNED_RASTER_FIELDS:
            rec[k] = getattr(cfg.raster, k)
        rec["shadow_budget"] = int(getattr(self, "_shadow_budget_val", 0))
        _save_tuned(self._tuned_key, rec)

    def _rebuild_frame_fn(self) -> None:
        self._fn = jax.jit(partial(render_frame, config=self.config,
                                   n_shadows=self.n_shadows,
                                   backend=self.backend,
                                   has_translucent=self._has_translucent,
                                   has_mask=self._has_mask,
                                   slots_used=self._slots_used,
                                   shadow_lights=self._shadow_lights,
                                   return_stats=self._react_overflow,
                                   alpha_is_factor=getattr(
                                       self, "_alpha_is_factor", False)))
        # keep the shadow fn in lockstep with config re-tunes so a later
        # mark_shadows_dirty() never renders with a stale budget
        self._rebuild_shadow_fn()

    def _shadow_budget(self) -> int:
        return self._shadow_budget_val

    def _start_prewarm(self) -> None:
        """Best-effort BACKGROUND AOT of the frame + shadow programs from
        shape specs (the TSS chart shapes come from eval_shape of the
        bake — nothing executes). Runs concurrently with the bake compile
        on the init thread; both populate the persistent compile cache,
        and ``render()`` joins the thread so its own jit call becomes a
        cache read instead of a second compile. Compile RPCs through the
        tunnel are independent subprocesses, so they genuinely overlap."""
        if self.backend not in ("pallas", "tiled"):
            return
        try:
            import threading

            specs = {k: jax.ShapeDtypeStruct(v.shape, v.dtype)
                     for k, v in self.scene_dev.items()}
            if self.config.texture_space:
                from ..shading import lightchart
                specs.update(lightchart.bake_output_specs(
                    specs, self.config, self._slots_used))
            u = np.asarray(self.uniform_for_camera())
            u_spec = jax.ShapeDtypeStruct(u.shape, u.dtype)
        except Exception:
            return

        sm_spec = None
        if self.n_shadows > 0 and self.config.shadows:
            try:
                out_info = jax.eval_shape(self._shadow_fn, specs, u_spec)
                # (packed, overflow) when return_overflow, else the bare
                # ShadowPack (a NamedTuple — check _fields, not
                # isinstance(tuple))
                packed = (out_info if hasattr(out_info, "_fields")
                          else out_info[0])
                sm_spec = jax.tree.map(
                    lambda s: jax.ShapeDtypeStruct(s.shape, s.dtype),
                    packed)
            except Exception:
                return

        def work_shadow():
            try:
                self._shadow_fn.lower(specs, u_spec).compile()
            except Exception:
                pass    # prewarm is best-effort; render() compiles lazily

        def work_frame():
            try:
                self._fn.lower(specs, u_spec, sm_spec).compile()
            except Exception:
                pass

        # one thread per program: the compile RPCs are independent helper
        # subprocesses, so shadow and frame compile CONCURRENTLY with the
        # bake on the init thread — cold start ~= max, not sum
        threads = [threading.Thread(target=work_frame, daemon=True)]
        if sm_spec is not None:
            threads.append(threading.Thread(target=work_shadow,
                                            daemon=True))
        for t in threads:
            t.start()
        self._prewarm_thread = threads

    def _join_prewarm(self) -> None:
        ts = getattr(self, "_prewarm_thread", None)
        if ts is not None:
            for t in (ts if isinstance(ts, list) else [ts]):
                t.join()
            self._prewarm_thread = None

    @staticmethod
    def _planning_device():
        """Local CPU device for budget-estimate jits (scalar planning
        math): keeps init off the device-compile path — each remote
        compile RPC costs ~15-20 s through the axon tunnel."""
        try:
            return jax.default_device(jax.devices("cpu")[0])
        except RuntimeError:
            import contextlib
            return contextlib.nullcontext()

    def _estimate_shadow_budget(self) -> int:
        """Measure the (tile, triangle) spans each shadow view produces at
        the shadow extent (one cheap jit per map: setup + span sum, no
        sort) and keep 1.3x headroom — the light fit tracks the scene, not
        the camera, so the count is stable across frames. Big maps raster
        in row slices (``shadow_slices``), so the budget is per-slice:
        the worst slice's span count over all maps."""
        assert self._est_np is not None, (
            "budget estimators are init-time only: the geometry slice is "
            "released at the end of __init__ (reactive re-tunes use the "
            "overflow counters, not these estimators)")
        e = self.config.shadow_extent
        eth, etw = _effective_tiles(self.config.raster, self.backend)
        n_slices = shadow_slices(e, self.backend)
        sl_ty = (e // n_slices) // eth     # tile rows per slice
        svp = self._fitting.shadow_transforms_for_scene(self.scene_host)

        @jax.jit
        def worst_slice_spans(scene, m):
            world = scene["world_pos"]
            world_h = jnp.concatenate(
                [world, jnp.ones_like(world[:, :1])], axis=-1)
            clip = (m[None, :, :] * world_h[:, None, :]).sum(-1)
            s = triangle_setup(clip, scene["tri_vidx"], scene["n_tris"],
                               e, e, CullMode.FRONT)
            tx0 = s.bbox[:, 0] // etw
            ty0 = s.bbox[:, 1] // eth
            tx1 = s.bbox[:, 2] // etw
            ty1 = s.bbox[:, 3] // eth
            nx = tx1 - tx0 + 1
            worst = jnp.zeros((), jnp.int32)
            for sl in range(n_slices):
                a, b = sl * sl_ty, (sl + 1) * sl_ty - 1
                ny = jnp.minimum(ty1, b) - jnp.maximum(ty0, a) + 1
                spans = jnp.where(s.valid & (ny > 0), nx * ny, 0).sum()
                worst = jnp.maximum(worst, spans)
            return worst

        with self._planning_device():
            worst = max(int(worst_slice_spans(self._est_np,
                                              np.asarray(m, np.float32)))
                        for m in np.asarray(svp))
        budget = int(1.3 * worst) + 8192
        if budget > self._MAX_PAIRS:
            from ..utils.log import get_logger
            get_logger().warning(
                "shadow span estimate %d exceeds the pair-table cap %d; "
                "shadow maps may drop geometry (overflow is counted)",
                budget, self._MAX_PAIRS)
        return min(self._MAX_PAIRS, budget)

    def _rebuild_shadow_fn(self) -> None:
        self._shadow_fn = jax.jit(partial(
            render_shadow_pass, config=self.config, n_shadows=self.n_shadows,
            backend=self.backend, max_pairs=self._shadow_budget(),
            return_overflow=True))

    def _estimate_pair_budget(self) -> tuple[int, int, int]:
        """Size the pair-table budget from the initial camera: count the
        (tile, triangle) pairs the scene actually produces (one cheap jit —
        setup + span sum, no sort) and keep 2x headroom, floor 2. The
        overflow counter (binning_stats) still guards camera changes."""
        assert self._est_np is not None, (
            "budget estimators are init-time only: the geometry slice is "
            "released at the end of __init__ (reactive re-tunes use the "
            "overflow counters, not these estimators)")
        cfg = self.config
        h, w = cfg.render_extent()
        eth, etw = _effective_tiles(cfg.raster, self.backend)
        vp = ViewProperties.from_camera(self.scene_host.camera)

        @jax.jit
        def total_pairs(scene, view, proj):
            # post-cull live estimate (binning.py::live_pairs_estimate):
            # the dense binning voids corner-test failures, so sizing the
            # budget from the bbox span sum would bake its ~15-25%
            # overcount into every frame's sort+pack+gather
            from ..raster.binning import live_pairs_estimate
            vo = cached_vertex_outputs(scene, view, proj)
            s = triangle_setup(vo.clip, scene["tri_vidx"], scene["n_opaque"],
                               w, h, cfg.cull_mode)
            return live_pairs_estimate(s, h, w, eth, etw,
                                       cfg.raster.pairs_per_tri)

        with self._planning_device():
            total = int(total_pairs(self._est_np, np.asarray(vp.view),
                                    np.asarray(vp.proj)))
        t = int(self._est_np["tri_vidx"].shape[0])
        # absolute budget with 1.35x headroom for the opaque pass (the
        # sort/pack/row-gather all run over the whole STATIC budget —
        # measured ~25 ms/frame of per-pair gathers at a 606k budget, so
        # every unused slot is a real per-frame tax); growth on overflow
        # ratchets, and the bench/viewer warm the full orbit so routine
        # camera paths settle after at most a few one-time re-jits. The
        # shadow pass keeps the per-tri multiplier (its spans differ from
        # the camera view's).
        ppt = min(64, max(2, -(-2 * total // max(t, 1))))
        abs_budget = min(self._MAX_PAIRS, int(1.35 * total) + 8192)

        @jax.jit
        def span_quantile(scene, view, proj):
            # smallest k whose span>k triangle count fits the dense
            # binning's big-list cap with 4x orbit margin = the
            # (CAP/4)-th largest bbox span at the init camera
            from ..raster.binning import _BIG_TRI_CAP
            vo = cached_vertex_outputs(scene, view, proj)
            s = triangle_setup(vo.clip, scene["tri_vidx"],
                               scene["n_opaque"], w, h, cfg.cull_mode)
            tx0 = s.bbox[:, 0] // etw
            ty0 = s.bbox[:, 1] // eth
            nx = s.bbox[:, 2] // etw - tx0 + 1
            ny = s.bbox[:, 3] // eth - ty0 + 1
            span = jnp.where(s.valid, nx * ny, 0).astype(jnp.int32)
            q = _BIG_TRI_CAP // 4
            return jax.lax.sort(span, dimension=0)[-q]

        with self._planning_device():
            dk = int(span_quantile(self._est_np, np.asarray(vp.view),
                                   np.asarray(vp.proj)))
        # dense-grid binning when the bulk of the spans is small; a
        # span-heavy view (k would exceed 16: dense rows ~16x T) keeps
        # the fill path, which has no compaction cap
        dense_k = max(4, dk) if dk <= 16 else 0
        return ppt, abs_budget, dense_k

    def _estimate_blend_budgets(self) -> tuple[float, int, int]:
        """Size the translucency budgets from the initial camera: the
        translucent draw list is usually few LARGE triangles covering a
        small screen fraction (hanging banners, glass), so neither the 25%
        sparse-shading tile default nor the opaque per-tri pair budget fit
        its span profile. Returns (shade tile fraction, raster pair budget,
        raster covered-tile budget), each with 2x headroom; the overflow
        reaction covers camera moves past them."""
        assert self._est_np is not None, (
            "budget estimators are init-time only: the geometry slice is "
            "released at the end of __init__ (reactive re-tunes use the "
            "overflow counters, not these estimators)")
        from ..raster.binning import bin_triangles

        cfg = self.config
        h, w = cfg.render_extent()
        n_tiles = (-(-h // cfg.raster.tile_h)) * (-(-w // cfg.raster.tile_w))
        eth, etw = _effective_tiles(cfg.raster, self.backend)
        nte = (-(-h // eth)) * (-(-w // etw))
        vp = ViewProperties.from_camera(self.scene_host.camera)

        @jax.jit
        def spans_only(scene, view, proj):
            vo = cached_vertex_outputs(scene, view, proj)
            s = triangle_setup(vo.clip, scene["blend_tri_vidx"],
                               scene["n_blend"], w, h, CullMode.NONE)

            def spans(th, tw):
                tx0 = s.bbox[:, 0] // tw
                ty0 = s.bbox[:, 1] // th
                tx1 = s.bbox[:, 2] // tw
                ty1 = s.bbox[:, 3] // th
                return jnp.where(s.valid,
                                 (tx1 - tx0 + 1) * (ty1 - ty0 + 1), 0).sum()

            return spans(cfg.raster.tile_h, cfg.raster.tile_w), spans(eth, etw)

        with self._planning_device():
            shade_spans, pair_spans = spans_only(
                self._est_np, np.asarray(vp.view), np.asarray(vp.proj))
        pair_budget = max(3 * int(pair_spans) // 2, 4096)

        # two-phase: spans sized the bin budget; now count EXACT covered
        # tiles at the kernel tile size (the sparse peel grid runs only
        # covered tiles)
        @jax.jit
        def exact_tiles(scene, view, proj):
            vo = cached_vertex_outputs(scene, view, proj)
            s = triangle_setup(vo.clip, scene["blend_tri_vidx"],
                               scene["n_blend"], w, h, CullMode.NONE)
            b = bin_triangles(s, h, w, eth, etw, pair_budget)
            return (b.counts > 0).sum()

        with self._planning_device():
            n_active = int(exact_tiles(self._est_np, np.asarray(vp.view),
                                       np.asarray(vp.proj)))
        tiles = min(max(2 * int(shade_spans), 16), n_tiles)
        tile_budget = min(max(2 * n_active, 256), nte)
        return tiles / n_tiles, pair_budget, tile_budget

    def mark_shadows_dirty(self) -> None:
        """Re-render shadow depth next frame (scene or light changed)."""
        self._shadows_dirty = True
        self._shadow_vp_cache = None   # refit to the CURRENT camera/scene

    def binning_stats(self, view_props=None) -> dict:
        """One-off host check of the pair-table budget for the current
        camera: {'live': pairs used, 'budget': capacity, 'overflow':
        dropped pairs}. Overflow > 0 means raise RasterConfig.pairs_per_tri."""
        from ..raster.binning import bin_triangles

        h, w = self.config.render_extent()
        u = uniforms.pack_params(self.params_for_camera(view_props), self.n_shadows)
        params = unpack_params(jnp.asarray(u), self.n_shadows)
        budget = (self.config.raster.pair_budget
                  or _pair_budget(self.scene_dev["tri_vidx"].shape[0],
                                  self.config.raster.pairs_per_tri))
        eth, etw = _effective_tiles(self.config.raster, self.backend)

        @jax.jit
        def stats(scene, view, proj):
            vo = cached_vertex_outputs(scene, view, proj)
            s = triangle_setup(vo.clip, scene["tri_vidx"], scene["n_opaque"],
                               w, h, self.config.cull_mode)
            b = bin_triangles(s, h, w, eth, etw, budget)
            return b.pair_valid.sum(), b.n_overflow

        live, overflow = stats(self.scene_dev, params["view"], params["proj"])
        return {"live": int(live), "budget": int(budget),
                "overflow": int(overflow)}

    def params_for_camera(self, view_props: ViewProperties | None = None) -> dict:
        cam = self.scene_host.camera
        vp = view_props or ViewProperties.from_camera(cam)
        params = vp.as_arrays()
        params["inv_vp_rot"] = skybox.skybox_ray_matrix(vp.view, vp.proj)
        params["inv_vp"] = grid_mod.grid_unproject_matrix(vp.view, vp.proj)
        if self.n_shadows > 0:
            # fit ONCE per dirty-flag cycle and cache. Deliberate
            # divergence: the reference refits per frame
            # (RenderScene.cpp:163-164 -> ShadowSystem::Update) while
            # rendering depth only on the dirty flag
            # (RenderScene.cpp:169-174) — i.e. it samples REFIT
            # coordinates against depths rendered with the old fit.
            # Caching the fit with the maps keeps sampling consistent,
            # and drops ~18 ms/frame of host AABB walking (measured as
            # the single biggest per-frame dispatch cost).
            if self._shadows_dirty or self._shadow_vp_cache is None:
                self._shadow_vp_cache = \
                    self._fitting.shadow_transforms_for_scene(self.scene_host)
            params["shadow_viewproj"] = self._shadow_vp_cache
        return params

    def uniform_for_camera(self, view_props: ViewProperties | None = None):
        return uniforms.pack_params(self.params_for_camera(view_props),
                                    self.n_shadows)

    # growth ceiling: the packed pair table is P2 x 512B, so cap the budget
    # where the pack array reaches ~1 GB rather than letting repeated
    # doubling OOM the chip
    _MAX_PAIRS = 2_000_000

    def _poll_overflow(self) -> None:
        """Consume ready overflow counters from in-flight frames; on a
        nonzero count, double the overflowing budget (opaque pairs_per_tri
        or the blend pair budget — their span profiles differ wildly) and
        re-jit: a one-frame hitch instead of silently dropping geometry
        when the camera enters a dense view. Never blocks on an unfinished
        frame unless the queue is deep."""
        grew = False
        while self._pending_overflow:
            st = self._pending_overflow[0]
            ov = st["pair_overflow"]
            blend_ov = st["blend_pair_overflow"]
            # NEVER block on an unfinished frame: popping an unready head
            # forces a synchronous wait (+ tunnel round-trip) inside the
            # dispatch loop, serializing host and device. The queue is
            # bounded by the device's completion rate (frames finish in
            # order), so unconsumed stats never pile past a few entries;
            # cap at 16 as a memory backstop.
            if (not grew and len(self._pending_overflow) <= 16
                    and hasattr(ov, "is_ready") and not ov.is_ready()):
                break
            self._pending_overflow.pop(0)
            if grew:
                continue
            if "blend_shade_tiles" in st:
                self._observe_blend_tiles(np.asarray(st["blend_shade_tiles"]))
            if "penumbra_tiles" in st:
                self._observe_penumbra(int(np.asarray(st["penumbra_tiles"])))
            from ..utils.log import get_logger
            cfg = self.config
            rc = cfg.raster
            t = int(self.scene_dev["tri_vidx"].shape[0])
            tail_ov = st.get("pair_tail_overflow")
            if tail_ov is not None and int(tail_ov) > 0 and rc.dense_k:
                # span>dense_k triangles overflowed the dense binning's
                # big-list cap — budget growth can NEVER fix these, so
                # grow K (more spans handled densely); past 16 the dense
                # rows outweigh the scatters they save, fall back to the
                # capless fill path
                nk = rc.dense_k + max(2, rc.dense_k // 2)
                nk = nk if nk <= 16 else 0
                get_logger().warning(
                    "dense binning big-cap overflow (%d dropped): "
                    "dense_k %d -> %s, re-jitting", int(tail_ov),
                    rc.dense_k, nk or "fill path")
                cfg = cfg.replace(raster=dataclasses.replace(
                    rc, dense_k=nk))
                rc = cfg.raster
            if int(ov) > 0 and 0 < rc.pair_budget < self._MAX_PAIRS:
                # absolute opaque budget (the auto-tuned path): the sort
                # slice makes the overflow count EXACT (live = budget +
                # dropped), so grow straight to the observed need plus
                # 15% headroom — the sort/pack run over the whole static
                # budget, so a doubling ladder's overshoot would be a
                # per-frame tax long after the camera move
                need = rc.pair_budget + int(ov)
                nb = min(self._MAX_PAIRS,
                         max(need + need // 7 + 8192,
                             rc.pair_budget + 8192))
                get_logger().warning(
                    "pair budget overflow (%d dropped): budget %d -> %d, "
                    "re-jitting", int(ov), rc.pair_budget, nb)
                cfg = cfg.replace(raster=dataclasses.replace(
                    rc, pair_budget=nb))
            elif (int(ov) > 0 and rc.pairs_per_tri < 64
                    and rc.pairs_per_tri * t < self._MAX_PAIRS):
                new_ppt = min(64, rc.pairs_per_tri
                              + max(1, rc.pairs_per_tri // 2))
                get_logger().warning(
                    "pair budget overflow (%d dropped): pairs_per_tri "
                    "%d -> %d, re-jitting", int(ov), rc.pairs_per_tri,
                    new_ppt)
                cfg = cfg.replace(raster=dataclasses.replace(
                    rc, pairs_per_tri=new_ppt))
            bb = cfg.blend_pair_budget
            if int(blend_ov) > 0:
                # the counter folds pair, sparse-grid tile AND sparse-shade
                # tile overflow; grow every budget that exists. Per-layer
                # shade budgets jump straight to 2x the OBSERVED coverage
                # when it is larger than plain doubling (one re-jit, not a
                # doubling ladder).
                changed = {}
                if 0 < bb < self._MAX_PAIRS:
                    changed["blend_pair_budget"] = bb * 2
                if cfg.blend_tile_budget:
                    changed["blend_tile_budget"] = min(
                        2 * cfg.blend_tile_budget, self._MAX_PAIRS)
                if cfg.translucency_tile_fraction < 1.0:
                    changed["translucency_tile_fraction"] = min(
                        1.0, 2.0 * cfg.translucency_tile_fraction)
                if cfg.blend_layer_tile_budgets:
                    total = self._shade_tile_total()
                    obs = (self._blend_obs[-1] if self._blend_obs
                           else [0] * len(cfg.blend_layer_tile_budgets))
                    changed["blend_layer_tile_budgets"] = tuple(
                        min(total, max(2 * b, 2 * int(o)))
                        for b, o in zip(cfg.blend_layer_tile_budgets, obs))
                if changed:
                    get_logger().warning(
                        "blend budget overflow (%d dropped): growing %s, "
                        "re-jitting", int(blend_ov), sorted(changed))
                    cfg = cfg.replace(**changed)
                    # ratchet: the pre-grow budgets are PROVEN too small
                    # (overflow is exact evidence). Floor future shrinks at
                    # the grown values and demand a fresh low streak, or an
                    # orbiting camera oscillates shrink->overflow->grow,
                    # paying a re-jit compile every few frames.
                    if "blend_layer_tile_budgets" in changed:
                        self._blend_floor = tuple(
                            max(a, b) for a, b in zip(
                                changed["blend_layer_tile_budgets"],
                                self._blend_floor
                                or (0,) * len(changed["blend_layer_tile_budgets"])))
                    self._blend_obs.clear()
                    self._polls_since_blend_retune = 0
            pen_ov = st.get("penumbra_overflow")
            if pen_ov is not None and int(pen_ov) > 0 \
                    and cfg.penumbra_tile_budget:
                # over-budget penumbra tiles rendered the fully-shadowed
                # estimate this frame: jump to 1.5x the observed count
                total = self._shade_tile_total()
                obs = int(np.asarray(st["penumbra_tiles"]))
                nb = min(total, max(2 * cfg.penumbra_tile_budget,
                                    obs + obs // 2))
                if nb > cfg.penumbra_tile_budget:
                    get_logger().warning(
                        "penumbra tile budget overflow (%d over): "
                        "%d -> %d, re-jitting", int(pen_ov),
                        cfg.penumbra_tile_budget, nb)
                    cfg = cfg.replace(penumbra_tile_budget=nb)
                    self._pen_floor = max(self._pen_floor, nb)
                    self._pen_obs.clear()
                    self._polls_since_pen_retune = 0
            if cfg is not self.config:
                self.config = cfg
                self._rebuild_frame_fn()
                self._save_tuned_now()
                grew = True
        if not grew:
            self._maybe_retune_blend_layers()
            self._maybe_retune_penumbra()

    def _shade_tile_total(self) -> int:
        h, w = self.config.render_extent()
        return ((-(-h // self.config.raster.tile_h))
                * (-(-w // self.config.raster.tile_w)))

    def _observe_blend_tiles(self, counts: np.ndarray) -> None:
        self._blend_obs.append(counts.astype(np.int64))
        if len(self._blend_obs) > max(64, self.blend_shrink_after):
            self._blend_obs.pop(0)
        self._polls_since_blend_retune += 1

    def _maybe_retune_blend_layers(self) -> None:
        """Drive the per-peel-layer sparse-shade budgets from OBSERVED
        coverage (previous frames' covered-tile counts) instead of the
        initial-camera estimate: deeper layers usually cover far less than
        layer 1 (a screen-filling banner has little banner-behind-banner),
        so the shared budget shades ~2 full screens where ~1.1 suffices.

        Policy (re-jits are pipeline-rebuild-class hitches, so be frugal):
        - first ready observation -> set budgets = 2x observed, once;
        - shrink only after ``blend_shrink_after`` consecutive
          observations all below 1/4 of budget (growth is handled by the
          overflow counter, which is exact).
        """
        if not self._blend_obs or not self._react_overflow:
            return
        n_tiles = self._shade_tile_total()
        cur = self.config.blend_layer_tile_budgets
        first = not cur

        def target(c: int) -> int:
            # 2x headroom; saturate to the dense path near full coverage
            # (the sparse gather/scatter is pure overhead there)
            t = 2 * int(c)
            return n_tiles if t >= n_tiles else \
                min(n_tiles, max(self.blend_tile_floor, t))

        def floored(vals):
            if not self._blend_floor:
                return vals
            fl = self._blend_floor + (0,) * (len(vals) - len(self._blend_floor))
            return tuple(max(v, f) for v, f in zip(vals, fl))

        if first:
            new = floored(tuple(target(c) for c in self._blend_obs[-1]))
        else:
            window = self._blend_obs[-self.blend_shrink_after:]
            due = (len(window) >= self.blend_shrink_after
                   and self._polls_since_blend_retune
                   >= self.blend_shrink_after)
            if not due:
                return
            worst = np.maximum.reduce(window)
            raw = tuple(target(c) for c in worst)
            new = floored(raw)
            # shrink-only here (growth is the overflow counter's job, and
            # it is exact); require a real gap to avoid re-jit churn
            if not (len(new) == len(cur)
                    and all(b <= c for b, c in zip(new, cur))
                    and any(2 * b < c for b, c in zip(new, cur))):
                # if the floor alone blocked a real shrink, decay it: each
                # grow->blocked-shrink cycle halves the gap, so an orbiting
                # camera converges instead of oscillating (bounded re-jits)
                if (self._blend_floor and len(raw) == len(cur)
                        and any(2 * b < c for b, c in zip(raw, cur))):
                    self._blend_floor = tuple(f // 2 for f in self._blend_floor)
                    self._polls_since_blend_retune = 0
                return
        if new != cur:
            from ..utils.log import get_logger
            get_logger().info(
                "blend shade budgets <- observed coverage: %s -> %s "
                "(of %d tiles), re-jitting", cur or "(shared)", new, n_tiles)
            self.config = self.config.replace(blend_layer_tile_budgets=new)
            self._rebuild_frame_fn()
            self._save_tuned_now()
        self._polls_since_blend_retune = 0

    def _observe_penumbra(self, count: int) -> None:
        self._pen_obs.append(count)
        if len(self._pen_obs) > max(64, self.blend_shrink_after):
            self._pen_obs.pop(0)
        self._polls_since_pen_retune += 1

    def _maybe_retune_penumbra(self) -> None:
        """Tighten the two-stage-PCF window budget to ~1.5x the OBSERVED
        penumbra tile count (same frugal policy as the blend budgets:
        one first-observation tune, then shrink only after a streak)."""
        if not self._pen_obs or not self._react_overflow \
                or not self.config.penumbra_tile_budget:
            return
        total = self._shade_tile_total()
        cur = self.config.penumbra_tile_budget

        def target(c: int) -> int:
            return max(min(total, max(64, c + c // 2)), self._pen_floor)

        if not self._pen_tuned:
            new = target(self._pen_obs[-1])
            if new >= cur:       # only ever tightens at first observation
                self._pen_tuned = True
                return
        else:
            window = self._pen_obs[-self.blend_shrink_after:]
            due = (len(window) >= self.blend_shrink_after
                   and self._polls_since_pen_retune >= self.blend_shrink_after)
            if not due:
                return
            new = target(max(window))
            if not 2 * new < cur:          # real gap only
                # same floor decay as the blend budgets (see above)
                raw = min(total, max(64, max(window) * 3 // 2))
                if self._pen_floor and 2 * raw < cur:
                    self._pen_floor //= 2
                    self._polls_since_pen_retune = 0
                return
        from ..utils.log import get_logger
        get_logger().info(
            "penumbra tile budget <- observed: %d -> %d (of %d tiles), "
            "re-jitting", cur, new, total)
        self.config = self.config.replace(penumbra_tile_budget=new)
        self._rebuild_frame_fn()
        self._save_tuned_now()
        self._pen_tuned = True
        self._polls_since_pen_retune = 0

    def render(self, view_props: ViewProperties | None = None) -> jnp.ndarray:
        """Returns the device image array (async); np.asarray() to fetch."""
        self._join_prewarm()   # first call: wait for the AOT warmup so
        # the jit below reads the cache instead of compiling a second copy
        if self._react_overflow:
            self._poll_overflow()
        u = self.uniform_for_camera(view_props)
        if self.config.texture_space:
            # exposure is folded into the static diffuse bake; a change
            # re-bakes it (a pipeline-rebuild-class hitch, not per-frame)
            e = (float(view_props.exposure) if view_props is not None
                 else float(self.scene_host.camera.exposure))
            if e != self._baked_exposure:
                self._baked_exposure = e
                if not (self.n_shadows > 0 and self._shadows_dirty):
                    self.scene_dev.update(self._ld_fn(self.scene_dev, e))
        if self.n_shadows > 0 and self._shadows_dirty:
            # cached pass: a blocking overflow check + regrow here is a
            # one-off, not a per-frame stall
            for _ in range(4):
                maps, sov = self._shadow_fn(self.scene_dev, u)
                if (not self._react_overflow or int(sov) == 0
                        or self._shadow_budget() >= self._MAX_PAIRS):
                    break
                from ..utils.log import get_logger
                self._shadow_budget_val = min(
                    self._MAX_PAIRS, self._shadow_budget_val * 2)
                get_logger().warning(
                    "shadow pair budget overflow (%d dropped): "
                    "budget -> %d, re-rendering", int(sov),
                    self._shadow_budget_val)
                self._rebuild_shadow_fn()
            self._shadow_maps = maps
            self._shadows_dirty = False
            if self.config.texture_space:
                # bake per-texel PCF visibility NOW (the reference renders
                # shadow maps on the dirty flag; we also consume them on
                # it) — per-frame shading then never gathers PCF windows
                from ..shading import lightchart
                if not hasattr(self, "_vis_fn"):
                    def _bake_vis(scene, maps_, uniform):
                        params = unpack_params(uniform, self.n_shadows)
                        geo = {"pos": scene["chart_pos"],
                               "normal": scene["chart_normal"],
                               "mat_id": scene["chart_mat"][15]}
                        return lightchart.bake_visibility(
                            scene, geo, maps_, params["shadow_viewproj"],
                            self._shadow_lights)
                    self._vis_fn = jax.jit(_bake_vis)
                self.scene_dev["chart_vis"] = self._vis_fn(
                    self.scene_dev, maps, u)
                self.scene_dev.update(self._ld_fn(
                    self.scene_dev, self._baked_exposure))
        out = self._fn(self.scene_dev, u, self._shadow_maps)
        if self._react_overflow:
            img, stats = out
            # start the device->host copies NOW, in the background: a
            # synchronous np.asarray at poll time pays a full tunnel
            # round-trip (~27 ms measured) even for an 8-byte counter;
            # by poll time these copies have long landed and asarray is
            # a cached-host read
            for v in stats.values():
                if hasattr(v, "copy_to_host_async"):
                    v.copy_to_host_async()
            self._pending_overflow.append(stats)
            return img
        return out
