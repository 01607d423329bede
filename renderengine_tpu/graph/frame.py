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

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..core.config import CullMode, RasterConfig, RenderConfig
from ..raster import reference_raster as rref
from ..raster.setup import triangle_setup, vertex_transform
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


def _pair_budget(n_tris: int) -> int:
    """Static pair-table budget: generous for big near-camera triangles
    while staying O(T). Overflow is counted, not silent."""
    return 8 * n_tris + 4096


def rasterize(setup, height: int, width: int, rc: RasterConfig, backend: str,
              tri_offset: int = 0, y0=0, full_height: int | None = None,
              peel_bounds=None):
    """Raster backend dispatch — decided at trace time (one compiled
    executable per backend, like pipelines per GraphicsPipelineInfo).
    ``y0``/``full_height`` render a row slice of a taller virtual viewport
    (multi-chip image sharding)."""
    if backend == "pallas":
        if full_height is not None:
            raise NotImplementedError("row slicing lands with the sharded pallas path")
        return rasterize_pallas(setup, height, width, rc.tile_h, rc.tile_w,
                                rc.tri_chunk, _pair_budget(setup.coef.shape[0]),
                                tri_offset, peel_bounds=peel_bounds)
    if backend == "tiled":
        return rasterize_tiled(setup, height, width, rc.tile_h, rc.tile_w,
                               rc.tri_chunk, _pair_budget(setup.coef.shape[0]),
                               tri_offset, y0=y0, full_height=full_height,
                               peel_bounds=peel_bounds)
    return rref.rasterize_reference(setup, height, width, tri_offset=tri_offset,
                                    y0=y0, full_height=full_height,
                                    peel_bounds=peel_bounds)


def resolve_attributes(scene, vo, coef, tri_id, height, width,
                       y0=0, full_height: int | None = None):
    """G-buffer resolve: per-pixel perspective-correct vertex attributes.
    Replaces hardware attribute interpolation feeding surface_pbr.frag.

    Gather budget per pixel: 1 coef row (bary), 1 tri_packed row
    (vidx+material), 3 packed vertex-attribute rows.
    """
    bary, _ = rref.barycentrics_at(coef, tri_id, height, width, y0, full_height)
    safe_tri = jnp.maximum(tri_id, 0)
    trow = scene["tri_packed"][safe_tri]          # [H,W,8] one gather
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


def render_shadow_maps(scene, world_pos, shadow_viewproj, extent: int,
                       n_shadows: int, rc: RasterConfig, backend: str):
    """Depth-only raster per shadow map (reference ``ShadowSystem::Render``,
    front-culled to reduce peter-panning, ``ShadowSystem.cpp:37-53``).
    shadow_viewproj: [NS,4,4]. Returns [NS,E,E] f32."""
    world_h = jnp.concatenate([world_pos, jnp.ones_like(world_pos[:, :1])], axis=-1)
    maps = []
    for si in range(n_shadows):
        m = shadow_viewproj[si]
        clip = (m[None, :, :] * world_h[:, None, :]).sum(-1)
        s = triangle_setup(clip, scene["tri_vidx"], scene["n_tris"], extent, extent,
                           CullMode.FRONT)
        g = rasterize(s, extent, extent, rc, backend)
        maps.append(g.depth)
    return jnp.stack(maps)


def render_shadow_pass(scene, uniform, config: RenderConfig, n_shadows: int,
                       backend: str = "reference") -> jnp.ndarray:
    """Standalone shadow depth pass, cached across frames by the caller —
    the reference renders it once until marked dirty
    (``RenderScene.cpp:170-181``), while the shadow *transforms* keep
    updating per frame (``ShadowSystem::Update``); we replicate both."""
    params = unpack_params(uniform, n_shadows)
    vo = vertex_transform(scene, params["view"], params["proj"])
    maps = render_shadow_maps(scene, vo.world_pos, params["shadow_viewproj"],
                              config.shadow_extent, n_shadows,
                              config.raster, backend)
    # pack once per (cached) render: 3x3 PCF becomes 4 block gathers
    return shadow_mod.pack_shadow_blocks(maps)


def render_frame(scene, uniform, shadow_maps, config: RenderConfig,
                 n_shadows: int, backend: str = "reference",
                 has_translucent: bool = False) -> jnp.ndarray:
    """The per-frame pass chain (minus the cached shadow depth).
    scene: device dict; uniform: packed per-frame float32 vector
    (``graph.uniforms``); shadow_maps: packed blocks or None.
    Returns [H,W,4] uint8 (sRGB-encoded, like the swapchain)."""
    h, w = config.render_extent()
    params = unpack_params(uniform, n_shadows)

    vo = vertex_transform(scene, params["view"], params["proj"])

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
    shade = (pbr.brdf_lighting if config.shading == ShadingModel.PBR
             else phong.phong_lighting)

    # opaque base pass
    setup = triangle_setup(vo.clip, scene["tri_vidx"], scene["n_opaque"], w, h,
                           config.cull_mode)
    g = rasterize(setup, h, w, config.raster, backend)

    frag = resolve_attributes(scene, vo, setup.coef, g.tri_id, h, w)
    rgba = shade(scene, frag["pos"], frag["uv"], frag["normal"],
                 frag["mat_id"], view_args, shadow_maps, shadow_tf)

    # skybox where nothing was drawn (reference draws it last at far depth).
    # Reference quirk kept: the cubemap is a Unorm format sampled raw
    # (skybox.frag:30), so its stored (sRGB-encoded) values pass through as
    # if linear and get re-encoded by the swapchain.
    if config.skybox:
        sky = skybox.render_skybox(scene["cubemap"], params["inv_vp_rot"], h, w)
        rgb = jnp.where(frag["covered"][..., None], rgba[..., :3], sky[..., :3])
    else:
        rgb = jnp.where(frag["covered"][..., None], rgba[..., :3], 0.0)

    # translucent pass: depth-peeled K nearest layers, composited
    # back-to-front with src-alpha blending — the order-correct version of
    # the reference's per-mesh back-to-front sorted draws with culling off
    # (RenderScene.cpp:127-159, GraphicsPipelineCache.cpp:307).
    if config.translucency and has_translucent:
        setup_t = triangle_setup(vo.clip, scene["tri_vidx"], scene["n_tris"],
                                 w, h, CullMode.NONE,
                                 first_tri=scene["n_opaque"])
        prev = jnp.full((h, w), -1.0, jnp.float32)
        layers = []
        for _ in range(config.translucency_layers):
            gt = rasterize(setup_t, h, w, config.raster, backend,
                           peel_bounds=(prev, g.depth))
            frag_t = resolve_attributes(scene, vo, setup_t.coef, gt.tri_id, h, w)
            rgba_t = shade(scene, frag_t["pos"], frag_t["uv"],
                           frag_t["normal"], frag_t["mat_id"],
                           view_args, shadow_maps, shadow_tf)
            layers.append((frag_t["covered"], rgba_t))
            prev = jnp.where(frag_t["covered"], gt.depth, 2.0)
        for covered_t, rgba_t in reversed(layers):
            a = jnp.clip(rgba_t[..., 3], 0.0, 1.0) * covered_t
            rgb = rgb * (1.0 - a[..., None]) + rgba_t[..., :3] * a[..., None]

    # editor ground grid (drawable form of the reference's never-drawn
    # Grid, SURVEY 2.3; blended + depth-tested against the opaque z-buffer)
    if config.grid:
        rgb = grid_mod.render_grid(params["inv_vp"], params["view"],
                                   params["proj"], g.depth, rgb)

    # shadow-map preview overlay (TexturedQuad grayscale mode)
    if config.show_shadow_quad and shadow_maps is not None:
        # shadow_maps are packed blocks; texel (y,x) is block channel 0
        draw_src = shadow_maps[0, :-2, :-2, 0]
        rgb = draw_textured_quad(rgb, draw_src, grayscale=True)

    if config.ssaa > 1:
        f = config.ssaa
        rgb = rgb.reshape(config.height, f, config.width, f, 3).mean(axis=(1, 3))

    return encode_srgb8(rgb)


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
        dev = scene_host.upload()
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
        has_translucent = int(dev["n_tris"]) > int(dev["n_opaque"])
        self._fn = jax.jit(partial(render_frame, config=config,
                                   n_shadows=self.n_shadows, backend=backend,
                                   has_translucent=has_translucent))
        self._shadow_fn = jax.jit(partial(render_shadow_pass, config=config,
                                          n_shadows=self.n_shadows,
                                          backend=backend))
        self._shadow_maps = None
        self._shadows_dirty = True

    def mark_shadows_dirty(self) -> None:
        """Re-render shadow depth next frame (scene or light changed)."""
        self._shadows_dirty = True

    def params_for_camera(self, view_props: ViewProperties | None = None) -> dict:
        cam = self.scene_host.camera
        vp = view_props or ViewProperties.from_camera(cam)
        params = vp.as_arrays()
        params["inv_vp_rot"] = skybox.skybox_ray_matrix(vp.view, vp.proj)
        params["inv_vp"] = grid_mod.grid_unproject_matrix(vp.view, vp.proj)
        if self.n_shadows > 0:
            params["shadow_viewproj"] = self._fitting.shadow_transforms_for_scene(self.scene_host)
        return params

    def uniform_for_camera(self, view_props: ViewProperties | None = None):
        return uniforms.pack_params(self.params_for_camera(view_props),
                                    self.n_shadows)

    def render(self, view_props: ViewProperties | None = None) -> jnp.ndarray:
        """Returns the device image array (async); np.asarray() to fetch."""
        u = self.uniform_for_camera(view_props)
        if self.n_shadows > 0 and self._shadows_dirty:
            self._shadow_maps = self._shadow_fn(self.scene_dev, u)
            self._shadows_dirty = False
        return self._fn(self.scene_dev, u, self._shadow_maps)
