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


def _pair_budget(n_tris: int) -> int:
    """Static pair-table budget: generous for big near-camera triangles
    while staying O(T). Overflow is counted, not silent."""
    return 8 * n_tris + 4096


def rasterize(setup, height: int, width: int, rc: RasterConfig, backend: str,
              tri_offset: int = 0, y0=0, full_height: int | None = None):
    """Raster backend dispatch — decided at trace time (one compiled
    executable per backend, like pipelines per GraphicsPipelineInfo).
    ``y0``/``full_height`` render a row slice of a taller virtual viewport
    (multi-chip image sharding)."""
    if backend == "pallas":
        if full_height is not None:
            raise NotImplementedError("row slicing lands with the sharded pallas path")
        return rasterize_pallas(setup, height, width, rc.tile_h, rc.tile_w,
                                rc.tri_chunk, _pair_budget(setup.coef.shape[0]),
                                tri_offset)
    if backend == "tiled":
        return rasterize_tiled(setup, height, width, rc.tile_h, rc.tile_w,
                               rc.tri_chunk, _pair_budget(setup.coef.shape[0]),
                               tri_offset, y0=y0, full_height=full_height)
    return rref.rasterize_reference(setup, height, width, tri_offset=tri_offset,
                                    y0=y0, full_height=full_height)
from ..shading import pbr, skybox
from ..shading.srgb import encode_srgb8, srgb_to_linear
from ..scene.camera import ViewProperties


def resolve_attributes(scene, vo, coef, tri_id, height, width):
    """G-buffer resolve: per-pixel perspective-correct vertex attributes.
    Replaces hardware attribute interpolation feeding surface_pbr.frag."""
    bary, _ = rref.barycentrics_at(coef, tri_id, height, width)
    safe_tri = jnp.maximum(tri_id, 0)
    vidx = scene["tri_vidx"][safe_tri]            # [H,W,3]
    b = bary[..., None]

    def interp(attr):  # attr [V,C] -> [H,W,C]
        return (attr[vidx] * b).sum(-2)

    return {
        "pos": interp(vo.world_pos),
        "normal": interp(vo.world_normal),
        "uv": interp(vo.uv),
        "mat_id": scene["tri_material"][safe_tri],
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


def render_frame(scene, params, config: RenderConfig, n_shadows: int,
                 backend: str = "reference") -> jnp.ndarray:
    """The whole frame. scene: device dict; params: dynamic per-frame dict
    (view/proj/view_pos/exposure/debug + shadow_viewproj + inv_vp_rot).
    Returns [H,W,4] uint8 (sRGB-encoded, like the swapchain)."""
    h, w = config.render_extent()

    vo = vertex_transform(scene, params["view"], params["proj"])

    shadow_maps = None
    shadow_tf = None
    if config.shadows and n_shadows > 0:
        shadow_maps = render_shadow_maps(scene, vo.world_pos, params["shadow_viewproj"],
                                         config.shadow_extent, n_shadows,
                                         config.raster, backend)
        shadow_tf = params["shadow_viewproj"]

    # opaque base pass
    setup = triangle_setup(vo.clip, scene["tri_vidx"], scene["n_opaque"], w, h,
                           config.cull_mode)
    g = rasterize(setup, h, w, config.raster, backend)

    frag = resolve_attributes(scene, vo, setup.coef, g.tri_id, h, w)
    view_args = {
        "view_pos": params["view_pos"],
        "exposure": params["exposure"],
        "debug_input": params["debug_input"],
        "debug_equation": params["debug_equation"],
    }
    rgba = pbr.brdf_lighting(scene, frag["pos"], frag["uv"], frag["normal"],
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

    if config.ssaa > 1:
        f = config.ssaa
        rgb = rgb.reshape(config.height, f, config.width, f, 3).mean(axis=(1, 3))

    return encode_srgb8(rgb)


class FrameRenderer:
    """Holds the jit cache and marshals host state into device args.

    The analog of Renderer+RenderScene's per-frame path
    (``Renderer.cpp:98-111``).
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
        self._fn = jax.jit(partial(render_frame, config=config,
                                   n_shadows=self.n_shadows, backend=backend))

    def params_for_camera(self, view_props: ViewProperties | None = None) -> dict:
        cam = self.scene_host.camera
        vp = view_props or ViewProperties.from_camera(cam)
        params = vp.as_arrays()
        params["inv_vp_rot"] = skybox.skybox_ray_matrix(vp.view, vp.proj)
        if self.n_shadows > 0:
            params["shadow_viewproj"] = self._fitting.shadow_transforms_for_scene(self.scene_host)
        return params

    def render(self, view_props: ViewProperties | None = None) -> jnp.ndarray:
        """Returns the device image array (async); np.asarray() to fetch."""
        return self._fn(self.scene_dev, self.params_for_camera(view_props))
