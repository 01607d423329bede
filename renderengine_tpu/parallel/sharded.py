"""Multi-chip rendering over a jax.sharding.Mesh.

The reference is single-GPU (SURVEY.md §2.6); this is the scale-out design
it never had, built the TPU way — no NCCL calls, just shardings + XLA
collectives over ICI:

- **Vertex stage**: data-parallel over vertices (each chip transforms
  V/D vertices), then ``all_gather`` of the post-transform arrays — the
  classic TP-style "compute sharded, gather activations" pattern.
- **Base pass**: image-space parallelism (the renderer's sequence/context
  axis): each chip rasters + shades its horizontal band of the
  framebuffer through ``graph.frame._frame_core`` — the SAME body as the
  single-chip path, so translucency, grid, SSAA, Phong, debug views and
  the pallas kernel's row slicing all work sharded by construction.
- **Shadow pass**: geometry-parallel — each chip rasters T/D triangles
  into a full-extent depth map, merged with ``pmin`` (depth min-reduce,
  the z-buffer's natural collective); cached across frames behind the
  reference's dirty-flag semantics (``RenderScene.cpp:170-181``).

All collective traffic is O(V + shadow_extent^2) per frame and rides ICI.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

try:
    from jax import shard_map as _shard_map_impl  # jax >= 0.8
except ImportError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map as _shard_map_impl


def shard_map(f, *, mesh, in_specs, out_specs):
    """shard_map with the replication checker off across jax versions
    (the checker can't prove pmin-produced outputs replicated)."""
    for kw in ({"check_vma": False}, {"check_rep": False}, {}):
        try:
            return _shard_map_impl(f, mesh=mesh, in_specs=in_specs,
                                   out_specs=out_specs, **kw)
        except TypeError:
            continue
    raise TypeError("no compatible shard_map signature")

from ..core.config import CullMode, RenderConfig
from ..graph import frame as fgraph
from ..raster.setup import triangle_setup, vertex_transform, VertexOutputs
from ..shading import shadow as shadow_mod
from ..shading import skybox

AXIS = "image"


def make_mesh(n_devices: int | None = None) -> Mesh:
    devs = jax.devices()
    n = len(devs) if n_devices is None else n_devices
    if len(devs) < n:
        raise RuntimeError(
            f"make_mesh({n}) on a {len(devs)}-device platform "
            f"({devs[0].platform}); a silently smaller mesh would fake "
            "multi-chip coverage")
    return Mesh(np.array(devs[:n]), (AXIS,))


def pad_scene_for_mesh(scene_dev: dict, n_devices: int) -> dict:
    """Pad vertex arrays to a multiple of the mesh size (padding vertices
    are never referenced by any triangle)."""
    v = scene_dev["positions"].shape[0]
    pad = (-v) % n_devices
    if pad:
        scene_dev = dict(scene_dev)
        for k in ("positions", "normals", "uvs", "world_pos", "world_normal"):
            scene_dev[k] = np.concatenate(
                [scene_dev[k], np.zeros((pad,) + scene_dev[k].shape[1:],
                                        scene_dev[k].dtype)])
        scene_dev["vert_node"] = np.concatenate(
            [scene_dev["vert_node"], np.zeros(pad, np.int32)])
    return scene_dev


def _scene_specs(scene, n_devices: int | None = None) -> dict:
    vert = {k: P(AXIS) for k in ("positions", "normals", "uvs", "vert_node",
                                 "world_pos", "world_normal")}
    # texture-space chart planes shard over atlas ROWS (the per-frame
    # specular pass is elementwise over texels, so row slices are exact);
    # the gather TABLES (chart_ld/base/a, corner uvs) stay replicated —
    # every device's screen pass gathers from the full atlas. Chart
    # arrays are PLANAR [C,Ah,Aw], so atlas rows are axis 1.
    if n_devices:
        for k in ("chart_pos", "chart_normal", "chart_mat", "chart_vis"):
            if k in scene and scene[k].shape[1] % n_devices == 0:
                vert[k] = P(None, AXIS)
    return {k: vert.get(k, P()) for k in scene}


def _gathered_vo(scene_l, params_l) -> tuple[VertexOutputs, dict]:
    """Vertex stage on the local shard + all_gather: returns full-scene
    VertexOutputs and a scene dict whose vertex-indexed arrays are full
    (for the resolve fallback paths)."""
    vo_l = vertex_transform(scene_l, params_l["view"], params_l["proj"])
    vo = VertexOutputs(
        world_pos=jax.lax.all_gather(vo_l.world_pos, AXIS, tiled=True),
        world_normal=jax.lax.all_gather(vo_l.world_normal, AXIS, tiled=True),
        uv=jax.lax.all_gather(vo_l.uv, AXIS, tiled=True),
        clip=jax.lax.all_gather(vo_l.clip, AXIS, tiled=True),
    )
    scene_full = dict(scene_l)
    scene_full["uvs"] = vo.uv
    return vo, scene_full


def render_shadow_pass_sharded(scene, params, config: RenderConfig,
                               n_shadows: int, mesh: Mesh,
                               backend: str = "tiled") -> jnp.ndarray:
    """Geometry-parallel shadow depth pass + pmin merge + PCF block pack.
    Returns packed blocks replicated on every device; cache across frames
    like the single-chip dirty flag."""
    d = mesh.shape[AXIS]
    n_tris_static = scene["tri_vidx"].shape[0]
    assert n_tris_static % d == 0, "padded triangle count must divide the mesh"
    ts = n_tris_static // d

    def per_device(scene_l, params_l):
        idx = jax.lax.axis_index(AXIS)
        world_pos = jax.lax.all_gather(
            vertex_transform(scene_l, params_l["view"],
                             params_l["proj"]).world_pos, AXIS, tiled=True)
        world_h = jnp.concatenate([world_pos,
                                   jnp.ones_like(world_pos[:, :1])], -1)
        tri_slice = jax.lax.dynamic_slice_in_dim(scene_l["tri_vidx"],
                                                 idx * ts, ts, 0)
        n_local = jnp.clip(scene_l["n_tris"] - idx * ts, 0, ts)
        maps = []
        for si in range(n_shadows):
            m = params_l["shadow_viewproj"][si]
            clip_s = (m[None, :, :] * world_h[:, None, :]).sum(-1)
            s = triangle_setup(clip_s, tri_slice, n_local,
                               config.shadow_extent, config.shadow_extent,
                               CullMode.FRONT)
            g, _ = fgraph.rasterize(s, config.shadow_extent,
                                    config.shadow_extent, config.raster,
                                    backend)
            maps.append(g.depth)
        return shadow_mod.pack_shadow_blocks(
            jax.lax.pmin(jnp.stack(maps), AXIS))

    fn = shard_map(per_device, mesh=mesh,
                   in_specs=(_scene_specs(scene),
                             jax.tree.map(lambda _: P(), params)),
                   out_specs=P())       # replicated (pmin makes them equal)
    return fn(scene, params)


def render_frame_sharded(scene, params, shadow_maps, config: RenderConfig,
                         n_shadows: int, mesh: Mesh, backend: str = "tiled",
                         has_translucent: bool = False,
                         slots_used=(True, True, True, True),
                         shadow_lights=None,
                         has_mask: bool = False,
                         alpha_is_factor: bool = False) -> jnp.ndarray:
    """Full multi-chip frame (minus the cached shadow pass — pass its
    packed blocks, or None). Returns [H,W,4] uint8 row-sharded over the
    mesh. Runs the SAME ``_frame_core`` as single-chip.

    Texture-space mode: the per-frame chart SPECULAR pass (dense VPU over
    atlas texels) runs sharded over atlas rows — each chip lights its row
    band of the chart atlas, then ``all_gather`` (tiled) hands every chip
    the full table its screen pass gathers from. Elementwise over texels,
    so the sharded result is bit-identical to single-chip."""
    h, w = config.render_extent()
    d = mesh.shape[AXIS]
    assert h % d == 0, f"render height {h} must divide over {d} devices"
    hs = h // d
    # _scene_specs only row-shards the chart planes when Ah divides the
    # mesh; otherwise each device holds (and lights) the full atlas
    charts_sharded = (config.texture_space
                      and scene["chart_pos"].shape[1] % d == 0)

    def per_device(scene_l, params_l, shadow_l):
        idx = jax.lax.axis_index(AXIS)
        vo, scene_full = _gathered_vo(scene_l, params_l)
        ls = None
        if config.texture_space:
            from ..shading import lightchart
            view_args = {"view_pos": params_l["view_pos"],
                         "exposure": params_l["exposure"]}
            ls_l = lightchart.chart_light_spec(
                scene_l, scene_l["chart_pos"], scene_l["chart_normal"],
                scene_l["chart_mat"], scene_l["chart_vis"], view_args)
            ls = (jax.lax.all_gather(ls_l, AXIS, tiled=True, axis=1)
                  if charts_sharded else ls_l)
        img, _ = fgraph._frame_core(
            scene_full, params_l, vo, shadow_l, config, n_shadows, backend,
            has_translucent, slots_used, y0=idx * hs, slice_h=hs,
            shadow_lights=shadow_lights, has_mask=has_mask,
            alpha_is_factor=alpha_is_factor, ls_atlas=ls)
        return img

    shadow_specs = P() if shadow_maps is not None else None
    fn = shard_map(per_device, mesh=mesh,
                   in_specs=(_scene_specs(scene, d),
                             jax.tree.map(lambda _: P(), params),
                             shadow_specs),
                   out_specs=P(AXIS))
    return fn(scene, params, shadow_maps)


class ShardedRenderer:
    """Multi-chip FrameRenderer analog: owns the jit cache and the shadow
    dirty flag (``RenderScene.cpp:170-181`` semantics, like the
    single-chip ``FrameRenderer``)."""

    def __init__(self, scene_host, config: RenderConfig, mesh: Mesh,
                 backend: str = "tiled"):
        from ..scene.camera import ViewProperties
        from ..shading import fitting

        self._fitting = fitting
        self.scene_host = scene_host
        self.config = config
        self.mesh = mesh
        self.backend = backend
        d = mesh.shape[AXIS]
        if config.texture_space:
            # identical chart pipeline to the single-chip FrameRenderer:
            # subdivision at upload, host layout, device bakes
            vp0 = ViewProperties.from_camera(scene_host.camera)
            viewproj = np.asarray(vp0.proj) @ np.asarray(vp0.view)
            dev = scene_host.upload(
                pad_tris_to=max(256, d),
                chart_subdiv=dict(viewproj=viewproj, width=config.width,
                                  height=config.height,
                                  density=config.chart_density))
        else:
            dev = scene_host.upload(pad_tris_to=max(256, d))
        dev = pad_scene_for_mesh(dev, d)
        self.n_shadows = scene_host.n_shadow_maps if config.shadows else 0
        has_translucent = int(np.asarray(dev["n_blend"])) > 0
        slots_used = tuple(bool((np.asarray(dev[k]) >= 0).any()) for k in
                           ("mat_tex_base", "mat_tex_emissive",
                            "mat_tex_orm", "mat_tex_normal"))
        alpha_is_factor = False
        self._ld_fn = None
        if config.texture_space:
            from ..core.config import ShadingModel as _SM
            from ..shading import lightchart
            assert config.shading == _SM.PBR and not config.alpha_mask \
                and not config.debug_views, \
                "texture_space: PBR, no MASK pass, no debug views"
            lightchart.attach_chart_layout(dev, viewproj, config)
            self._baked_exposure = float(scene_host.camera.exposure)
            # HOST-side alpha check (same fn as FrameRenderer — the
            # sharded frame must trace the identical static config)
            aif = lightchart.host_alpha_is_factor(
                dev, getattr(scene_host, "textures", None))
            up, self._ld_fn, alpha_is_factor = lightchart.setup_scene_tss(
                dev, config, slots_used, self._baked_exposure, aif)
            dev.update(up)
        self.scene_dev = dev
        self._shadow_lights = fgraph._static_shadow_lights(dev)
        self._fn = jax.jit(partial(
            render_frame_sharded, config=config, n_shadows=self.n_shadows,
            mesh=mesh, backend=backend, has_translucent=has_translucent,
            has_mask=int(np.asarray(dev.get("n_mask", 0))) > 0,
            slots_used=slots_used,
            shadow_lights=self._shadow_lights,
            alpha_is_factor=alpha_is_factor))
        self._shadow_fn = jax.jit(partial(
            render_shadow_pass_sharded, config=config,
            n_shadows=self.n_shadows, mesh=mesh, backend=backend))
        self._shadow_maps = None
        self._shadows_dirty = True

    def mark_shadows_dirty(self) -> None:
        self._shadows_dirty = True
        self._shadow_vp_cache = None

    def params_for_camera(self) -> dict:
        from ..scene.camera import ViewProperties
        from ..shading import grid as grid_mod

        vp = ViewProperties.from_camera(self.scene_host.camera)
        params = vp.as_arrays()
        params["inv_vp_rot"] = skybox.skybox_ray_matrix(vp.view, vp.proj)
        params["inv_vp"] = grid_mod.grid_unproject_matrix(vp.view, vp.proj)
        if self.n_shadows > 0:
            # fit once per dirty cycle (same policy + rationale as
            # FrameRenderer.params_for_camera: the cached maps define
            # the sampling transform, and the host-side fit is ~18 ms)
            if self._shadows_dirty or \
                    getattr(self, "_shadow_vp_cache", None) is None:
                self._shadow_vp_cache = \
                    self._fitting.shadow_transforms_for_scene(self.scene_host)
            params["shadow_viewproj"] = self._shadow_vp_cache
        return params

    def render(self, params: dict | None = None) -> jnp.ndarray:
        params = params or self.params_for_camera()
        if self.n_shadows > 0 and self.config.shadows:
            if self._shadows_dirty:
                self._shadow_maps = self._shadow_fn(self.scene_dev, params)
                self._shadows_dirty = False
                if self.config.texture_space:
                    # bake per-texel PCF visibility on the dirty flag and
                    # refresh the static light tables — same policy as
                    # FrameRenderer (shadows consumed when rendered)
                    from ..shading import lightchart

                    def _bake_vis(scene, maps_, svp):
                        geo = {"pos": scene["chart_pos"],
                               "normal": scene["chart_normal"],
                               "mat_id": scene["chart_mat"][15]}
                        return lightchart.bake_visibility(
                            scene, geo, maps_, svp, self._shadow_lights)

                    self.scene_dev["chart_vis"] = jax.jit(_bake_vis)(
                        self.scene_dev, self._shadow_maps,
                        params["shadow_viewproj"])
                    self.scene_dev.update(self._ld_fn(
                        self.scene_dev, self._baked_exposure))
        return self._fn(self.scene_dev, params, self._shadow_maps)


def build_sharded_renderer(scene_host, config: RenderConfig, mesh: Mesh,
                           backend: str = "tiled"):
    """Compatibility wrapper: returns (fn, scene_dev, params_builder) where
    ``fn(scene_dev, params)`` renders one frame (computing + caching the
    sharded shadow pass on first use)."""
    r = ShardedRenderer(scene_host, config, mesh, backend)

    def fn(scene_dev, params):
        r.scene_dev = scene_dev
        return r.render(params)

    return fn, r.scene_dev, r.params_for_camera