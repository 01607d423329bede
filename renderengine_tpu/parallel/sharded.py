"""Multi-chip rendering over a jax.sharding.Mesh.

The reference is single-GPU (SURVEY.md §2.6); this is the scale-out design
it never had, built the TPU way — no NCCL calls, just shardings + XLA
collectives over ICI:

- **Vertex stage**: data-parallel over vertices (each chip transforms
  V/D vertices), then ``all_gather`` of the post-transform arrays — the
  classic TP-style "compute sharded, gather activations" pattern.
- **Base pass**: image-space parallelism (the renderer's sequence/context
  axis): each chip rasters + shades its horizontal band of the
  framebuffer; the output is row-sharded, no merge collective needed.
- **Shadow pass**: geometry-parallel — each chip rasters T/D triangles
  into a full-extent depth map, merged with ``pmin`` (depth min-reduce,
  the z-buffer's natural collective).

All collective traffic is O(V + shadow_extent^2) per frame and rides ICI.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
try:
    from jax import shard_map  # jax >= 0.8
except ImportError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map

from ..core.config import CullMode, RenderConfig
from ..graph import frame as fgraph
from ..raster.setup import triangle_setup, vertex_transform, restrict_rows
from ..shading import pbr, skybox
from ..shading.srgb import encode_srgb8

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


def render_frame_sharded(scene, params, config: RenderConfig, n_shadows: int,
                         mesh: Mesh, backend: str = "tiled") -> jnp.ndarray:
    """Full multi-chip frame. scene/params as in graph.frame.render_frame.
    Returns [H,W,4] uint8 sharded row-wise over the mesh."""
    h, w = config.render_extent()
    d = mesh.shape[AXIS]
    assert h % d == 0, f"height {h} must divide over {d} devices"
    hs = h // d

    n_tris_static = scene["tri_vidx"].shape[0]
    assert n_tris_static % d == 0, "padded triangle count must divide the mesh"
    ts = n_tris_static // d

    vert_specs = {k: P(AXIS) for k in ("positions", "normals", "uvs", "vert_node",
                                       "world_pos", "world_normal")}
    scene_specs = {k: vert_specs.get(k, P()) for k in scene}

    def per_device(scene_l, params_l):
        idx = jax.lax.axis_index(AXIS)

        # --- vertex stage: sharded over V, gathered over ICI ---
        vo_l = vertex_transform(scene_l, params_l["view"], params_l["proj"])
        world_pos = jax.lax.all_gather(vo_l.world_pos, AXIS, tiled=True)
        world_nrm = jax.lax.all_gather(vo_l.world_normal, AXIS, tiled=True)
        uv = jax.lax.all_gather(vo_l.uv, AXIS, tiled=True)
        clip = jax.lax.all_gather(vo_l.clip, AXIS, tiled=True)

        scene_full = dict(scene_l)
        scene_full["uvs"] = uv

        # --- shadow pass: geometry-parallel + pmin merge ---
        shadow_maps = None
        shadow_tf = None
        if config.shadows and n_shadows > 0:
            world_h = jnp.concatenate([world_pos, jnp.ones_like(world_pos[:, :1])], -1)
            tri_slice = jax.lax.dynamic_slice_in_dim(scene_l["tri_vidx"], idx * ts, ts, 0)
            maps = []
            for si in range(n_shadows):
                m = params_l["shadow_viewproj"][si]
                clip_s = (m[None, :, :] * world_h[:, None, :]).sum(-1)
                # local triangle range; in-range test against the slice
                n_local = jnp.clip(scene_l["n_tris"] - idx * ts, 0, ts)
                s = triangle_setup(clip_s, tri_slice, n_local,
                                   config.shadow_extent, config.shadow_extent,
                                   CullMode.FRONT)
                g, _ = fgraph.rasterize(s, config.shadow_extent, config.shadow_extent,
                                        config.raster, backend)
                maps.append(g.depth)
            from ..shading import shadow as shadow_mod

            shadow_maps = shadow_mod.pack_shadow_blocks(
                jax.lax.pmin(jnp.stack(maps), AXIS))
            shadow_tf = params_l["shadow_viewproj"]

        # --- base pass: image-row parallel ---
        setup = triangle_setup(clip, scene_l["tri_vidx"], scene_l["n_opaque"],
                               w, h, config.cull_mode)
        y0 = idx * hs
        setup_slice = restrict_rows(setup, y0, hs, h)
        g, _ = fgraph.rasterize(setup_slice, hs, w, config.raster, backend,
                                y0=y0, full_height=h)
        frag = _resolve_slice(scene_l, world_pos, world_nrm, uv,
                              setup.coef, g.tri_id, hs, w, y0, h)

        view_args = {
            "view_pos": params_l["view_pos"],
            "exposure": params_l["exposure"],
            "debug_input": params_l["debug_input"],
            "debug_equation": params_l["debug_equation"],
        }
        rgba = pbr.brdf_lighting(scene_full, frag["pos"], frag["uv"], frag["normal"],
                                 frag["mat_id"], view_args, shadow_maps, shadow_tf)
        if config.skybox:
            sky = skybox.render_skybox(scene_l["cubemap"], params_l["inv_vp_rot"],
                                       h, w)
            sky = jax.lax.dynamic_slice_in_dim(sky, y0, hs, 0)
            rgb = jnp.where(frag["covered"][..., None], rgba[..., :3], sky[..., :3])
        else:
            rgb = jnp.where(frag["covered"][..., None], rgba[..., :3], 0.0)
        return encode_srgb8(rgb)

    fn = shard_map(
        per_device, mesh=mesh,
        in_specs=(scene_specs, jax.tree.map(lambda _: P(), params)),
        out_specs=P(AXIS),
        check_rep=False,
    )
    return fn(scene, params)


def _resolve_slice(scene, world_pos, world_nrm, uv, coef, tri_id, hs, w, y0, full_h):
    """resolve_attributes for a row slice (pixel coords offset by y0)."""
    from ..raster.reference_raster import barycentrics_at

    bary, _ = barycentrics_at(coef, tri_id, hs, w, y0=y0, full_height=full_h)
    safe_tri = jnp.maximum(tri_id, 0)
    vidx = scene["tri_vidx"][safe_tri]
    b = bary[..., None]
    return {
        "pos": (world_pos[vidx] * b).sum(-2),
        "normal": (world_nrm[vidx] * b).sum(-2),
        "uv": (uv[vidx] * b).sum(-2),
        "mat_id": scene["tri_material"][safe_tri],
        "covered": tri_id >= 0,
    }


def build_sharded_renderer(scene_host, config: RenderConfig, mesh: Mesh,
                           backend: str = "tiled"):
    """Returns (jitted_fn, scene_dev, params_builder) for the mesh."""
    from ..shading import fitting

    d = mesh.shape[AXIS]
    scene_dev = pad_scene_for_mesh(scene_host.upload(pad_tris_to=max(256, d)), d)
    n_shadows = scene_host.n_shadow_maps if config.shadows else 0

    fn = jax.jit(partial(render_frame_sharded, config=config,
                         n_shadows=n_shadows, mesh=mesh, backend=backend))

    def params_builder():
        from ..scene.camera import ViewProperties

        vp = ViewProperties.from_camera(scene_host.camera)
        params = vp.as_arrays()
        params["inv_vp_rot"] = skybox.skybox_ray_matrix(vp.view, vp.proj)
        if n_shadows > 0:
            params["shadow_viewproj"] = fitting.shadow_transforms_for_scene(scene_host)
        return params

    return fn, scene_dev, params_builder
