"""Blinn-Phong shading — port of the reference's legacy ``phong.glsl``
(not #include'd by any live shader, SURVEY §2.4, but kept as the
minimal-slice shading model per BASELINE config 1: ``ShadingModel.PHONG``).

Material mapping from the PBR table: diffuse = baseColor (x texture),
specular = f0, shininess from roughness via a standard Blinn-Phong fit
(shininess = 2/alpha^2 - 2).
"""

from __future__ import annotations

import jax.numpy as jnp

from . import sampling
from .srgb import srgb_to_linear
from .shadow import compute_shadow_directional
from .pbr import _slot, _sample_slot


def phong_lighting(scene, frag_pos, uv, frag_normal, mat_id, view_args,
                   shadow_maps=None, shadow_transforms=None,
                   slots_used=(True, True, True, True),
                   shadow_lights=None, max_aniso=1, debug_views=True,
                   penumbra_tiles=0, shadow_stats=None, ibl_diffuse=False,
                   dither=False, covered=None, penumbra_full_h=None):
    """Port of ``PhongLighting`` (phong.glsl:38-81), summed over lights.
    Light colors map: ambient = 0.03*color, diffuse = specular =
    intensity*color. Returns rgba (linear)."""
    row = sampling.table_lookup(scene["mat_all"], mat_id)
    core = row[..., :16]
    mtex = row[..., 16:]
    # coverage-aware quad derivatives (see sampling.quad_derivs)
    duv_dx, duv_dy = sampling.quad_derivs(uv, covered)
    if slots_used[0]:
        tb = _slot(mtex, 0)
        base_tex = _sample_slot(scene, tb, uv, duv_dx, duv_dy, jnp.ones(4),
                                max_aniso, dither)
        diffuse_p = core[..., 0:4] * jnp.concatenate(
            [srgb_to_linear(base_tex[..., :3]), base_tex[..., 3:4]], axis=-1)
        diffuse_p = jnp.where(tb["valid"][..., None], diffuse_p, core[..., 0:4])
    else:
        diffuse_p = jnp.broadcast_to(core[..., 0:4], mat_id.shape + (4,))
    spec_p = core[..., 8:9]  # f0 as the specular strength
    rough = jnp.clip(core[..., 10], 0.089, 1.0)
    shininess = jnp.maximum(2.0 / (rough * rough * rough * rough) - 2.0, 1.0)

    n = frag_normal / jnp.maximum(jnp.linalg.norm(frag_normal, axis=-1, keepdims=True), 1e-20)
    v = view_args["view_pos"] - frag_pos
    v = v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-20)

    out = jnp.zeros_like(frag_pos)
    n_lights = scene["light_type"].shape[0]
    for li in range(n_lights):
        ltype = scene["light_type"][li]
        lcolor = scene["light_color"][li]
        lint = scene["light_intensity"][li]
        is_dir = ltype == 1
        ld = jnp.where(is_dir, -scene["light_dir"][li][None, None, :],
                       scene["light_pos"][li] - frag_pos)
        dist = jnp.maximum(jnp.linalg.norm(ld, axis=-1), 1e-9)
        l = ld / dist[..., None]

        ambient = (0.03 * lcolor) * diffuse_p[..., :3]
        k_d = jnp.maximum((l * n).sum(-1), 0.0)
        diffuse = k_d[..., None] * (lint * lcolor) * diffuse_p[..., :3]
        hv = l + v
        hv = hv / jnp.maximum(jnp.linalg.norm(hv, axis=-1, keepdims=True), 1e-20)
        k_s = jnp.power(jnp.maximum((n * hv).sum(-1), 0.0), shininess)
        specular = k_s[..., None] * (lint * lcolor) * spec_p

        att = jnp.where(is_dir, 1.0, 1.0 / dist)
        cos_theta = (-l * scene["light_dir"][li]).sum(-1)
        eps = jnp.maximum(scene["light_cos_inner"][li] - scene["light_cos_outer"][li], 1e-4)
        spot = jnp.clip((cos_theta - scene["light_cos_outer"][li]) / eps, 0.0, 1.0)
        spot = jnp.where(ltype == 3, spot, 1.0)

        shadow = jnp.zeros_like(k_d)
        if shadow_maps is not None and (shadow_lights is None
                                        or shadow_lights[li]):
            cube = shadow_lights is not None and shadow_lights[li] == 6
            casts = scene["light_shadow_index"][li] >= 0
            shadow = jnp.where(
                casts,
                compute_shadow_directional(shadow_maps, shadow_transforms,
                                           scene["light_shadow_index"][li],
                                           scene["light_pos"][li], frag_pos, n,
                                           penumbra_tiles=penumbra_tiles,
                                           stats_out=shadow_stats,
                                           cube=cube,
                                           penumbra_full_h=penumbra_full_h),
                0.0)

        in_range = li < scene["n_lights"]
        contrib = (ambient + (1.0 - shadow)[..., None]
                   * (diffuse * spot[..., None] + specular * spot[..., None])) * att[..., None]
        out = out + jnp.where(in_range, contrib, 0.0)

    out = out * view_args["exposure"]
    return jnp.concatenate([out, diffuse_p[..., 3:4]], axis=-1)
