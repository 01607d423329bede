"""Filament-style PBR shading — the deferred-fragment-stage port of
``Assets/Shaders/pbr.glsl`` + ``surface_pbr.frag``.

Operates on [H,W]-shaped interpolated fragment attributes (the G-buffer
resolve), dense over the framebuffer: every op is VPU-elementwise or a
texture gather, and XLA fuses the whole chain. The light loop vectorizes
over the (small, static) light axis.

Every formula cites its GLSL line so parity can be audited.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..core.config import DebugEquation, DebugInput
from . import sampling
from .srgb import srgb_to_linear
from .shadow import compute_shadow_directional

PI = 3.14159265359


# --- BRDF terms (pbr.glsl:237-280) ---------------------------------------

def d_ggx(noh, a):
    a2 = a * a
    f = (noh * a2 - noh) * noh + 1.0
    return a2 / (PI * f * f)


def f_schlick(u, f0):
    return f0 + (1.0 - f0) * jnp.power(1.0 - u, 5.0)[..., None]


def g_smith_ggx_correlated(nov, nol, a):
    a2 = a * a
    ggxl = nov * jnp.sqrt((-nol * a2 + nol) * nol + a2)
    ggxv = nol * jnp.sqrt((-nov * a2 + nov) * nov + a2)
    return 0.5 / jnp.maximum(ggxv + ggxl, 1e-9)


def fd_lambert():
    return 1.0 / PI


# --- material fetch + remap (pbr.glsl:100-233) ----------------------------

def _slot(mat_tex_row, si):
    """Slot descriptor from the packed mat_tex row (f32-exact small ints)."""
    d = mat_tex_row[..., 6 * si : 6 * si + 6]
    return {
        "page": d[..., 0].astype(jnp.int32),
        "x": d[..., 1].astype(jnp.int32),
        "y": d[..., 2].astype(jnp.int32),
        "w": d[..., 3].astype(jnp.int32),
        "h": d[..., 4].astype(jnp.int32),
        "n_mips": d[..., 5].astype(jnp.int32),
        "valid": d[..., 0] >= 0,
    }


def _sample_slot(scene, tex, uv, duv_dx, duv_dy, default, max_aniso=1,
                 dither=False, pre=None):
    """texture-if-present (reference tests handle < MAX_DESCRIPTOR_COUNT,
    ``pbr.glsl:102``) with per-slot implicit LOD (texture() semantics:
    texel-space derivative magnitude from this slot's mip-0 size).
    ``max_aniso`` > 1 (an int or a ``sampling.AnisoSpec``) switches to
    anisotropic taps (TextureCache.cpp:185): Bayer-distributed single taps
    when dithering, tier-compacted exact taps when the spec carries tile
    budgets (``pre``: the slot's result from the shared-footprint
    multi-slot pass, see ``remap_material``), dense exact taps otherwise."""
    if pre is not None:
        return jnp.where(tex["valid"][..., None], pre, default)
    spec = sampling.aniso_spec(max_aniso)
    if spec.max_taps > 1:
        s = sampling.sample_texture_aniso(
            scene["atlas"], scene["mip_y"], scene["mip_x"], tex,
            tex["n_mips"], uv, duv_dx, duv_dy, spec.max_taps,
            dither=dither)
        return jnp.where(tex["valid"][..., None], s, default)
    size = jnp.stack([tex["w"].astype(jnp.float32), tex["h"].astype(jnp.float32)], -1)
    dx = duv_dx * size
    dy = duv_dy * size
    # log2(sqrt(v)) == 0.5*log2(v): skips two full-screen sqrt chains;
    # differs from the sqrt form by ~1 ulp, goldens unaffected
    rho2 = jnp.maximum((dx * dx).sum(-1), (dy * dy).sum(-1))
    lod = 0.5 * sampling.det_log2(jnp.maximum(rho2, 1e-40))
    s = sampling.sample_texture_rows(scene["atlas"], scene["mip_y"],
                                     scene["mip_x"], tex,
                                     tex["n_mips"], uv, lod, dither=dither)
    return jnp.where(tex["valid"][..., None], s, default)


def remap_material(scene, mat_id, frag_pos, uv, frag_normal,
                   slots_used=(True, True, True, True), max_aniso=1,
                   dither=False, covered=None):
    """GetBaseColor/GetEmissive/GetNormal/GetOcclusionRoughnessMetallic +
    RemapMaterial (``pbr.glsl:100-233``). Material state arrives as two
    packed row gathers (mat_core, mat_tex — see scene._pack_rows).

    ``slots_used``: static per-scene flags (base, emissive, orm, normal);
    a slot no material uses skips its texture sampling entirely."""
    # material row fetch: one-hot MXU matmul for small tables (~5x cheaper
    # than an 80-byte row gather per pixel), plain gather otherwise
    row = sampling.table_lookup(scene["mat_all"], mat_id)
    core = row[..., :16]
    mtex = row[..., 16:]
    m = {
        "mat_base_color": core[..., 0:4],
        "mat_emissive": core[..., 4:8],
        "mat_f0": core[..., 8],
        "mat_metallic": core[..., 9],
        "mat_roughness": core[..., 10],
        "mat_ao": core[..., 11],
    }

    # coverage-aware quad derivatives (see sampling.quad_derivs): a quad
    # partner that's uncovered holds backend-dependent garbage; hardware
    # helper lanes would extrapolate THIS pixel's plane instead
    duv_dx, duv_dy = sampling.quad_derivs(uv, covered)

    # tiered-aniso path: ONE shared footprint/tier/segment-selection pass
    # drives all used slots (4x fewer selection passes + per-slot tap
    # ceilings vs per-slot tiering; sampling.sample_slots_aniso_tiered)
    spec = sampling.aniso_spec(max_aniso)
    pre = {}
    if spec.max_taps > 1 and spec.tile_fracs and not dither and uv.ndim == 3:
        idxs = [si for si in range(4) if slots_used[si]]
        descs = {si: _slot(mtex, si) for si in idxs}
        caps = spec.slot_caps or (spec.max_taps,) * 4
        res = sampling.sample_slots_aniso_tiered(
            scene["atlas"], scene["mip_y"], scene["mip_x"],
            [(descs[si], descs[si]["n_mips"]) for si in idxs],
            uv, duv_dx, duv_dy, spec,
            slot_caps=[caps[si] for si in idxs])
        pre = dict(zip(idxs, res))

    if slots_used[0]:
        tb = _slot(mtex, 0)
        base_tex = _sample_slot(scene, tb, uv, duv_dx, duv_dy, jnp.ones(4),
                                max_aniso, dither, pre=pre.get(0))
        base_color = m["mat_base_color"] * jnp.concatenate(
            [srgb_to_linear(base_tex[..., :3]), base_tex[..., 3:4]], axis=-1)
        base_color = jnp.where(tb["valid"][..., None], base_color, m["mat_base_color"])
    else:
        base_color = jnp.broadcast_to(m["mat_base_color"], mat_id.shape + (4,))

    if slots_used[1]:
        te = _slot(mtex, 1)
        em_tex = _sample_slot(scene, te, uv, duv_dx, duv_dy, jnp.ones(4),
                                max_aniso, dither, pre=pre.get(1))
        emissive = m["mat_emissive"] * jnp.concatenate(
            [srgb_to_linear(em_tex[..., :3]), em_tex[..., 3:4]], axis=-1)
        emissive = jnp.where(te["valid"][..., None], emissive, m["mat_emissive"])
    else:
        emissive = jnp.broadcast_to(m["mat_emissive"], mat_id.shape + (4,))

    if slots_used[2]:
        to = _slot(mtex, 2)
        orm_tex = _sample_slot(scene, to, uv, duv_dx, duv_dy, jnp.ones(4),
                                max_aniso, dither, pre=pre.get(2))
        ho = to["valid"]
        occ = jnp.where(ho, m["mat_ao"] * orm_tex[..., 0], m["mat_ao"])
        prough = jnp.where(ho, m["mat_roughness"] * orm_tex[..., 1], m["mat_roughness"])
        metal = jnp.where(ho, m["mat_metallic"] * orm_tex[..., 2], m["mat_metallic"])
    else:
        occ, prough, metal = m["mat_ao"], m["mat_roughness"], m["mat_metallic"]

    # normal mapping via screen-space derivatives (pbr.glsl:121-145)
    if slots_used[3]:
        tn_slot = _slot(mtex, 3)
        hn = tn_slot["valid"]
        tn = _sample_slot(scene, tn_slot, uv, duv_dx, duv_dy, jnp.full(4, 0.5),
                          max_aniso, dither, pre=pre.get(3))[..., :3] * 2.0 - 1.0
    else:
        hn = jnp.zeros(mat_id.shape, bool)
        tn = jnp.zeros(mat_id.shape + (3,), jnp.float32)
    q1, q2 = sampling.quad_derivs(frag_pos, covered)
    st1 = duv_dx
    st2 = duv_dy

    def norm(v):
        return v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-20)

    n_geo = norm(frag_normal)
    t = norm(q1 * st2[..., 1:2] - q2 * st1[..., 1:2])
    b = -norm(jnp.cross(n_geo, t))
    mapped = norm(
        t * tn[..., 0:1] + b * tn[..., 1:2] + n_geo * tn[..., 2:3]
    )
    normal = jnp.where(hn[..., None], mapped, n_geo)

    # remaps (pbr.glsl:169-186)
    roughness = jnp.clip(prough, 0.089, 1.0) ** 2
    diffuse = (1.0 - metal)[..., None] * base_color[..., :3]
    f0 = (m["mat_f0"] * (1.0 - metal))[..., None] + base_color[..., :3] * metal[..., None]

    out = {
        "normal": normal,
        "base_color": base_color,
        "diffuse": diffuse,
        "emissive": emissive,
        "f0": f0,
        "metallic": metal,
        "roughness": roughness,
        "occlusion": occ,
    }
    if slots_used[0]:
        # raw base tap + its validity: lets the TSS albedo bake reuse
        # this pass's (tiered, expensive) sampling instead of re-running
        # it — the bake's compiled footprint halves (round-5 compile fix)
        out["base_tex_raw"] = base_tex
        out["base_valid"] = tb["valid"]
    return out


# --- lights (pbr.glsl:283-352) --------------------------------------------

def _light_direction(light, frag_pos):
    l = light["light_pos"] - frag_pos
    ln = l / jnp.maximum(jnp.linalg.norm(l, axis=-1, keepdims=True), 1e-20)
    d = -light["light_dir"]
    dn = d / jnp.maximum(jnp.linalg.norm(d, axis=-1, keepdims=True), 1e-20)
    is_dir = (light["light_type"] == 1)[..., None]
    return jnp.where(is_dir, dn, ln)


def _square_falloff(l_unnorm, falloff_radius):
    inv_r = 1.0 / jnp.maximum(falloff_radius, 0.083)
    d2 = (l_unnorm * l_unnorm).sum(-1)
    factor = d2 * inv_r * inv_r
    smooth = jnp.maximum(1.0 - factor * factor, 0.0)
    return (smooth * smooth) / jnp.maximum(d2, 1e-4)


def _spot_attenuation(l, light_dir, cos_inner, cos_outer):
    spot_scale = 1.0 / jnp.maximum(cos_inner - cos_outer, 1e-4)
    spot_offset = -cos_outer * spot_scale
    dn = -light_dir / jnp.maximum(jnp.linalg.norm(light_dir, axis=-1, keepdims=True), 1e-20)
    cd = (dn * l).sum(-1)
    att = jnp.clip(cd * spot_scale + spot_offset, 0.0, 1.0)
    return att * att


# --- the full lighting function (pbr.glsl:385-451) -------------------------

def brdf_lighting(scene, frag_pos, uv, frag_normal, mat_id, view_args,
                  shadow_maps=None, shadow_transforms=None,
                  slots_used=(True, True, True, True),
                  shadow_lights=None, max_aniso=1, debug_views=True,
                  penumbra_tiles=0, shadow_stats=None, ibl_diffuse=False,
                  dither=False, covered=None, penumbra_full_h=None):
    """Port of ``BRDF_Lighting``. Returns rgba (linear, pre-sRGB-encode).

    view_args: dict with view_pos [3], exposure, debug_input, debug_equation.
    shadow_maps: [NS,E,E] f32 or None; shadow_transforms: [NS,4,4].
    shadow_lights: optional static per-light bools (directional + has a
    shadow map) — without it every light pays the PCF window gather just
    to multiply the result by zero (the light-type test is traced).
    ``debug_views``: static; False drops the debug-switch selects entirely
    (the TPU analog of a spec constant — the reference's runtime uniform
    branch, ``pbr.glsl:410-440``, is free on a GPU but the traced selects
    cost real bandwidth here; RenderConfig.debug_views re-jits on toggle).
    """
    mat = remap_material(scene, mat_id, frag_pos, uv, frag_normal, slots_used,
                         max_aniso, dither, covered=covered)

    n = mat["normal"]
    v = view_args["view_pos"] - frag_pos
    v = v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-20)

    n_lights = scene["light_type"].shape[0]
    l0 = jnp.zeros_like(frag_pos)
    last = {}
    for li in range(n_lights):  # static, small; unrolled & fused by XLA
        light = {k: scene[k][li] for k in (
            "light_type", "light_color", "light_pos", "light_dir",
            "light_intensity", "light_falloff", "light_cos_inner",
            "light_cos_outer", "light_shadow_index")}
        in_range = li < scene["n_lights"]

        l = _light_direction(light, frag_pos)
        h = v + l
        h = h / jnp.maximum(jnp.linalg.norm(h, axis=-1, keepdims=True), 1e-20)
        nov = jnp.abs((n * v).sum(-1)) + 1e-5
        noh = jnp.clip((n * h).sum(-1), 0.0, 1.0)
        nol = jnp.clip((n * l).sum(-1), 0.0, 1.0)
        hol = jnp.clip((h * l).sum(-1), 0.0, 1.0)

        d = d_ggx(noh, mat["roughness"])
        f = f_schlick(hol, mat["f0"])
        g = g_smith_ggx_correlated(nov, nol, mat["roughness"])
        fr = (d * g)[..., None] * f
        fd = (1.0 - f) * mat["occlusion"][..., None] * mat["diffuse"] * fd_lambert()
        brdf = fr + fd

        is_punctual = (light["light_type"] == 2) | (light["light_type"] == 3)
        l_unnorm = light["light_pos"] - frag_pos
        att = jnp.where(is_punctual, _square_falloff(l_unnorm, light["light_falloff"]), 1.0)
        att = jnp.where(
            light["light_type"] == 3,
            att * _spot_attenuation(l, light["light_dir"], light["light_cos_inner"],
                                    light["light_cos_outer"]),
            att,
        )
        light_result = brdf * (light["light_intensity"] * att * nol)[..., None] \
            * light["light_color"]

        shadow = jnp.zeros_like(nol)
        if shadow_maps is not None and (shadow_lights is None
                                        or shadow_lights[li]):
            # directional / spot planar maps, or a point-light cube
            # (shadow_lights[li] == 6) — both exceed the reference's
            # directional-only live path (shadow.glsl:27). The lookup
            # handles ortho (w == 1) and perspective (divide + cull
            # behind the light plane) alike.
            cube = shadow_lights is not None and shadow_lights[li] == 6
            casts = ((light["light_type"] == 1)
                     | (light["light_type"] == 2)
                     | (light["light_type"] == 3)) \
                & (light["light_shadow_index"] >= 0)
            shadow = jnp.where(
                casts,
                compute_shadow_directional(
                    shadow_maps, shadow_transforms,
                    light["light_shadow_index"], light["light_pos"],
                    frag_pos, n, penumbra_tiles=penumbra_tiles,
                    stats_out=shadow_stats, cube=cube,
                    penumbra_full_h=penumbra_full_h),
                0.0,
            )

        l0 = l0 + jnp.where(in_range, (1.0 - shadow)[..., None] * light_result, 0.0)
        if debug_views:
            last = {"fd": fd, "f": f, "g": g, "d": d, "fr": fr,
                    "nol": nol, "nov": nov}

    color = l0 + mat["emissive"][..., :3] * mat["emissive"][..., 3:4]
    color = color * view_args["exposure"]
    if ibl_diffuse:
        # diffuse irradiance from the captured environment — the term the
        # reference leaves as a todo (pbr.glsl:442); replaces the flat
        # 0.03 ambient (pbr.glsl:448) when enabled. One row gather from
        # the tiny pre-convolved cube (scene.procedural_env).
        irr = sampling.sample_cubemap_f32(scene["irradiance"], mat["normal"])
        ambient = mat["diffuse"] * irr[..., :3] * mat["occlusion"][..., None]
    else:
        ambient = 0.03 * mat["base_color"][..., :3] * mat["occlusion"][..., None]
    color = color + ambient
    out = jnp.concatenate([color, mat["base_color"][..., 3:4]], axis=-1)
    if not debug_views:
        return out

    # debug views (pbr.glsl:410-440)
    di = view_args["debug_input"]
    de = view_args["debug_equation"]
    ones = jnp.ones_like(mat["occlusion"][..., None])

    def rgba(rgb):
        return jnp.concatenate([jnp.broadcast_to(rgb, color.shape), ones], axis=-1)

    if last:
        out = jnp.where(de == int(DebugEquation.DIFFUSE), rgba(last["fd"]), out)
        out = jnp.where(de == int(DebugEquation.FRESNEL), rgba(last["f"]), out)
        out = jnp.where(
            de == int(DebugEquation.GEOMETRY),
            rgba((last["g"] * 4.0 * jnp.abs(last["nol"]) * jnp.abs(last["nov"]))[..., None]),
            out,
        )
        out = jnp.where(de == int(DebugEquation.DISTRIBUTION), rgba(last["d"][..., None]), out)
        out = jnp.where(de == int(DebugEquation.SPECULAR), rgba(last["fr"]), out)

    out = jnp.where(di == int(DebugInput.BASE_COLOR), mat["base_color"], out)
    out = jnp.where(di == int(DebugInput.DIFFUSE_COLOR), rgba(mat["diffuse"]), out)
    out = jnp.where(di == int(DebugInput.NORMALS), rgba(mat["normal"]), out)
    out = jnp.where(di == int(DebugInput.OCCLUSION), rgba(mat["occlusion"][..., None]), out)
    out = jnp.where(
        di == int(DebugInput.EMISSIVE),
        rgba(mat["emissive"][..., :3] * mat["emissive"][..., 3:4]), out)
    out = jnp.where(di == int(DebugInput.METALLIC), rgba(mat["metallic"][..., None]), out)
    out = jnp.where(di == int(DebugInput.ROUGHNESS), rgba(mat["roughness"][..., None]), out)
    return out
