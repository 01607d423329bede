"""Texture-space ("light chart") shading — the TPU-native answer to the
reference's per-pixel fragment shading cost.

Motivation (PERF.md): per-pixel shading pays, per shade pass, two
trilinear atlas gathers, a material-row gather, the full Filament BRDF
VPU chain and a PCF window gather — the three biggest rows of the frame
trace. On TPU, *gathers price by table size and count*; dense iteration
is nearly free. So shading moves to a domain where iteration IS the
layout:

- Every triangle gets a small **chart** — a regular barycentric sample
  grid — packed into one atlas. Quad-mate triangle pairs (two tris
  sharing an edge and a material: the overwhelming case for real
  meshes) share one square, so bilinear filtering across their shared
  diagonal is seamless.
- At upload, geometry (world pos/normal) and material (full
  ``remap_material``: texture taps, ORM, normal mapping) are **baked**
  per chart texel — the per-frame pass never touches the texture atlas.
- On shadow-dirty, PCF visibility per light is baked per texel — the
  per-frame pass never gathers shadow windows.
- Lighting is FACTORED as ``screen_rgb = albedo_tex * light_d +
  light_s`` and SPLIT by view-dependence:
  - ``light_d`` (diffuse light x base-color factor x occlusion +
    ambient): **view-independent** for static lights/geometry, so it is
    *baked*, not computed per frame — refreshed only on upload,
    shadow-dirty, or exposure change.
  - ``light_s`` (specular + emissive): view-dependent; recomputed per
    frame as a dense zero-gather VPU pass over chart texels.
  The base-color texture itself is sampled per PIXEL on screen (one
  trilinear tap) so texture detail stays full resolution; only
  *lighting* runs at chart resolution — the classic lightmap
  factorization, with charts sized from the camera footprint.
- Both light tables store one **rgb9e5** u32 per texel in 2x2
  clamp-to-edge blocks: a bilinear sample is ONE 16-byte row gather
  (gather cost scales with table bytes and row elements — PERF.md).
- The screen pass per pixel: one albedo tap + two 16-byte light
  gathers. Chart UVs ride the raster kernel's attribute-plane path
  (4 attrs -> 32-column pair blocks, 4 pairs per 128-lane DMA row).

Known, documented approximations vs the per-pixel path (all at chart
resolution instead of pixel resolution): specular, normal-mapped
lighting detail, emissive textures, metal spec tint. ``RenderConfig.
texture_space`` gates the whole mode (default off = reference-exact
path); ``chart_density`` trades texels for lighting sharpness.

Reference: this subsystem replaces the per-fragment work of
``Assets/Shaders/pbr.glsl:385-451`` + ``surface_pbr.frag``; the
reference has no analog (it shades every fragment every frame).
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np

ATLAS_W = 1024          # lane-friendly fixed atlas width (texels)
MAX_R = 256             # largest chart edge sample count (square side R+1)


class ChartLayout(NamedTuple):
    corner_uv: np.ndarray   # [T,3,2] f32 per-corner atlas texel coords
    texel_tri: np.ndarray   # [Ah,Aw] i32 owning triangle (-1 = empty)
    texel_bary: np.ndarray  # [Ah,Aw,2] f32 (b1,b2) wrt the tri's corners
    height: int             # Ah (Aw is ATLAS_W)
    n_texels: int           # occupied texels (diagnostics)


def _quad_mates(tri_vidx: np.ndarray, tri_mat: np.ndarray) -> np.ndarray:
    """partner[t] = t^1 when consecutive even/odd tris share exactly two
    vertex indices and a material (the standard quad split emitted by our
    loaders and procedural builders), else -1."""
    t = len(tri_vidx)
    partner = np.full(t, -1, np.int32)
    if t < 2:
        return partner
    e = (t // 2) * 2
    a = tri_vidx[0:e:2]         # [Q,3]
    b = tri_vidx[1:e:2]
    shared = (a[:, :, None] == b[:, None, :]).any(-1).sum(-1)
    ok = (shared == 2) & (tri_mat[0:e:2] == tri_mat[1:e:2])
    q = np.nonzero(ok)[0]
    partner[2 * q] = 2 * q + 1
    partner[2 * q + 1] = 2 * q
    return partner


def _footprint_px(world_tri: np.ndarray, viewproj: np.ndarray,
                  width: int, height: int) -> np.ndarray:
    """Approximate screen-space area (px^2) of each world triangle under
    the layout camera. [T,3,3] -> [T].

    Partially-behind triangles are NEAR-CLIPPED (Sutherland-Hodgman
    against w=eps, up to a 4-gon) and measured from the clipped polygon:
    a floor plane passing under the camera always has a behind corner,
    and a constant fallback here starves exactly the triangles that fill
    the near field (they'd get a handful of texels for 40 m of floor).
    Fully-behind triangles get a small default (the camera moves after
    layout; overflow re-layout handles it)."""
    h = np.concatenate([world_tri, np.ones_like(world_tri[..., :1])], -1)
    clip = h @ viewproj.T                       # [T,3,4]
    eps = 1e-4
    behind = clip[..., 3] <= eps                # [T,3]
    nb = behind.sum(-1)
    t = len(clip)
    idx = np.arange(t)

    def corner(base, off):
        return clip[idx, (base + off) % 3]      # [T,4]

    def isect(a, b):                            # near-plane hit on edge a->b
        wa, wb = a[:, 3:4], b[:, 3:4]
        d = np.where(np.abs(wb - wa) < 1e-20, 1e-20, wb - wa)
        return a + (eps - wa) / d * (b - a)

    # 4-vert polygon per case (duplicated verts add zero shoelace area):
    # nb=0 the tri itself; nb=1 (behind corner first) [I01, c1, c2, I20];
    # nb=2 (front corner first) [c0, I01, I20, I20]; nb=3 degenerate
    b1 = behind.argmax(-1)
    f1 = (~behind).argmax(-1)
    c0b, c1b, c2b = corner(b1, 0), corner(b1, 1), corner(b1, 2)
    c0f, c1f, c2f = corner(f1, 0), corner(f1, 1), corner(f1, 2)
    poly = np.stack([clip[:, 0], clip[:, 1], clip[:, 2], clip[:, 2]], 1)
    p1 = np.stack([isect(c0b, c1b), c1b, c2b, isect(c2b, c0b)], 1)
    i20f = isect(c2f, c0f)
    p2 = np.stack([c0f, isect(c0f, c1f), i20f, i20f], 1)
    poly = np.where((nb == 1)[:, None, None], p1, poly)
    poly = np.where((nb == 2)[:, None, None], p2, poly)

    w = np.maximum(poly[..., 3], eps)
    # clamp projected corners to a box around the viewport: off-screen
    # geometry must not dominate the texel budget (its true on-screen
    # footprint is at most the viewport)
    x = np.clip(poly[..., 0] / w * (width * 0.5), -width, width)
    y = np.clip(poly[..., 1] / w * (height * 0.5), -height, height)
    xr = np.roll(x, -1, axis=1)
    yr = np.roll(y, -1, axis=1)
    area = 0.5 * np.abs((x * yr - xr * y).sum(-1))
    area = np.minimum(area, float(width * height))
    # fully outside the viewport on one side => tiny chart (the camera
    # may orbit onto it later; footprint then re-lays-out offline)
    out = ((x <= -width * 0.5).all(-1) | (x >= width * 0.5).all(-1)
           | (y <= -height * 0.5).all(-1) | (y >= height * 0.5).all(-1))
    area = np.where(out, np.minimum(area, 64.0), area)
    return np.where(nb == 3, 64.0, area)


# corner-role encoding: 0 = unique (not on the shared diagonal),
# 1/2 = shared corners ranked by GLOBAL vertex id (so quad mates agree
# on which shared vertex maps to which square corner)
def _corner_roles(tri_vidx, partner):
    t = len(tri_vidx)
    pa = np.where(partner >= 0, partner, 0)
    sh = (tri_vidx[:, :, None] == tri_vidx[pa][:, None, :]).any(-1)  # [T,3]
    sh = np.where((partner >= 0)[:, None], sh,
                  np.array([False, True, True])[None])
    uniq = np.argmin(sh, axis=1)                             # [T]
    # rank shared corners by vertex id; unpaired tris rank by corner pos
    vid = np.where((partner >= 0)[:, None], tri_vidx,
                   np.arange(3)[None].repeat(t, 0))
    big = vid.max() + 1
    key = np.where(sh, vid, big)                             # unique last
    rank = key.argsort(1, kind="stable").argsort(1, kind="stable")  # [T,3]
    roles = np.where(np.arange(3)[None] == uniq[:, None], 0, rank + 1)
    return roles                                             # [T,3] in {0,1,2}


def build_layout(tri_vidx: np.ndarray, tri_mat: np.ndarray,
                 world_pos: np.ndarray, viewproj: np.ndarray,
                 width: int, height: int, density: float = 0.5,
                 budget_texels: int = 2_000_000,
                 valid: np.ndarray | None = None) -> ChartLayout:
    """Allocate + pack per-triangle charts (host-side, once per upload).

    ``density``: chart texels per screen pixel along one axis at the
    layout camera (0.5 => lighting at half screen resolution).
    ``valid``: bool [T] — padding tris get no chart.
    """
    t = len(tri_vidx)
    empty = ChartLayout(np.zeros((max(t, 1), 3, 2), np.float32),
                        np.full((8, ATLAS_W), -1, np.int32),
                        np.zeros((8, ATLAS_W, 2), np.float32), 8, 0)
    if t == 0:
        return empty
    tri_vidx = np.asarray(tri_vidx)
    world_tri = world_pos[tri_vidx]                       # [T,3,3]
    if valid is None:
        valid = np.ones(t, bool)
    degen = ~np.asarray(valid) | (np.abs(
        np.cross(world_tri[:, 1] - world_tri[:, 0],
                 world_tri[:, 2] - world_tri[:, 0])).max(-1) < 1e-12)
    if degen.all():
        return empty
    partner = _quad_mates(tri_vidx, tri_mat)
    pok = (partner >= 0) & ~degen & ~degen[np.clip(partner, 0, t - 1)]
    partner = np.where(pok, partner, -1)

    area = _footprint_px(world_tri, viewproj, width, height)
    r_raw = density * np.sqrt(2.0 * np.maximum(area, 1.0))

    def quantize(rr):
        r = np.exp2(np.ceil(np.log2(np.maximum(rr, 1.0)))).astype(np.int64)
        r = np.clip(r, 1, MAX_R)
        r = np.where(partner >= 0,
                     np.maximum(r, r[np.clip(partner, 0, t - 1)]), r)
        r[degen] = 0
        return r

    owner_mask = ~degen & ((partner < 0) | (np.arange(t) < partner))
    owners = np.nonzero(owner_mask)[0]
    scale = 1.0
    for _ in range(6):     # pow2 quantization overshoots; iterate to fit
        r = quantize(r_raw * scale)
        total = int(((r[owners] + 1) ** 2).sum())
        if total <= budget_texels:
            break
        scale *= max(0.5, 0.85 * np.sqrt(budget_texels / total))

    # shelf packing, grouped by (few, power-of-two) square sides
    sq_r = r[owners]
    bx = np.zeros(len(owners), np.int64)
    by = np.zeros(len(owners), np.int64)
    cur_y = 0
    for size in np.unique(sq_r)[::-1]:
        sel = np.nonzero(sq_r == size)[0]
        s = int(size) + 1
        per_row = max(1, ATLAS_W // s)
        k = np.arange(len(sel))
        bx[sel] = (k % per_row) * s
        by[sel] = cur_y + (k // per_row) * s
        cur_y = int(by[sel].max()) + s
    ah = max(8, -(-cur_y // 8) * 8)

    # per-tri square base + R
    sq_of = np.full(t, -1, np.int64)
    sq_of[owners] = np.arange(len(owners))
    mate_min = np.where(partner >= 0,
                        np.minimum(np.arange(t), partner), np.arange(t))
    sq_idx = sq_of[mate_min]                              # [T] (-1 degen)
    sq = np.maximum(sq_idx, 0)
    tb = np.stack([bx[sq], by[sq]], -1).astype(np.float32)  # [T,2]
    rr = r.astype(np.float32)

    # corner atlas uvs from roles: even/single tri is the lower-left
    # triangle (unique corner at (0,0)); the odd mate is upper-right
    # (unique at (R,R)); shared corners at (R,0)/(0,R) by role rank
    roles = _corner_roles(tri_vidx, partner)              # [T,3]
    is_odd = (partner >= 0) & (np.arange(t) % 2 == 1)
    # local uv per role: [even/odd][role] -> (u,v) in R units
    lut = np.array([[[0, 0], [1, 0], [0, 1]],             # even / single
                    [[1, 1], [1, 0], [0, 1]]], np.float32)
    local = lut[is_odd.astype(np.int64)[:, None], roles]  # [T,3,2]
    corner_uv = tb[:, None, :] + local * rr[:, None, None]
    corner_uv[degen | (sq_idx < 0)] = 0.0

    # texel maps, vectorized per square-size group. Owner of a texel is
    # the even tri below the diagonal (u+v <= 1), the odd mate above.
    # Closed-form bary from roles:
    #   even/single: b(role) = {U: 1-u-v, S1: u, S2: v}
    #   odd:         b(role) = {U: u+v-1, S1: 1-v, S2: 1-u}
    texel_tri = np.full((ah, ATLAS_W), -1, np.int32)
    texel_bary = np.zeros((ah, ATLAS_W, 2), np.float32)
    even_t = owners
    odd_t = np.where(partner[owners] >= 0, partner[owners], owners)
    for size in np.unique(sq_r):
        sel = np.nonzero(sq_r == size)[0]
        s = int(size) + 1
        rs = max(int(size), 1)
        gi, gj = np.meshgrid(np.arange(s), np.arange(s), indexing="ij")
        u = (gj / rs).astype(np.float32)                  # [S,S]
        v = (gi / rs).astype(np.float32)
        lower = (u + v) <= 1.0 + 1e-6
        te = even_t[sel]                                   # [K]
        to = odd_t[sel]
        own = np.where(lower[None], te[:, None, None], to[:, None, None])
        # candidate bary grids per role: [3,S,S]
        ge = np.stack([1.0 - u - v, u, v])
        go = np.stack([u + v - 1.0, 1.0 - v, 1.0 - u])
        b_ev = np.stack([ge[roles[te, 1]], ge[roles[te, 2]]], -1)  # [K,S,S,2]
        b_od = np.stack([go[roles[to, 1]], go[roles[to, 2]]], -1)
        # unpaired squares: the upper half belongs to the SAME tri with
        # extrapolated (even-formula) barycentrics, not the odd mapping
        use_ev = lower[None, :, :] | (te == to)[:, None, None]
        bary = np.where(use_ev[..., None], b_ev, b_od)
        ys = (by[sel][:, None, None] + gi[None]).astype(np.int64)
        xs = (bx[sel][:, None, None] + gj[None]).astype(np.int64)
        texel_tri[ys, xs] = own.astype(np.int32)
        texel_bary[ys, xs] = bary
    return ChartLayout(corner_uv.astype(np.float32), texel_tri, texel_bary,
                       ah, total)


# --------------------------------------------------------------------------
# Device-side bakes + the per-frame chart lighting pass (jnp). All
# functions are shape-static and jit-friendly; the bakes run once per
# upload (geometry/material) or per shadow-dirty (visibility), the light
# pass runs per frame inside the jitted frame function.

import jax.numpy as jnp


def bake_geometry(scene) -> dict:
    """Per-texel world pos / shading inputs from the texel->tri maps.
    One [T,8] row gather + one [V,8] corner gather per texel — paid once
    per upload, never per frame."""
    tri = scene["chart_tri"]                       # [Ah,Aw] i32
    bary = scene["chart_bary"]                     # [Ah,Aw,2]
    safe = jnp.maximum(tri, 0)
    trow = scene["tri_packed"][safe]               # [Ah,Aw,8]
    vidx = trow[..., 0:3]
    vattr = jnp.concatenate([scene["world_pos"], scene["world_normal"],
                             scene["uvs"]], axis=-1)          # [V,8]
    corners = vattr[vidx]                          # [Ah,Aw,3,8]
    b1 = bary[..., 0:1]
    b2 = bary[..., 1:2]
    b = jnp.concatenate([1.0 - b1 - b2, b1, b2], -1)[..., None]
    interp = (corners * b).sum(-2)                 # [Ah,Aw,8]
    n = interp[..., 3:6]
    n = n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-20)
    return {
        "pos": interp[..., 0:3],
        "normal": n,
        "uv": interp[..., 6:8],
        "mat_id": trow[..., 3],
        "live": tri >= 0,
    }


def bake_material(scene, geo, slots_used, max_aniso: int = 1,
                  ibl_diffuse: bool = False) -> jnp.ndarray:
    """Full ``remap_material`` (texture taps, ORM, normal mapping) per
    chart texel, reduced to the factored per-texel constants the light
    pass needs. Returns chart_mat [Ah,Aw,16] f32:
      0:3  diffuse_nt  base-color FACTOR rgb x (1-metal)   (texture on screen)
      3:6  f0          (metal tint uses chart-res base color)
      6    roughness (remapped)      7  occlusion
      8:11 emissive premultiplied    11 base-color factor alpha
      12:15 ambient_d (x albedo_tex on screen)   15 live
    """
    from . import pbr, sampling

    # covered=live: dead chart texels hold zero uv — mask them out of the
    # quad derivatives like uncovered screen pixels (bake_albedo always
    # did; the material bake now matches, and its raw base tap is reused
    # by the albedo bake below instead of a second full sampling pass)
    mat = pbr.remap_material(scene, geo["mat_id"], geo["pos"], geo["uv"],
                             geo["normal"], slots_used, max_aniso,
                             covered=geo["live"])
    factor = sampling.table_lookup(scene["mat_all"], geo["mat_id"])[..., 0:4]
    factor = factor.astype(jnp.float32)
    one_m = (1.0 - mat["metallic"])[..., None]
    diffuse_nt = factor[..., :3] * one_m
    if ibl_diffuse:
        irr = sampling.sample_cubemap_f32(scene["irradiance"], mat["normal"])
        amb = diffuse_nt * irr[..., :3] * mat["occlusion"][..., None]
    else:
        amb = 0.03 * factor[..., :3] * mat["occlusion"][..., None]
    live = geo["live"][..., None].astype(jnp.float32)
    out = jnp.concatenate([
        diffuse_nt,
        mat["f0"],
        mat["roughness"][..., None],
        mat["occlusion"][..., None],
        mat["emissive"][..., :3] * mat["emissive"][..., 3:4],
        factor[..., 3:4],
        amb,
        live,
    ], axis=-1)
    # store the mapped normal for the light pass (normal-mapped at chart
    # resolution) by overwriting geo's interpolated normal; ``mat`` rides
    # along so bake_albedo can reuse the raw base tap
    return out * live, mat["normal"], mat


def bake_visibility(scene, geo, shadow_maps, shadow_transforms,
                    shadow_lights) -> jnp.ndarray:
    """(1 - shadow) per texel per light — PCF runs HERE, once per
    shadow-dirty, never per frame. PLANAR [NL,Ah,Aw] f32; ``geo`` may
    carry pos/normal channel-minor (bake convention) or planar [3,Ah,Aw]
    (the stored form) — planar is transposed once here."""
    from .shadow import compute_shadow_directional

    pos, normal = geo["pos"], geo["normal"]
    if pos.shape[0] == 3 and pos.ndim == 3:       # stored planar form
        pos = jnp.moveaxis(pos, 0, -1)
        normal = jnp.moveaxis(normal, 0, -1)
    nl = scene["light_type"].shape[0]
    vis = []
    for li in range(nl):
        if shadow_maps is None or not shadow_lights[li]:
            vis.append(jnp.ones(geo["mat_id"].shape, jnp.float32))
            continue
        s = compute_shadow_directional(
            shadow_maps, shadow_transforms, scene["light_shadow_index"][li],
            scene["light_pos"][li], pos, normal,
            penumbra_tiles=0, cube=shadow_lights[li] == 6)
        vis.append(1.0 - s)
    return jnp.stack(vis, axis=0)


def _light_common(scene, li: int, pos, n, chart_vis):
    """Per-light direction + shared scalar weight (intensity x attenuation
    x nol x visibility) x color — the factor both the diffuse and the
    specular lobes multiply (pbr.glsl:385-409).

    PLANAR layout: ``pos``/``n`` are [3,Ah,Aw] channel-leading planes,
    ``chart_vis`` is [NL,Ah,Aw]. Channel-minor [...,3] arrays pack 3 of
    128 vreg lanes on TPU (~2% utilization) — the planar form runs each
    channel as a full (8,128)-tiled 2D plane. Returns ((lx,ly,lz),
    (cr,cg,cb)) planes."""
    lt = scene["light_type"][li]
    lc = scene["light_color"][li]
    lp = scene["light_pos"][li]
    ldir = scene["light_dir"][li]
    in_range = jnp.where(li < scene["n_lights"], 1.0, 0.0)

    px_, py_, pz_ = pos[0], pos[1], pos[2]
    nx_, ny_, nz_ = n[0], n[1], n[2]
    # direction: punctual = normalize(light_pos - pos); directional =
    # -normalize(light_dir)   (pbr.py::_light_direction)
    ux = lp[0] - px_
    uy = lp[1] - py_
    uz = lp[2] - pz_
    d2 = ux * ux + uy * uy + uz * uz
    inv = 1.0 / jnp.maximum(jnp.sqrt(d2), 1e-20)
    dn = -ldir / jnp.maximum(jnp.sqrt((ldir * ldir).sum()), 1e-20)
    is_dir = lt == 1
    lx = jnp.where(is_dir, dn[0], ux * inv)
    ly = jnp.where(is_dir, dn[1], uy * inv)
    lz = jnp.where(is_dir, dn[2], uz * inv)
    nol = jnp.clip(nx_ * lx + ny_ * ly + nz_ * lz, 0.0, 1.0)
    # square falloff (pbr.py::_square_falloff) for punctual lights
    inv_r = 1.0 / jnp.maximum(scene["light_falloff"][li], 0.083)
    factor = d2 * (inv_r * inv_r)
    smooth = jnp.maximum(1.0 - factor * factor, 0.0)
    sq = (smooth * smooth) / jnp.maximum(d2, 1e-4)
    is_punctual = (lt == 2) | (lt == 3)
    att = jnp.where(is_punctual, sq, 1.0)
    # spot cone (pbr.py::_spot_attenuation)
    ci = scene["light_cos_inner"][li]
    co = scene["light_cos_outer"][li]
    spot_scale = 1.0 / jnp.maximum(ci - co, 1e-4)
    cd = dn[0] * lx + dn[1] * ly + dn[2] * lz
    satt = jnp.clip(cd * spot_scale - co * spot_scale, 0.0, 1.0)
    att = jnp.where(lt == 3, att * (satt * satt), att)
    cw = (scene["light_intensity"][li] * att * nol) * chart_vis[li] \
        * in_range
    return (lx, ly, lz), (cw * lc[0], cw * lc[1], cw * lc[2])


def chart_light_static(scene, chart_pos, chart_normal, chart_mat, chart_vis,
                       exposure):
    """The STATIC (view-independent) half of the factored lighting: summed
    diffuse from every light x baked PCF visibility, exposure folded in,
    plus the ambient term. Baked once per upload / shadow-dirty /
    exposure change — NOT per frame (lights and geometry are static; the
    camera is not, but diffuse doesn't see it). PLANAR: inputs
    [3/16/NL,Ah,Aw], output [3,Ah,Aw].

    Approximation vs the per-pixel path: the diffuse lobe's (1 - F(hol))
    energy factor is view-dependent; the bake uses (1 - f0) (its
    normal-incidence value). Dielectric f0 = 0.04, so the divergence only
    matters at grazing view angles where nol is small too."""
    from . import pbr

    k = pbr.fd_lambert()
    occ = chart_mat[7]
    fd = [(1.0 - chart_mat[3 + c]) * occ * chart_mat[c] * k
          for c in range(3)]
    ld = [jnp.zeros_like(chart_pos[0]) for _ in range(3)]
    for li in range(scene["light_type"].shape[0]):
        _, common = _light_common(scene, li, chart_pos, chart_normal,
                                  chart_vis)
        for c in range(3):
            ld[c] = ld[c] + fd[c] * common[c]
    return jnp.stack([ld[c] * exposure + chart_mat[12 + c]
                      for c in range(3)])                   # + ambient_d


def chart_light_spec(scene, chart_pos, chart_normal, chart_mat, chart_vis,
                     view_args):
    """The per-frame (view-dependent) half: summed Filament specular +
    emissive, exposed. Dense VPU over chart texels, zero gathers. PLANAR:
    inputs [3/16/NL,Ah,Aw], output [3,Ah,Aw] (measured 6.5 -> ~1.5 ms at
    a 2M-texel atlas vs the channel-minor form)."""
    from . import pbr

    nx_, ny_, nz_ = chart_normal[0], chart_normal[1], chart_normal[2]
    rough = chart_mat[6]
    vp = view_args["view_pos"]
    vx = vp[0] - chart_pos[0]
    vy = vp[1] - chart_pos[1]
    vz = vp[2] - chart_pos[2]
    vinv = 1.0 / jnp.maximum(jnp.sqrt(vx * vx + vy * vy + vz * vz), 1e-20)
    vx, vy, vz = vx * vinv, vy * vinv, vz * vinv
    nov = jnp.abs(nx_ * vx + ny_ * vy + nz_ * vz) + 1e-5
    ls = [jnp.zeros_like(rough) for _ in range(3)]
    for li in range(scene["light_type"].shape[0]):
        (lx, ly, lz), common = _light_common(scene, li, chart_pos,
                                             chart_normal, chart_vis)
        hx, hy, hz = vx + lx, vy + ly, vz + lz
        hinv = 1.0 / jnp.maximum(jnp.sqrt(hx * hx + hy * hy + hz * hz),
                                 1e-20)
        hx, hy, hz = hx * hinv, hy * hinv, hz * hinv
        noh = jnp.clip(nx_ * hx + ny_ * hy + nz_ * hz, 0.0, 1.0)
        nol = jnp.clip(nx_ * lx + ny_ * ly + nz_ * lz, 0.0, 1.0)
        hol = jnp.clip(hx * lx + hy * ly + hz * lz, 0.0, 1.0)
        d = pbr.d_ggx(noh, rough)
        s5 = jnp.power(1.0 - hol, 5.0)
        g = pbr.g_smith_ggx_correlated(nov, nol, rough)
        dg = d * g
        for c in range(3):
            f0c = chart_mat[3 + c]
            ls[c] = ls[c] + dg * (f0c + (1.0 - f0c) * s5) * common[c]
    e = view_args["exposure"]
    return jnp.stack([(ls[c] + chart_mat[8 + c]) * e for c in range(3)])


# --- rgb9e5 shared-exponent HDR packing (one u32 per texel) -------------
# Gather cost scales with table bytes AND row element count (PERF.md), so
# the light tables store each texel as ONE u32: 9-bit mantissas r|g|b and
# a 5-bit shared exponent (the GL_EXT_texture_shared_exponent layout).
# Max relative step 2^-9 of the dominant channel — under half an 8-bit
# code after the sRGB encode for the values that matter.

_E_BIAS = 24   # value = mant * 2^(e - _E_BIAS); e in [0,31]


def rgb9e5_encode(rgb: jnp.ndarray) -> jnp.ndarray:
    """[...,3] f32 (>=0, HDR) -> [...] u32."""
    import jax

    rgb = jnp.clip(rgb, 0.0, 65408.0)
    m = jnp.maximum(jnp.max(rgb, axis=-1), 3e-5)   # normal f32; e >= 0
    # floor(log2(m)) from the f32 exponent bits (m is normal, positive)
    k = (jax.lax.bitcast_convert_type(m, jnp.uint32) >> 23).astype(jnp.int32) - 127
    e = jnp.clip(k + 16, 0, 31)                    # mant of max in [256,511]
    # 2^(_E_BIAS - e) by exponent-bit construction
    inv_scale = jax.lax.bitcast_convert_type(
        ((127 + _E_BIAS - e) << 23).astype(jnp.uint32), jnp.float32)
    mant = jnp.clip(jnp.round(rgb * inv_scale[..., None]), 0, 511)
    mant = mant.astype(jnp.uint32)
    return (mant[..., 0] | (mant[..., 1] << 9) | (mant[..., 2] << 18)
            | (e.astype(jnp.uint32) << 27))


def rgb9e5_decode(raw: jnp.ndarray) -> jnp.ndarray:
    """[...] u32 -> [...,3] f32."""
    import jax

    e = (raw >> 27).astype(jnp.int32)
    scale = jax.lax.bitcast_convert_type(
        ((127 - _E_BIAS + e) << 23).astype(jnp.uint32), jnp.float32)
    mant = jnp.stack([raw & 511, (raw >> 9) & 511, (raw >> 18) & 511],
                     axis=-1).astype(jnp.float32)
    return mant * scale[..., None]


def rgb9e5_encode_planes(r, g, b) -> jnp.ndarray:
    """Planar ``rgb9e5_encode``: three [Ah,Aw] f32 planes -> [Ah,Aw] u32
    (bit-identical to the channel-minor form, full lane utilization)."""
    import jax

    r = jnp.clip(r, 0.0, 65408.0)
    g = jnp.clip(g, 0.0, 65408.0)
    b = jnp.clip(b, 0.0, 65408.0)
    m = jnp.maximum(jnp.maximum(jnp.maximum(r, g), b), 3e-5)
    k = (jax.lax.bitcast_convert_type(m, jnp.uint32) >> 23).astype(jnp.int32) - 127
    e = jnp.clip(k + 16, 0, 31)
    inv_scale = jax.lax.bitcast_convert_type(
        ((127 + _E_BIAS - e) << 23).astype(jnp.uint32), jnp.float32)
    mr = jnp.clip(jnp.round(r * inv_scale), 0, 511).astype(jnp.uint32)
    mg = jnp.clip(jnp.round(g * inv_scale), 0, 511).astype(jnp.uint32)
    mb = jnp.clip(jnp.round(b * inv_scale), 0, 511).astype(jnp.uint32)
    return mr | (mg << 9) | (mb << 18) | (e.astype(jnp.uint32) << 27)


def _shift_blocks(p: jnp.ndarray) -> list:
    """2x2 clamp-to-edge neighborhood planes [p, p+x, p+y, p+xy]."""
    px = jnp.concatenate([p[:, 1:], p[:, -1:]], axis=1)
    py = jnp.concatenate([p[1:], p[-1:]], axis=0)
    pxy = jnp.concatenate([px[1:], px[-1:]], axis=0)
    return [p, px, py, pxy]


def pack_rgbe_planes(atlas_p: jnp.ndarray) -> jnp.ndarray:
    """PLANAR [3,Ah,Aw] f32 -> [4,Ah,Aw] u32 neighborhood planes (the
    un-interleaved form of ``pack_rgbe_blocks`` — kept planar so the
    static and per-frame tables can merge into one row table with a
    single interleave)."""
    p = rgb9e5_encode_planes(atlas_p[0], atlas_p[1], atlas_p[2])
    return jnp.stack(_shift_blocks(p))


def pack_rgbe_blocks(atlas_p: jnp.ndarray) -> jnp.ndarray:
    """PLANAR [3,Ah,Aw] f32 -> [Ah*Aw,4] u32 2x2 clamp-to-edge rgb9e5
    blocks: one 16-byte row gather fetches all four bilinear corners (the
    texture-atlas trick, scene.textures.build_atlas). Pure u32
    slicing/concat — no sub-word bitcasts, so XLA keeps the layout (the
    f16-pair variant cost 28 ms/frame in relayouts)."""
    planes = pack_rgbe_planes(atlas_p)                      # [4,Ah,Aw]
    return jnp.moveaxis(planes.reshape(4, -1), 0, 1)        # [Ah*Aw,4]


def merge_light_planes(ld_planes: jnp.ndarray,
                       ls_planes: jnp.ndarray) -> jnp.ndarray:
    """[4,Ah,Aw] u32 x2 (static diffuse, per-frame specular) -> [Ah*Aw,8]
    u32: ONE 32-byte row gather fetches both light tables' full bilinear
    footprints (gathers price per index — merging halves the index count
    of every light lookup)."""
    both = jnp.concatenate([ld_planes, ls_planes], axis=0)  # [8,Ah,Aw]
    return jnp.moveaxis(both.reshape(8, -1), 0, 1)          # [Ah*Aw,8]


def rgb9e5_decode_planes(raw: jnp.ndarray):
    """[...] u32 plane -> (r, g, b) f32 planes."""
    import jax

    e = (raw >> 27).astype(jnp.int32)
    scale = jax.lax.bitcast_convert_type(
        ((127 - _E_BIAS + e) << 23).astype(jnp.uint32), jnp.float32)
    return ((raw & 511).astype(jnp.float32) * scale,
            ((raw >> 9) & 511).astype(jnp.float32) * scale,
            ((raw >> 18) & 511).astype(jnp.float32) * scale)


def sample_rgbe_blocks(blocks: jnp.ndarray, uv: jnp.ndarray,
                       ah: int, aw: int) -> jnp.ndarray:
    """Bilinear light-table sample: uv [...,2] in texel coords (samples
    sit AT integer positions). Returns [...,3] f32. ONE 16-byte gather."""
    x = jnp.clip(uv[..., 0], 0.0, aw - 1.001)
    y = jnp.clip(uv[..., 1], 0.0, ah - 1.001)
    ix = jnp.floor(x).astype(jnp.int32)
    iy = jnp.floor(y).astype(jnp.int32)
    fx = (x - ix.astype(jnp.float32))[..., None]
    fy = (y - iy.astype(jnp.float32))[..., None]
    raw = blocks[iy * aw + ix]                             # [...,4] u32
    # planar mix: one word transpose + per-channel full-lane planes
    # (minor-dim-4 slices multiply generated TPU code — round-5 fix;
    # same op order per element, bit-equal results)
    words = jnp.moveaxis(raw, -1, 0)                       # [4, ...]
    fxp, fyp = fx[..., 0], fy[..., 0]
    corners = [rgb9e5_decode_planes(words[k]) for k in range(4)]
    chans = []
    for c in range(3):
        top = corners[0][c] * (1 - fxp) + corners[1][c] * fxp
        bot = corners[2][c] * (1 - fxp) + corners[3][c] * fxp
        chans.append(top * (1 - fyp) + bot * fyp)
    return jnp.stack(chans, -1)


def _slot_planes(p6):
    """``pbr._slot`` from 6 channel-leading planes (cols 16..21 of
    mat_all: page,x,y,w,h,n_mips for texture slot 0)."""
    return {
        "page": p6[0].astype(jnp.int32),
        "x": p6[1].astype(jnp.int32),
        "y": p6[2].astype(jnp.int32),
        "w": p6[3].astype(jnp.int32),
        "h": p6[4].astype(jnp.int32),
        "n_mips": p6[5].astype(jnp.int32),
        "valid": p6[0] >= 0,
    }


def _uv_planes(uv):
    """Accept a uv as channel-minor [...,2] OR a (x_plane, y_plane) pair
    (the raster's ``planar_attrs`` form — minor-dim slices of a [...,2]
    array cost real relayout ms at 1080p)."""
    if isinstance(uv, (tuple, list)):
        return uv[0], uv[1]
    return uv[..., 0], uv[..., 1]


def _uv_minor(uv):
    if isinstance(uv, (tuple, list)):
        return jnp.stack(list(uv), axis=-1)
    return uv


def sample_light8(light8: jnp.ndarray, uv: jnp.ndarray,
                  ah: int, aw: int):
    """Bilinear sample of BOTH light tables from the merged [Ah*Aw,8]
    row table (``merge_light_planes``): ONE 32-byte gather per index.
    Returns ([...,3] ld, [...,3] ls)."""
    ux, uy = _uv_planes(uv)
    x = jnp.clip(ux, 0.0, aw - 1.001)
    y = jnp.clip(uy, 0.0, ah - 1.001)
    ix = jnp.floor(x).astype(jnp.int32)
    iy = jnp.floor(y).astype(jnp.int32)
    fx = x - ix.astype(jnp.float32)
    fy = y - iy.astype(jnp.float32)
    raw = light8[iy * aw + ix]                             # [...,8] u32
    words = jnp.moveaxis(raw, -1, 0)    # [8, ...]: planar words (one
    # transpose instead of 8 minor-dim slices — round-5 compile-size fix)
    ws = ((1 - fx) * (1 - fy), fx * (1 - fy), (1 - fx) * fy, fx * fy)

    def blend(off):
        acc = None
        for ci in range(4):
            r_, g_, b_ = rgb9e5_decode_planes(words[off + ci])
            t = (r_ * ws[ci], g_ * ws[ci], b_ * ws[ci])
            acc = t if acc is None else tuple(a + v for a, v in zip(acc, t))
        return jnp.stack(acc, axis=-1)

    return blend(0), blend(4)


def sample_light_halfres(light8, chart_uv, ah: int, aw: int,
                         y0: int = 0, sim_radius: float = 3.0,
                         uv=None, mat_id=None):
    """Light-table sampling on the HALF-resolution pixel grid + a
    chart-uv-guided upsample back to full res — the gather-count killer.

    A 2M-index gather costs ~10 ms on TPU *per gather op* (per-index cost
    dominates; table size is secondary — PERF.md), and lighting varies at
    chart density (~half a screen pixel) anyway, so sampling the light
    field at every screen pixel buys nothing. Instead:

    - ONE merged-table gather at the even-pixel half grid (4x fewer
      indices than full res, and half the indices of separate ld/ls
      tables — ``light8`` is the [Ah*Aw,8] ``merge_light_planes`` row
      table),
    - upsample bilinearly where a corner's chart uv is within
      ``sim_radius`` texels of the pixel's own (same surface — charts of
      different triangles land in different atlas squares, far apart in
      uv), falling back toward the nearest corner at silhouettes.

    The upsample is repeats/slices/elementwise — zero full-res gathers —
    and runs PLANAR (channel-leading 2D planes; channel-minor arrays
    pack 3-8 of 128 vreg lanes).
    ``y0``: global row of this image slice (sharded slices must agree on
    the GLOBAL even-row grid; a TRACED y0 — shard_map offsets — assumes
    even slice starts, the sharded path's row split for even heights,
    else the half grid is locally anchored: a 1-row phase shift, not an
    error).

    Chart subdivision packs one floor into many cells (own atlas squares),
    so a cross-cell corner is far in chart uv and gets rejected even on
    the same surface — measured, that rejection-renormalize behavior
    BEATS accepting far corners by material-uv continuity (the nearer
    same-cell samples smear a crisp light hotspot less), so the chart-uv
    test stays the only criterion. Returns ([...,3] ld, [...,3] ls)."""
    del uv, mat_id                                    # see docstring
    import jax

    cux, cuy = _uv_planes(chart_uv)
    h, w = cux.shape
    r0 = (y0 % 2) if isinstance(y0, int) else 0   # static slicing only

    def half_grid(p):
        # stride-2 sampling via a 1x1 reduce_window: XLA lowers a plain
        # p[::2, ::2] strided slice to a ~5 ms relayout at 1080p, while
        # the window reduce runs at memory speed (~0.5 ms)
        q = p[r0:] if r0 else p
        return jax.lax.reduce_window(q, -jnp.inf, jax.lax.max,
                                     (1, 1), (2, 2), "VALID")

    hux = half_grid(cux)                              # [Hh,Wh]
    huy = half_grid(cuy)
    x = jnp.clip(hux, 0.0, aw - 1.001)
    y = jnp.clip(huy, 0.0, ah - 1.001)
    ix = jnp.floor(x).astype(jnp.int32)
    iy = jnp.floor(y).astype(jnp.int32)
    fxh = x - ix.astype(jnp.float32)
    fyh = y - iy.astype(jnp.float32)
    raw = light8[iy * aw + ix]                        # [Hh,Wh,8] u32
    words = jnp.moveaxis(raw, -1, 0)                  # planar words
    # bilinear blend of the 2x2 block corners, per table, PLANAR
    ws = ((1 - fxh) * (1 - fyh), fxh * (1 - fyh),
          (1 - fxh) * fyh, fxh * fyh)

    def blend(table_off):
        acc = None
        for ci in range(4):
            r_, g_, b_ = rgb9e5_decode_planes(words[table_off + ci])
            t = (r_ * ws[ci], g_ * ws[ci], b_ * ws[ci])
            acc = t if acc is None else tuple(a + x_ for a, x_ in zip(acc, t))
        return acc

    ld3 = blend(0)
    ls3 = blend(4)
    out = _guided_upsample([*ld3, *ls3], hux, huy, cux, cuy, r0, sim_radius)
    return jnp.stack(out[0:3], axis=-1), jnp.stack(out[3:6], axis=-1)


def _guided_upsample(channels, hux, huy, cux, cuy, r0, sim_radius=3.0):
    """Chart-uv-guided 2x upsample shared by the half-res samplers:
    ``channels`` are half-grid [Hh,Wh] planes sampled at chart uv
    (hux,huy); (cux,cuy) are the full-res per-pixel chart uvs. Returns
    full-res planes (same count). All plane math — zero gathers."""
    h, w = cux.shape

    def up(x_):                      # h[i,j] -> full[y,x] = h[y//2,x//2]
        f = jnp.repeat(jnp.repeat(x_, 2, axis=0), 2, axis=1)
        if r0:
            f = jnp.concatenate([f[:1], f[:-1]], axis=0)
        return f[:h, :w]

    def cshift(u):                   # full-res equivalent of the half +x
        ex = u[:, -1:]
        return jnp.concatenate([u[:, 2:], ex, ex], axis=1)

    def rshift(u):                   # full-res equivalent of the half +y
        ey = u[-1:]
        if r0:
            # up() clamps full row 0 to half row 0 (phase shift), so the
            # +y neighbor of row 0 is half row 1 = upsampled row 3
            return jnp.concatenate([u[3:4], u[3:], ey, ey], axis=0)
        return jnp.concatenate([u[2:], ey, ey], axis=0)

    def shifts(p):
        """[p, p+x, p+y, p+xy] corner planes at FULL res: one upsample,
        then the half-grid neighbor shifts become full-res shifts by 2
        (up(shift(p)) == shift2(up(p)), clamp included — the appended
        edge columns/rows equal the half-grid clamp value). One repeat-
        expansion per channel instead of four."""
        u = up(p)
        sx = cshift(u)
        return [u, sx, rshift(u), rshift(sx)]

    hl = list(channels) + [hux, huy]
    corners = [shifts(p) for p in hl]                 # [C+2][4] planes
    nc = len(channels)

    yy = (jnp.arange(h, dtype=jnp.int32) - r0) % 2
    xx = jnp.arange(w, dtype=jnp.int32) % 2
    fy = (0.5 * yy.astype(jnp.float32))[:, None]
    fx = (0.5 * xx.astype(jnp.float32))[None, :]

    dists = [jnp.abs(corners[nc][ci] - cux) + jnp.abs(corners[nc + 1][ci] - cuy)
             for ci in range(4)]
    wts = [(1 - fy) * (1 - fx) * (dists[0] < sim_radius),
           (1 - fy) * fx * (dists[1] < sim_radius),
           fy * (1 - fx) * (dists[2] < sim_radius),
           fy * fx * (dists[3] < sim_radius)]
    tot = wts[0] + wts[1] + wts[2] + wts[3]
    inv_tot = 1.0 / jnp.maximum(tot, 1e-6)
    # silhouette fallback mask: every corner rejected -> the corner whose
    # chart uv is closest to the pixel's own (the same-surface sample if
    # one exists; corner 0 is only screen-nearest, not surface-nearest)
    bd = jnp.minimum(jnp.minimum(dists[0], dists[1]),
                     jnp.minimum(dists[2], dists[3]))
    degenerate = tot <= 1e-6
    bsel = [dists[0] == bd]
    taken = bsel[0]
    for ci in (1, 2, 3):
        s = (dists[ci] == bd) & ~taken
        bsel.append(s)
        taken = taken | s
    out = []
    for c in range(nc):
        acc = (corners[c][0] * wts[0] + corners[c][1] * wts[1]
               + corners[c][2] * wts[2] + corners[c][3] * wts[3]) * inv_tot
        best = (corners[c][0] * bsel[0] + corners[c][1] * bsel[1]
                + corners[c][2] * bsel[2] + corners[c][3] * bsel[3])
        out.append(jnp.where(degenerate, best, acc))
    return out


def tss_shade_pre_halfres(rgb_blocks, a_blocks, chart_uv, ah: int, aw: int,
                          y0: int = 0, need_alpha: bool = True,
                          sim_radius: float = 3.0):
    """``tss_shade_pre`` for DENSE full-screen passes: gather the
    pre-shaded rgb block table on the half-pixel grid (4x fewer indices)
    and chart-uv-guided-upsample — the pre-shaded chart rgb varies at
    chart density, so the upsample loses nothing the factored half-res
    light path doesn't. Alpha (when not a material factor) rides the
    same half grid."""
    import jax

    cux, cuy = _uv_planes(chart_uv)
    h, w = cux.shape
    r0 = (y0 % 2) if isinstance(y0, int) else 0

    def half_grid(p):
        q = p[r0:] if r0 else p
        return jax.lax.reduce_window(q, -jnp.inf, jax.lax.max,
                                     (1, 1), (2, 2), "VALID")

    hux = half_grid(cux)
    huy = half_grid(cuy)
    x = jnp.clip(hux, 0.0, aw - 1.001)
    y = jnp.clip(huy, 0.0, ah - 1.001)
    ix = jnp.floor(x).astype(jnp.int32)
    iy = jnp.floor(y).astype(jnp.int32)
    fxh = x - ix.astype(jnp.float32)
    fyh = y - iy.astype(jnp.float32)
    flat = iy * aw + ix
    raw = rgb_blocks[flat]                            # [Hh,Wh,4] u32
    words = jnp.moveaxis(raw, -1, 0)                  # planar words
    ws = ((1 - fxh) * (1 - fyh), fxh * (1 - fyh),
          (1 - fxh) * fyh, fxh * fyh)
    acc = None
    for ci in range(4):
        r_, g_, b_ = rgb9e5_decode_planes(words[ci])
        t = (r_ * ws[ci], g_ * ws[ci], b_ * ws[ci])
        acc = t if acc is None else tuple(a + v for a, v in zip(acc, t))
    channels = list(acc)
    if need_alpha:
        ar = a_blocks[flat]                           # [Hh,Wh] u32
        a00 = (ar & 255).astype(jnp.float32)
        a10 = ((ar >> 8) & 255).astype(jnp.float32)
        a01 = ((ar >> 16) & 255).astype(jnp.float32)
        a11 = ((ar >> 24) & 255).astype(jnp.float32)
        channels.append((a00 * ws[0] + a10 * ws[1] + a01 * ws[2]
                         + a11 * ws[3]) / 255.0)
    out = _guided_upsample(channels, hux, huy, cux, cuy, r0, sim_radius)
    a = out[3] if need_alpha else jnp.ones_like(out[0])
    return jnp.stack([out[0], out[1], out[2], a], axis=-1)


def tss_shade_halfres(scene, chart_uv, uv, mat_id, light8,
                      ah: int, aw: int, y0: int = 0,
                      slots_used=(True, True, True, True),
                      max_aniso: int = 1, dither: bool = False,
                      covered=None):
    """``tss_shade`` with the half-res light path (dense [H,W] passes
    only — packed sparse tiles keep per-pixel gathers, their index
    counts are already small)."""
    from . import pbr, sampling
    from .srgb import srgb_to_linear

    light_d, light_s = sample_light_halfres(light8, chart_uv,
                                            ah, aw, y0, uv=uv, mat_id=mat_id)
    uv = _uv_minor(uv)              # the sampler path is channel-minor
    # PLANAR column lookup: only base-color-factor alpha (col 3) + the
    # base-texture slot (cols 16..21) are consumed here, and the planar
    # form avoids the [H,W,40]-row relayout copy (~1 ms/pass at 1080p)
    pl7 = sampling.table_lookup_planar(scene["mat_all"], mat_id,
                                       (3, 16, 17, 18, 19, 20, 21))
    factor_a = pl7[0]
    if slots_used[0]:
        tb = _slot_planes(pl7[1:])
        duv_dx, duv_dy = sampling.quad_derivs(uv, covered)
        tap = pbr._sample_slot(scene, tb, uv, duv_dx, duv_dy,
                               jnp.ones(4), max_aniso, dither)
        alb = jnp.where(tb["valid"][..., None],
                        srgb_to_linear(tap[..., :3]), 1.0)
        ta = jnp.where(tb["valid"], tap[..., 3], 1.0)
    else:
        alb = jnp.ones_like(light_d)
        ta = jnp.ones_like(light_d[..., 0])
    rgb = alb * light_d + light_s
    a = ta * factor_a
    return jnp.concatenate([rgb, a[..., None]], axis=-1)


def bake_albedo(scene, geo, slots_used=(True, True, True, True),
                max_aniso: int = 1, tap=None, tap_valid=None):
    """Per-chart-texel base-color texture tap for the PRE-SHADED mode
    (``RenderConfig.tss_preshaded``): linear rgb + alpha (texture alpha x
    the material base-color-factor alpha). Baked once per upload — the
    screen pass then never touches the texture atlas. Mip selection uses
    chart-grid uv derivatives, which match screen derivatives at the
    layout camera when chart_density ~= 1."""
    from . import pbr, sampling
    from .srgb import srgb_to_linear

    uv = geo["uv"]
    row = sampling.table_lookup(scene["mat_all"], geo["mat_id"])
    factor_a = row[..., 3].astype(jnp.float32)
    if slots_used[0]:
        if tap is None:
            # standalone path: sample here. The _bake_all pipeline passes
            # the raw base tap from the material bake instead (one tiered
            # sampling pass, not two — halves the bake's compiled code)
            tb = pbr._slot(row[..., 16:].astype(jnp.float32), 0)
            # dead chart texels hold zero uv: mask them out of the quad
            # derivatives like uncovered screen pixels
            duv_dx, duv_dy = sampling.quad_derivs(uv, geo["live"])
            tap = pbr._sample_slot(scene, tb, uv, duv_dx, duv_dy,
                                   jnp.ones(4), max_aniso)
            tap_valid = tb["valid"]
        alb = jnp.where(tap_valid[..., None],
                        srgb_to_linear(tap[..., :3]), 1.0)
        ta = jnp.where(tap_valid, tap[..., 3], 1.0)
    else:
        alb = jnp.ones(uv.shape[:2] + (3,), jnp.float32)
        ta = jnp.ones(uv.shape[:2], jnp.float32)
    live = geo["live"][..., None].astype(jnp.float32)
    return alb * live, ta * factor_a * live[..., 0]


def pack_alpha_blocks(a: jnp.ndarray) -> jnp.ndarray:
    """[Ah,Aw] f32 alpha -> [Ah*Aw] u32 2x2 clamp-to-edge u8 blocks
    (a00 | a10<<8 | a01<<16 | a11<<24): one 4-byte gather per bilinear
    alpha sample in translucent pre-shaded passes."""
    q = jnp.clip(jnp.round(a * 255.0), 0, 255).astype(jnp.uint32)
    qx = jnp.concatenate([q[:, 1:], q[:, -1:]], axis=1)
    qy = jnp.concatenate([q[1:], q[-1:]], axis=0)
    qxy = jnp.concatenate([qx[1:], qx[-1:]], axis=0)
    return (q | (qx << 8) | (qy << 16) | (qxy << 24)).reshape(-1)


def tss_shade_pre(rgb_blocks, a_blocks, chart_uv, ah: int, aw: int,
                  need_alpha: bool = False):
    """The PRE-SHADED screen pass: ONE 16-byte rgb9e5-block gather per
    pixel (+ one 4-byte alpha-block gather when the pass blends).
    Everything else — albedo, diffuse, specular, emissive, ambient — was
    composed in chart space."""
    cux, cuy = _uv_planes(chart_uv)
    x = jnp.clip(cux, 0.0, aw - 1.001)
    y = jnp.clip(cuy, 0.0, ah - 1.001)
    ix = jnp.floor(x).astype(jnp.int32)
    iy = jnp.floor(y).astype(jnp.int32)
    fx = (x - ix.astype(jnp.float32))[..., None]
    fy = (y - iy.astype(jnp.float32))[..., None]
    flat = iy * aw + ix
    raw = rgb_blocks[flat]                                  # [...,4] u32
    # planar corner decode + per-channel mix (round-5 compile-size fix;
    # same op order per element, bit-equal)
    words = jnp.moveaxis(raw, -1, 0)
    fxp, fyp = fx[..., 0], fy[..., 0]
    corners = [rgb9e5_decode_planes(words[k]) for k in range(4)]
    rgb = jnp.stack(
        [(corners[0][c] * (1 - fxp) + corners[1][c] * fxp) * (1 - fyp)
         + (corners[2][c] * (1 - fxp) + corners[3][c] * fxp) * fyp
         for c in range(3)], -1)
    if need_alpha:
        ar = a_blocks[flat]                                 # [...] u32
        a00 = (ar & 255).astype(jnp.float32)
        a10 = ((ar >> 8) & 255).astype(jnp.float32)
        a01 = ((ar >> 16) & 255).astype(jnp.float32)
        a11 = ((ar >> 24) & 255).astype(jnp.float32)
        gx, gy = fx[..., 0], fy[..., 0]
        a = ((a00 * (1 - gx) + a10 * gx) * (1 - gy)
             + (a01 * (1 - gx) + a11 * gx) * gy) / 255.0
    else:
        a = jnp.ones_like(rgb[..., 0])
    return jnp.concatenate([rgb, a[..., None]], axis=-1)


def attach_chart_layout(dev: dict, viewproj: np.ndarray, config) -> None:
    """Host-side chart layout (once per upload): adds the texel->tri maps
    and per-corner chart uvs to the device dict. Shared by the single-chip
    ``FrameRenderer`` and the multi-chip ``ShardedRenderer``."""
    lay = build_layout(
        np.asarray(dev["tri_vidx"]), np.asarray(dev["tri_material"]),
        np.asarray(dev["world_pos"]), viewproj,
        config.width, config.height, config.chart_density,
        config.chart_budget,
        valid=np.arange(len(dev["tri_vidx"])) < int(dev["n_tris"]))
    dev["chart_tri"] = lay.texel_tri
    dev["chart_bary"] = lay.texel_bary
    dev["chart_corner"] = lay.corner_uv
    cb = np.zeros((len(dev["blend_tri_vidx"]), 3, 2), np.float32)
    no, nbl = int(dev["n_opaque"]), int(dev["n_blend"])
    cb[:nbl] = lay.corner_uv[no:no + nbl]
    dev["chart_corner_blend"] = cb


def _make_bake_fn(config, slots_used, nl: int, pre_any: bool,
                  device_alpha_check: bool = False):
    """The upload-time bake as ONE jittable function (geometry /
    material / albedo / alpha-pack in a single program — each compile RPC
    through a remote-device tunnel costs ~15-20 s of fixed latency).
    Factored out of ``setup_scene_tss`` so ``bake_output_specs`` can
    eval_shape it for the frame AOT prewarm without running anything."""

    def _bake_all(sc):
        geo = bake_geometry(sc)
        cm, nrm, mraw = bake_material(sc, geo, slots_used=slots_used,
                                      max_aniso=config.aniso(),
                                      ibl_diffuse=config.ibl_diffuse)
        # chart arrays are stored PLANAR ([C,Ah,Aw]) — the per-frame
        # light pass then runs full-lane 2D plane math (channel-minor
        # [...,C] arrays pack C of 128 vreg lanes; measured ~4x on the
        # spec pass)
        baked = {"chart_pos": jnp.moveaxis(geo["pos"], -1, 0),
                 "chart_normal": jnp.moveaxis(nrm, -1, 0),
                 "chart_mat": jnp.moveaxis(cm, -1, 0),
                 "chart_vis": jnp.ones((nl,) + cm.shape[:2], jnp.float32)}
        extras = {}
        if pre_any:
            # pre-shaded modes: bake the base-color tap per texel too,
            # and keep the static product albedo * diffuse-light as a
            # RAW f32 atlas (re-packed with the per-frame specular)
            alb, ta = bake_albedo(sc, geo, slots_used=slots_used,
                                  max_aniso=config.aniso(),
                                  tap=mraw.get("base_tex_raw"),
                                  tap_valid=mraw.get("base_valid"))
            baked["chart_albedo"] = jnp.moveaxis(alb, -1, 0)   # planar
            baked["chart_a"] = pack_alpha_blocks(ta)
            if device_alpha_check:
                # fallback device check, reduced to one scalar read: if
                # no base texture modulates alpha, per-texel alpha == the
                # material base-color factor — the peel screen pass then
                # reads it from the small material table (MXU one-hot)
                # instead of a per-pixel alpha-block gather. Callers that
                # can, pass the HOST-computed ``host_alpha_is_factor``
                # instead (round-5: a full-atlas d2h read for this check
                # cost ~200 s of warm start; even the scalar read forces
                # the bake before the frame AOT prewarm can key off it).
                fa = sc["mat_all"][geo["mat_id"], 3].astype(jnp.float32)
                live = geo["live"].astype(jnp.float32)
                extras = {"alpha_dev": jnp.abs(ta - fa * live).max()}
        return baked, extras
    return _bake_all


def _make_ld_fn(config, pre_any: bool):
    """Static light tables, refreshed on shadow-dirty / exposure change:
    the factored screen pass reads chart_ld (rgb9e5 neighborhood PLANES,
    merged per frame with the specular planes into one row table);
    pre-shaded passes read chart_base (raw planar f32, re-packed with the
    per-frame specular). Mixed mode (tss_preshaded_blend) needs both."""

    def _ld_all(sc, e, full=config.tss_preshaded, pre_any=pre_any):
        static = chart_light_static(sc, sc["chart_pos"], sc["chart_normal"],
                                    sc["chart_mat"], sc["chart_vis"], e)
        out = {}
        if not full:
            out["chart_ld"] = pack_rgbe_planes(static)     # [4,Ah,Aw] u32
        if pre_any:
            out["chart_base"] = sc["chart_albedo"] * static
        return out

    return _ld_all


def bake_output_specs(scene_specs: dict, config, slots_used) -> dict:
    """Shape specs of every scene key the TSS setup adds (bake outputs +
    the ld tables), via eval_shape — nothing executes. Lets FrameRenderer
    AOT-compile the frame program CONCURRENTLY with the bake compile
    (round-5 cold-start fix: the two compiles used to serialize)."""
    import jax

    nl = int(scene_specs["light_type"].shape[0])
    pre_any = config.tss_preshaded or config.tss_preshaded_blend
    bake = _make_bake_fn(config, slots_used, nl, pre_any)
    up_spec, _ = jax.eval_shape(bake, scene_specs)
    merged = dict(scene_specs)
    merged.update(up_spec)
    ld_spec = jax.eval_shape(_make_ld_fn(config, pre_any), merged, 1.0)
    out = dict(up_spec)
    out.update(ld_spec)
    return {k: jax.ShapeDtypeStruct(v.shape, v.dtype)
            for k, v in out.items()}


def host_alpha_is_factor(dev: dict, textures) -> bool:
    """Host-side form of the pre-shaded alpha check: True iff no base
    texture modulates alpha (every used base texture's alpha channel is
    constant full), so the baked per-texel alpha equals the material
    base-color-factor alpha exactly (bilinear/mip filtering of a
    constant-255 channel is exact). Conservative: any alpha-varying base
    texture on a material referenced by geometry returns False.

    Computed from the HOST upload dict + the TextureCache's pending
    images BEFORE anything executes on device — the device-side check
    needed the bake's outputs, which serialized the frame/shadow AOT
    prewarm behind the bake compile (round-5 cold-start fix)."""
    base = np.asarray(dev.get("mat_tex_base", np.empty(0, np.int32)))
    used = np.zeros(base.shape[0], bool)
    for key in ("tri_material", "blend_tri_material", "mask_tri_material"):
        if key in dev and len(np.asarray(dev[key])):
            m = np.asarray(dev[key])
            used[np.clip(m, 0, base.shape[0] - 1)] = True
    pend = getattr(textures, "_textures", None)
    handles = np.unique(base[used & (base >= 0)] if used.any()
                        else base[base >= 0])
    for h in handles:
        if pend is None or h < 0 or h >= len(pend):
            # can't inspect the texture -> conservative False (the
            # alpha-block gather path is always correct, just slower)
            return False
        img = pend[int(h)].image
        full = 65535 if img.dtype == np.uint16 else 255
        if img.shape[-1] >= 4 and (img[..., 3] != full).any():
            return False
    return True


def setup_scene_tss(scene_dev: dict, config, slots_used, exposure: float,
                    alpha_is_factor: bool | None = None):
    """Device bakes for texture-space shading (once per upload): per-texel
    geometry, the full material remap, optional pre-shaded albedo, and the
    static light tables. Returns ``(updates, ld_fn, alpha_is_factor)``:

    - ``updates``: dict of new scene keys (chart_pos/normal/mat/vis,
      chart_albedo/chart_a when pre-shading, plus the initial
      ``ld_fn`` tables);
    - ``ld_fn(scene, exposure) -> dict``: the jitted static-table refresh
      (call on shadow-dirty / exposure change and ``update`` the scene);
    - ``alpha_is_factor``: bake-time check that no base texture modulates
      alpha, so pre-shaded peels can read it from the material table.

    Shared by ``FrameRenderer`` and ``ShardedRenderer`` so multi-chip has
    the identical chart pipeline by construction."""
    import jax

    nl = int(scene_dev["light_type"].shape[0])
    pre_any = config.tss_preshaded or config.tss_preshaded_blend
    _bake_all = _make_bake_fn(config, slots_used, nl, pre_any,
                              device_alpha_check=alpha_is_factor is None)

    up, extras = jax.jit(_bake_all)(scene_dev)
    up = dict(up)
    if not pre_any:
        alpha_is_factor = False
    elif alpha_is_factor is None:
        alpha_is_factor = bool(
            float(np.asarray(extras["alpha_dev"])) < 0.5 / 255.0)

    ld_fn = jax.jit(_make_ld_fn(config, pre_any))
    sc2 = dict(scene_dev)
    sc2.update(up)
    up.update(ld_fn(sc2, exposure))
    return up, ld_fn, alpha_is_factor


def tss_attribute_planes(setup, vo=None, tri_vidx=None, corner_uv=None,
                         uv_corners=None) -> jnp.ndarray:
    """TSS variant of ``raster.pallas_raster.attribute_planes``: the
    kernel carries only 4 attributes (chart_u, chart_v, uv_u, uv_v) — the
    screen pass needs nothing else, and a 4-attr pair fits a 32-column
    block, so FOUR pairs share each 128-lane row (4x less raster DMA than
    the full 8-attr layout; see pallas_raster module header).

    ``uv_corners``: the STATIC [T,3,2] per-corner uv slice of the
    ``corner_attr`` table (zero per-frame gathers); else gathered from
    ``vo``/``tri_vidx``."""
    if uv_corners is None:
        uv_corners = vo.uv[tri_vidx]
    t = uv_corners.shape[0]
    corners = jnp.concatenate([
        jnp.asarray(corner_uv, jnp.float32),
        uv_corners,
    ], axis=-1)                                   # [T,3,4]
    e = setup.coef[:, 0:3, :]
    planes = (corners[:, :, :, None] * e[:, :, None, :]).sum(1)
    return planes.reshape(t, 12)


def resolve_tss(scene, coef, g, height, width, y0=0, full_height=None,
                tri_table: str = "tri_packed",
                corner_table: str = "chart_corner"):
    """Non-pallas resolve for TSS mode: chart uv + material uv + mat id
    from bary (mirrors ``graph.frame.resolve_attributes``)."""
    from ..raster import reference_raster as rref

    tri_id = g.tri_id
    if g.bary is not None:
        b01 = g.bary
        bary = jnp.concatenate(
            [b01, 1.0 - b01[..., :1] - b01[..., 1:2]], axis=-1)
    else:
        bary, _ = rref.barycentrics_at(coef, tri_id, height, width, y0,
                                       full_height)
    # barycentrics_at returns (b0,b1,b2)? keep the same convention as
    # resolve_attributes: corners weighted by bary[..., c]
    safe = jnp.maximum(tri_id, 0)
    trow = scene[tri_table][safe]
    vidx = trow[..., 0:3]
    uv = (scene["uvs"][vidx] * bary[..., None]).sum(-2)
    cuv = jnp.asarray(scene[corner_table], jnp.float32)
    chart = (cuv[safe] * bary[..., None]).sum(-2)
    return {"chart_uv": chart, "uv": uv, "mat_id": trow[..., 3],
            "covered": tri_id >= 0}


def tss_shade(scene, chart_uv, uv, mat_id, light8,
              ah: int, aw: int,
              slots_used=(True, True, True, True), max_aniso: int = 1,
              dither: bool = False, covered=None):
    """The TSS screen pass: one albedo tap (full-res texture detail) +
    ONE 32-byte merged light-table gather (static diffuse ld + per-frame
    specular ls). rgb = albedo * ld + ls; alpha = texture alpha x the
    material's base-color factor alpha (read straight from the small
    material table — exact, not chart-interpolated)."""
    from . import pbr, sampling
    from .srgb import srgb_to_linear

    light_d, light_s = sample_light8(light8, chart_uv, ah, aw)
    uv = _uv_minor(uv)              # the sampler path is channel-minor
    # planar column lookup — see tss_shade_halfres
    pl7 = sampling.table_lookup_planar(scene["mat_all"], mat_id,
                                       (3, 16, 17, 18, 19, 20, 21))
    factor_a = pl7[0]
    if slots_used[0]:
        tb = _slot_planes(pl7[1:])
        duv_dx, duv_dy = sampling.quad_derivs(uv, covered)
        tap = pbr._sample_slot(scene, tb, uv, duv_dx, duv_dy,
                               jnp.ones(4), max_aniso, dither)
        alb = jnp.where(tb["valid"][..., None],
                        srgb_to_linear(tap[..., :3]), 1.0)
        ta = jnp.where(tb["valid"], tap[..., 3], 1.0)
    else:
        alb = jnp.ones_like(light_d)
        ta = jnp.ones_like(light_d[..., 0])
    rgb = alb * light_d + light_s
    a = ta * factor_a
    return jnp.concatenate([rgb, a[..., None]], axis=-1)
