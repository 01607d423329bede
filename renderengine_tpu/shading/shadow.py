"""Directional shadow lookup with 3x3 PCF.

Port of ``Assets/Shaders/shadow.glsl:24-56``: fragment -> light clip space,
slope-scaled bias max(0.05*(1-N.L), 0.005), 3x3 PCF over texel offsets,
/9. The shadow sampler is nearest / clamp-to-edge with an opaque-white
border (``ShadowSystem.cpp:18-35``) — out-of-map lookups read depth 1.0 and
therefore never shadow.

TPU shape (two-stage, EXACT):

1. The depth map is packed once per (cached) shadow render into 4x4-texel
   u16 windows anchored on a stride-2 grid, so the 9 PCF taps cost ONE
   32-byte gather — plus a COARSE table: per 8x8-texel cell, the min/max
   quantized depth over the 10x10 apron that bounds every 3x3 footprint
   centered in the cell (one u32 row: min | max<<16).
2. The per-pixel lookup first gathers only the 4-byte coarse row (a
   ~2 MB table at 4096^2 vs 134 MB of windows). Pixels whose threshold
   clears the cell's min/max are EXACTLY fully-lit (no tap passes) or
   fully-shadowed (every in-range tap passes: factor = n_in_range/9,
   computed arithmetically). Only *penumbra* pixels — threshold inside
   [min, max] — need the 32-byte window gather; they are compacted by
   screen tile (static budget, overflow counted like every other budget)
   and scattered back. Typical scenes have a few percent penumbra, so the
   dominant PCF cost drops with it. Results are bit-exact with the dense
   window path (asserted in tests/test_shadow_sparse.py).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class ShadowPack(NamedTuple):
    """Packed shadow-map tables (one per shadow render, cached).

    blocks: [NS, A, A, 8] u32 — stride-2-anchored 4x4 u16 windows
            (A = E//2 + 1); the one-gather 3x3 PCF footprint.
    coarse: [NS, C, C] u32 — per 8x8-texel cell (C = ceil(E/8)),
            min | max << 16 of the quantized depth over the cell's 10x10
            apron (bounds every 3x3 footprint centered in the cell).
    """
    blocks: jnp.ndarray
    coarse: jnp.ndarray


_CELL = 8   # coarse cell edge in texels


def pack_shadow_blocks(shadow_maps: jnp.ndarray) -> ShadowPack:
    """[NS,E,E] depth -> ShadowPack. Depth is quantized to 16-bit unorm —
    the quantization step (1.5e-5) is far below the minimum shadow bias
    (0.005), so compare results are unchanged in practice. White (1.0)
    border baked in.

    A pixel with clipped center texel (iy', ix') (iy' = clip(iy,-1,E)) uses
    anchor a2 = (iy'+1) >> 1; its 3x3 taps iy'-1..iy'+1 fall inside the 4x4
    window at local rows p..p+2 where p = iy' - 2*a2 + 2 in {1, 2}.
    """
    e = shadow_maps.shape[1]
    q = jnp.round(jnp.clip(shadow_maps, 0.0, 1.0) * 65535.0).astype(jnp.uint16)
    # anchors a2 in [0, e//2]: window rows span [-2, e+2)
    p = jnp.pad(q, ((0, 0), (2, 2), (2, 2)), constant_values=65535)
    na = e // 2 + 1  # anchor count per axis (a2 in 0..e//2)
    rows = []
    for dy in range(4):
        for dx in range(4):
            # window row dy at anchor a2 = padded row 2*a2 + dy
            rows.append(p[:, dy : dy + 2 * na - 1 : 2, dx : dx + 2 * na - 1 : 2])
    win = jnp.stack(rows, axis=-1)
    # ship as packed u32 rows (8 per window): ~30% cheaper to gather than
    # 16 u16 elements; the lookup bitcasts back in-register
    blocks = jax.lax.bitcast_convert_type(
        win.reshape(win.shape[:-1] + (8, 2)), jnp.uint32)

    # coarse min/max per 8x8 cell over its 10x10 apron (texel rows
    # [8c-1, 8c+8]). p is padded by 2 with 65535; dropping its first
    # row/col aligns apron row 8c-1 with pool-window start 8c (stride 8).
    c = -(-e // _CELL)
    pi = p[:, 1:, 1:].astype(jnp.int32)
    need = _CELL * (c - 1) + _CELL + 2        # rows needed for c windows
    if pi.shape[1] < need:
        pi = jnp.pad(pi, ((0, 0), (0, need - pi.shape[1]),
                          (0, need - pi.shape[2])), constant_values=65535)
    mn = -jax.lax.reduce_window(
        -pi, -(2**31 - 1), jax.lax.max,
        (1, _CELL + 2, _CELL + 2), (1, _CELL, _CELL), "valid")
    mx = jax.lax.reduce_window(
        pi, 0, jax.lax.max,
        (1, _CELL + 2, _CELL + 2), (1, _CELL, _CELL), "valid")
    mn = mn[:, :c, :c]
    mx = mx[:, :c, :c]
    coarse = (mn | (mx << 16)).astype(jnp.uint32)
    return ShadowPack(blocks, coarse)


def _window_pcf(blk32, threshold, u, v, py, px_, e):
    """9-tap PCF sum from gathered 4x4 u32[8] windows. blk32 [...,8] u32;
    returns the /9 factor (border-range tests included).

    PLANAR form: the window unpacks to 16 per-tap [H, W] comparison
    planes via shifts on the gathered words (one [N,8]->[8,N] transpose)
    instead of a channel-minor [..., 16] -> [..., 4, 4] array — minor-dim
    slices run 4 of 128 vector lanes and multiplied the shadow program's
    generated code (round-5 compile-size fix; same select/add order, so
    results are bit-equal)."""
    words = jnp.moveaxis(blk32, -1, 0)                    # [8, ...]
    scale = jnp.float32(1.0 / 65535.0)

    def cmp(r, c):
        t = 4 * r + c       # u16 index: word t//2, half t&1
        d16 = ((words[t >> 1] >> (16 * (t & 1))) & 0xFFFF) \
            .astype(jnp.float32) * scale
        return (threshold > d16).astype(jnp.float32)

    cmpp = [[cmp(r, c) for c in range(4)] for r in range(4)]

    inv_e = 1.0 / e
    ue = u * inv_e
    ve = v * inv_e
    pyb = py.astype(bool)
    pxb = px_.astype(bool)
    shadow = jnp.zeros_like(threshold)
    for dy in (-1, 0, 1):
        tv_in = (ve + dy * inv_e >= 0.0) & (ve + dy * inv_e < 1.0)
        for dx in (-1, 0, 1):
            d = jnp.where(
                pyb,
                jnp.where(pxb, cmpp[2 + dy][2 + dx], cmpp[2 + dy][1 + dx]),
                jnp.where(pxb, cmpp[1 + dy][2 + dx], cmpp[1 + dy][1 + dx]))
            tu_in = (ue + dx * inv_e >= 0.0) & (ue + dx * inv_e < 1.0)
            shadow = shadow + jnp.where(tu_in & tv_in, d, 0.0)
    return shadow / 9.0


def _n_in_range(u, v, e):
    """How many of the 9 taps fall inside the map — pure arithmetic
    (the white border contributes 0 to the PCF sum)."""
    inv_e = 1.0 / e
    ue = u * inv_e
    ve = v * inv_e
    nu = jnp.zeros_like(u)
    nv = jnp.zeros_like(v)
    for d in (-1, 0, 1):
        nu = nu + ((ue + d * inv_e >= 0.0) & (ue + d * inv_e < 1.0))
        nv = nv + ((ve + d * inv_e >= 0.0) & (ve + d * inv_e < 1.0))
    return nu * nv


def compute_shadow_directional(shadow_pack, shadow_transforms, shadow_index,
                               light_pos, frag_pos, normal,
                               penumbra_tiles: int = 0,
                               tile_h: int = 8, tile_w: int = 128,
                               stats_out: list | None = None,
                               cube: bool = False,
                               penumbra_full_h: int | None = None):
    """shadow_pack: ShadowPack (see ``pack_shadow_blocks``);
    shadow_transforms [NS,4,4] (= lightProj @ lightView, the
    MaterialShadowData.transform, ``shadow.glsl:31``); shadow_index scalar;
    frag_pos/normal [H,W,3]. Returns shadow factor [H,W] (1 = shadowed).

    ``cube``: point-light cube lookup (BEYOND the reference's
    directional-only path): shadow_index is the base of six consecutive
    face maps (+X -X +Y -Y +Z -Z); each fragment selects the face of its
    dominant light-to-fragment axis. The face transform is applied by a
    6-way select (dense VPU FMAs) rather than a per-pixel [4,4] matrix
    gather; the window/coarse gathers already take per-pixel indices.

    ``penumbra_tiles`` > 0 enables the two-stage path: the 32-byte window
    gather runs only on the K most-penumbra-populated (tile_h, tile_w)
    screen tiles; other pixels resolve from the 4-byte coarse row exactly.
    Penumbra tiles beyond K fall back to the fully-shadowed estimate and
    are COUNTED (appended to ``stats_out`` as (n_penumbra_tiles, overflow))
    so the renderer can react. 0 = dense single-stage (every pixel pays
    the window gather).
    """
    blocks = shadow_pack.blocks
    ns, na, _, _ = blocks.shape
    e = (na - 1) * 2
    if cube:
        d = frag_pos - light_pos
        dx, dy_, dz = d[..., 0], d[..., 1], d[..., 2]
        ax, ay, az = jnp.abs(dx), jnp.abs(dy_), jnp.abs(dz)
        face = jnp.where(
            (ax >= ay) & (ax >= az),
            jnp.where(dx >= 0, 0, 1),
            jnp.where(ay >= az,
                      jnp.where(dy_ >= 0, 2, 3),
                      jnp.where(dz >= 0, 4, 5))).astype(jnp.int32)
        base = jnp.clip(shadow_index, 0, jnp.maximum(ns - 6, 0))
        m6 = jax.lax.dynamic_slice_in_dim(shadow_transforms, base, 6, 0)
        idx = base + face                              # [H,W]
        flp = jnp.zeros(frag_pos.shape[:-1] + (4,), frag_pos.dtype)
        for f in range(6):
            mf = m6[f]
            flp_f = (mf[None, None, :, :3]
                     * frag_pos[:, :, None, :]).sum(-1) \
                + mf[None, None, :, 3]
            flp = jnp.where((face == f)[..., None], flp_f, flp)
    else:
        idx = jnp.clip(shadow_index, 0, ns - 1)
        m = shadow_transforms[idx]  # [4,4]
        flp = (m[None, None, :, :3] * frag_pos[:, :, None, :]).sum(-1) \
            + m[None, None, :, 3]
    w = flp[..., 3]
    safe_w = jnp.where(w == 0, 1.0, w)
    current = flp[..., 2] / safe_w

    # reference quirk kept: lightDir from light *position* even for
    # directional lights (shadow.glsl:33)
    ld = light_pos - frag_pos
    ld = ld / jnp.maximum(jnp.linalg.norm(ld, axis=-1, keepdims=True), 1e-20)
    bias = jnp.maximum(0.05 * (1.0 - (normal * ld).sum(-1)), 0.005)
    threshold = current - bias

    map_xy = 0.5 * (flp[..., :2] / safe_w[..., None]) + 0.5
    u = map_xy[..., 0] * e
    v = map_xy[..., 1] * e
    ix = jnp.floor(u).astype(jnp.int32)
    iy = jnp.floor(v).astype(jnp.int32)

    cy = jnp.clip(iy, -1, e)             # clipped center texel
    cx = jnp.clip(ix, -1, e)
    a2y = (cy + 1) >> 1
    a2x = (cx + 1) >> 1
    py = cy - 2 * a2y + 1                # window-local row of tap dy=-1: {0,1}
    px_ = cx - 2 * a2x + 1

    # perspective (spot) maps: fragments behind the light plane (w <= 0)
    # project nonsensically — they are never shadowed. Ortho maps have
    # w == 1, so the guard is free for directional lights.
    invalid = (current > 1.0) | (w <= 0.0)

    def dense():
        blk32 = blocks.reshape(-1, 8)[(idx * na + a2y) * na + a2x]
        return _window_pcf(blk32, threshold, u, v, py, px_, e)

    if not penumbra_tiles:
        shadow = dense()
        return jnp.where(invalid, 0.0, shadow)

    # --- two-stage path ---------------------------------------------------
    # Compaction is per-ROW [1, tile_w] segments (sampling.select_row_
    # segments): selection depends only on each pixel row's own data, so
    # an image-row sharding computes bit-identical results for any row
    # split (the repo's shard-invariant-compaction rule; 2-D tiles break
    # it when a shard boundary cuts a tile). ``penumbra_tiles`` keeps its
    # (tile_h x tile_w)-tile units for the budget controller; it converts
    # to a per-row segment budget here.
    from .sampling import (gather_row_segments, row_segment_counts,
                           row_segments, scatter_row_segments,
                           select_row_segments)

    c = shadow_pack.coarse.shape[1]
    cell_y = jnp.clip(iy, 0, e - 1) >> 3
    cell_x = jnp.clip(ix, 0, e - 1) >> 3
    crow = shadow_pack.coarse.reshape(-1)[(idx * c + cell_y) * c + cell_x]
    mn = (crow & jnp.uint32(0xFFFF)).astype(jnp.float32) * (1.0 / 65535.0)
    mx = (crow >> 16).astype(jnp.float32) * (1.0 / 65535.0)

    n_in = _n_in_range(u, v, e)
    lit = (threshold <= mn) | (n_in == 0) | invalid
    full_sh = threshold > mx             # every in-range tap passes
    easy_val = jnp.where(lit, 0.0, n_in * (1.0 / 9.0))
    penumbra = ~(lit | full_sh)

    h, wd = threshold.shape
    ntx, _ = row_segments(h, wd, tile_w)
    # per-row budget k: total tile budget spread evenly over pixel rows.
    # The budget is stated in FULL-FRAME tiles, so the conversion divides
    # by the full framebuffer height, not the slice height — an image-row
    # shard would otherwise get a Dx larger per-row k than single-chip
    # and select more segments (shard-invariance rule, sampling.py).
    full_h = penumbra_full_h or h
    k_row = max(1, min(-(-penumbra_tiles * tile_h // full_h), ntx))
    frac = min(1.0, k_row / ntx)
    sel, k = select_row_segments(penumbra, tile_w, frac)

    # observed need in the controller's tile units: the max per-row
    # segment need, scaled back (budget >= n_pen  =>  k_row covers the
    # busiest row)
    need_row = (row_segment_counts(penumbra, tile_w) > 0).sum(-1)    # [H]
    n_pen = -(-(need_row.max() * full_h) // tile_h)
    overflow = jnp.maximum(need_row - k, 0).sum()

    us = gather_row_segments(u, sel, tile_w)
    vs = gather_row_segments(v, sel, tile_w)
    ts = gather_row_segments(threshold, sel, tile_w)
    idxs = gather_row_segments(idx, sel, tile_w) if cube else idx
    ixs = jnp.floor(us).astype(jnp.int32)
    iys = jnp.floor(vs).astype(jnp.int32)
    cys = jnp.clip(iys, -1, e)
    cxs = jnp.clip(ixs, -1, e)
    a2ys = (cys + 1) >> 1
    a2xs = (cxs + 1) >> 1
    blk32 = blocks.reshape(-1, 8)[(idxs * na + a2ys) * na + a2xs]
    full_sub = _window_pcf(blk32, ts, us, vs,
                           cys - 2 * a2ys + 1, cxs - 2 * a2xs + 1, e)

    full_map, have_map = scatter_row_segments(full_sub, sel, h, wd, tile_w)

    if stats_out is not None:
        stats_out.append((n_pen, overflow))

    # penumbra pixels beyond the budget fall back to the fully-shadowed
    # estimate (counted above); easy pixels are exact either way
    shadow = jnp.where(penumbra & have_map, full_map, easy_val)
    shadow = jnp.where(penumbra & ~have_map, n_in * (1.0 / 9.0), shadow)
    return jnp.where(current > 1.0, 0.0, shadow)
