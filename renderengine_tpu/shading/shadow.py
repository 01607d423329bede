"""Directional shadow lookup with 3x3 PCF.

Port of ``Assets/Shaders/shadow.glsl:24-56``: fragment -> light clip space,
slope-scaled bias max(0.05*(1-N.L), 0.005), 3x3 PCF over texel offsets,
/9. The shadow sampler is nearest / clamp-to-edge with an opaque-white
border (``ShadowSystem.cpp:18-35``) — out-of-map lookups read depth 1.0 and
therefore never shadow.

TPU shape: the depth map is packed once per (cached) shadow render into
4x4-texel windows anchored on a stride-2 grid, so the 9 PCF taps cost ONE
32-byte gather. Stride-2 anchoring quarters the window table (gather cost
grows with table size on this hardware — measured 17ms vs 36ms per 1080p
gather pass at 34MB vs 134MB); the sub-anchor parity picks which 3x3 of
the 4x4 window the taps read, via cheap VPU selects.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def pack_shadow_blocks(shadow_maps: jnp.ndarray) -> jnp.ndarray:
    """[NS,E,E] depth -> [NS,E//2+1,E//2+1,8] u32-packed 4x4 u16 windows on a
    stride-2 anchor grid: window (ay2,ax2) holds original rows/cols
    [2*a2-2, 2*a2+2). Depth is quantized to 16-bit unorm — the quantization
    step (1.5e-5) is far below the minimum shadow bias (0.005), so compare
    results are unchanged in practice. White (1.0) border baked in.

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
    return jax.lax.bitcast_convert_type(
        win.reshape(win.shape[:-1] + (8, 2)), jnp.uint32)


def compute_shadow_directional(shadow_blocks, shadow_transforms, shadow_index,
                               light_pos, frag_pos, normal):
    """shadow_blocks [NS,A,A,8] u32 from ``pack_shadow_blocks`` (A = E//2+1);
    shadow_transforms [NS,4,4] (= lightProj @ lightView, the
    MaterialShadowData.transform, ``shadow.glsl:31``); shadow_index scalar;
    frag_pos/normal [H,W,3]. Returns shadow factor [H,W] (1 = shadowed)."""
    ns, na, _, _ = shadow_blocks.shape
    e = (na - 1) * 2
    idx = jnp.clip(shadow_index, 0, ns - 1)
    m = shadow_transforms[idx]  # [4,4]

    flp = (m[None, None, :, :3] * frag_pos[:, :, None, :]).sum(-1) + m[None, None, :, 3]
    w = flp[..., 3]
    safe_w = jnp.where(w == 0, 1.0, w)
    current = flp[..., 2] / safe_w

    # reference quirk kept: lightDir from light *position* even for
    # directional lights (shadow.glsl:33)
    ld = light_pos - frag_pos
    ld = ld / jnp.maximum(jnp.linalg.norm(ld, axis=-1, keepdims=True), 1e-20)
    bias = jnp.maximum(0.05 * (1.0 - (normal * ld).sum(-1)), 0.005)

    map_xy = 0.5 * (flp[..., :2] / safe_w[..., None]) + 0.5
    u = map_xy[..., 0] * e
    v = map_xy[..., 1] * e
    ix = jnp.floor(u).astype(jnp.int32)
    iy = jnp.floor(v).astype(jnp.int32)

    # ONE 32-byte gather fetches a 4x4 window covering all 9 taps
    cy = jnp.clip(iy, -1, e)             # clipped center texel
    cx = jnp.clip(ix, -1, e)
    a2y = (cy + 1) >> 1
    a2x = (cx + 1) >> 1
    py = cy - 2 * a2y + 1                # window-local row of tap dy=-1: {0,1}
    px_ = cx - 2 * a2x + 1
    blk32 = shadow_blocks.reshape(-1, 8)[(idx * na + a2y) * na + a2x]
    blk = jax.lax.bitcast_convert_type(blk32, jnp.uint16)
    blk = blk.reshape(blk.shape[:-2] + (16,))             # [H,W,16] u16

    threshold = current - bias
    d16 = blk.astype(jnp.float32) * (1.0 / 65535.0)
    cmp = threshold[..., None] > d16     # [H,W,16] tap passes => shadowed
    cmp = cmp.reshape(cmp.shape[:-1] + (4, 4)).astype(jnp.float32)

    # white border outside [0,1): tap texel t in range iff 0 <= t < e
    inv_e = 1.0 / e
    ue = u * inv_e
    ve = v * inv_e
    pyb = py.astype(bool)
    pxb = px_.astype(bool)
    shadow = jnp.zeros_like(current)
    for dy in (-1, 0, 1):
        rowa = jnp.where(pyb[..., None], cmp[..., 2 + dy, :], cmp[..., 1 + dy, :])
        tv_in = (ve + dy * inv_e >= 0.0) & (ve + dy * inv_e < 1.0)
        for dx in (-1, 0, 1):
            d = jnp.where(pxb, rowa[..., 2 + dx], rowa[..., 1 + dx])
            tu_in = (ue + dx * inv_e >= 0.0) & (ue + dx * inv_e < 1.0)
            shadow = shadow + jnp.where(tu_in & tv_in, d, 0.0)
    shadow = shadow / 9.0

    # no shadow outside the light's far plane (shadow.glsl:37-39)
    return jnp.where(current > 1.0, 0.0, shadow)
