"""Directional shadow lookup with 3x3 PCF.

Port of ``Assets/Shaders/shadow.glsl:24-56``: fragment -> light clip space,
slope-scaled bias max(0.05*(1-N.L), 0.005), 3x3 PCF over texel offsets,
/9. The shadow sampler is nearest / clamp-to-edge with an opaque-white
border (``ShadowSystem.cpp:18-35``) — out-of-map lookups read depth 1.0 and
therefore never shadow.

TPU shape: the depth map is packed once per (cached) shadow render into
2x2-texel blocks over a white-padded map, so the 9 PCF taps cost 4 gathers
(gathers are priced per index, not per byte).
"""

from __future__ import annotations

import jax.numpy as jnp


def pack_shadow_blocks(shadow_maps: jnp.ndarray) -> jnp.ndarray:
    """[NS,E,E] depth -> [NS,E+2,E+2,16] uint16 4x4 blocks: the whole 3x3
    PCF footprint (anchored one texel up-left of the nearest texel) in ONE
    gather. Depth is quantized to 16-bit unorm — the quantization step
    (1.5e-5) is far below the minimum shadow bias (0.005), so compare
    results are unchanged in practice. White (1.0) border baked in.

    Block at anchor index a (a = clip(center-texel, -1, E) + 1) holds
    original rows/cols [a-2, a+2) = the 4x4 window starting one texel
    before the anchor.
    """
    q = jnp.round(jnp.clip(shadow_maps, 0.0, 1.0) * 65535.0).astype(jnp.uint16)
    p = jnp.pad(q, ((0, 0), (2, 3), (2, 3)), constant_values=65535)
    e = shadow_maps.shape[1]
    rows = []
    for dy in range(4):
        for dx in range(4):
            rows.append(p[:, dy : dy + e + 2, dx : dx + e + 2])
    return jnp.stack(rows, axis=-1)


def compute_shadow_directional(shadow_blocks, shadow_transforms, shadow_index,
                               light_pos, frag_pos, normal):
    """shadow_blocks [NS,E+2,E+2,4] from ``pack_shadow_blocks``;
    shadow_transforms [NS,4,4] (= lightProj @ lightView, the
    MaterialShadowData.transform, ``shadow.glsl:31``); shadow_index scalar;
    frag_pos/normal [H,W,3]. Returns shadow factor [H,W] (1 = shadowed)."""
    ns, ep2, _, _ = shadow_blocks.shape
    e = ep2 - 2
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

    # ONE 32-byte gather fetches the whole 4x4 window
    ay = jnp.clip(iy, -1, e) + 1
    ax = jnp.clip(ix, -1, e) + 1
    blk = shadow_blocks.reshape(-1, 16)[(idx * ep2 + ay) * ep2 + ax]  # [H,W,16]
    blk = blk.astype(jnp.float32) * (1.0 / 65535.0)

    threshold = current - bias
    shadow = jnp.zeros_like(current)
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            d = blk[..., (dy + 1) * 4 + (dx + 1)]
            # texture() tap with white border outside [0,1)
            tu = (u + dx) / e
            tv = (v + dy) / e
            inb = (tu >= 0.0) & (tu < 1.0) & (tv >= 0.0) & (tv < 1.0)
            d = jnp.where(inb, d, 1.0)
            shadow = shadow + jnp.where(threshold > d, 1.0, 0.0)
    shadow = shadow / 9.0

    # no shadow outside the light's far plane (shadow.glsl:37-39)
    return jnp.where(current > 1.0, 0.0, shadow)
