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
    """[NS,E,E] depth -> [NS,E+2,E+2,4] blocks over a 1.0-padded map.

    Block (j,i) = padded texels {(j,i),(j,i+1),(j+1,i),(j+1,i+1)}, where
    padded coords are original + 1 (1 texel of white border on the low
    side, 2 on the high side).
    """
    p = jnp.pad(shadow_maps, ((0, 0), (1, 2), (1, 2)), constant_values=1.0)
    return jnp.stack(
        [p[:, :-1, :-1], p[:, :-1, 1:], p[:, 1:, :-1], p[:, 1:, 1:]], axis=-1
    )


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

    flat = shadow_blocks.reshape(-1, 4)

    def block(by, bx):
        cy = jnp.clip(by, 0, e + 1)
        cx = jnp.clip(bx, 0, e + 1)
        return flat[(idx * ep2 + cy) * ep2 + cx]   # [H,W,4]

    b00 = block(iy, ix)
    b01 = block(iy, ix + 2)
    b10 = block(iy + 2, ix)
    b11 = block(iy + 2, ix + 2)

    threshold = (current - bias)[..., None]  # broadcast over block texels

    shadow = jnp.zeros_like(current)
    for dy in (-1, 0, 1):
        r = 0 if dy < 1 else 1
        sub_y = (dy + 1) % 2
        for dx in (-1, 0, 1):
            c = 0 if dx < 1 else 1
            sub_x = (dx + 1) % 2
            b = (b00, b01, b10, b11)[r * 2 + c]
            d = b[..., sub_y * 2 + sub_x]
            # texture() coordinate for this tap: nearest-texel semantics
            # with white border outside [0,1)
            tu = (u + dx) / e
            tv = (v + dy) / e
            inb = (tu >= 0.0) & (tu < 1.0) & (tv >= 0.0) & (tv < 1.0)
            d = jnp.where(inb, d, 1.0)
            shadow = shadow + jnp.where(current - bias > d, 1.0, 0.0)
    shadow = shadow / 9.0
    del threshold

    # no shadow outside the light's far plane (shadow.glsl:37-39)
    return jnp.where(current > 1.0, 0.0, shadow)
