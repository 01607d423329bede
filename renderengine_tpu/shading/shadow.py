"""Directional shadow lookup with 3x3 PCF.

Port of ``Assets/Shaders/shadow.glsl:24-56``: fragment -> light clip space,
slope-scaled bias max(0.05*(1-N.L), 0.005), 3x3 PCF over texel offsets,
/9. The shadow sampler is nearest / clamp-to-edge with an opaque-white
border (``ShadowSystem.cpp:18-35``) — out-of-map lookups read depth 1.0 and
therefore never shadow.
"""

from __future__ import annotations

import jax.numpy as jnp


def compute_shadow_directional(shadow_maps, shadow_transforms, shadow_index,
                               light_pos, frag_pos, normal):
    """shadow_maps [NS,E,E] f32 depth; shadow_transforms [NS,4,4]
    (= lightProj @ lightView, the MaterialShadowData.transform,
    ``shadow.glsl:31``); shadow_index scalar int; frag_pos/normal [H,W,3].

    Returns shadow factor [H,W]: 1 = fully shadowed.
    """
    ns, e, _ = shadow_maps.shape
    idx = jnp.clip(shadow_index, 0, ns - 1)
    m = shadow_transforms[idx]  # [4,4]

    # fragLightPos = transform * vec4(fragPos, 1)
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
    texel = 1.0 / e

    flat = shadow_maps.reshape(ns, -1)

    def tap(dx, dy):
        # nearest-filter texture() with clamp-to-edge + white border
        u = map_xy[..., 0] + dx * texel
        v = map_xy[..., 1] + dy * texel
        inb = (u >= 0.0) & (u < 1.0) & (v >= 0.0) & (v < 1.0)
        iu = jnp.clip(jnp.floor(u * e).astype(jnp.int32), 0, e - 1)
        iv = jnp.clip(jnp.floor(v * e).astype(jnp.int32), 0, e - 1)
        d = flat[idx, iv * e + iu]
        d = jnp.where(inb, d, 1.0)  # white border
        return jnp.where(current - bias > d, 1.0, 0.0)

    shadow = jnp.zeros_like(current)
    for dx in (-1, 0, 1):
        for dy in (-1, 0, 1):
            shadow = shadow + tap(float(dx), float(dy))
    shadow = shadow / 9.0

    # no shadow outside the light's far plane (shadow.glsl:37-39)
    return jnp.where(current > 1.0, 0.0, shadow)
