"""sRGB <-> linear conversions, exactly the reference's 'accurate' pair
(``pbr.glsl:20-34``, from the Frostbite course notes). Elementwise jnp —
XLA fuses these into adjacent ops for free."""

from __future__ import annotations

import jax.numpy as jnp


def srgb_to_linear(c: jnp.ndarray) -> jnp.ndarray:
    lo = c / 12.92
    hi = jnp.power((c + 0.055) / 1.055, 2.4)
    return jnp.where(c <= 0.04045, lo, hi)


def linear_to_srgb(c: jnp.ndarray) -> jnp.ndarray:
    lo = c * 12.92
    hi = jnp.power(jnp.abs(c), 1.0 / 2.4) * 1.055 - 0.055
    return jnp.where(c <= 0.0031308, lo, hi)


def srgb_to_linear_rgba(c: jnp.ndarray) -> jnp.ndarray:
    """vec4 variant: alpha passes through (``pbr.glsl:56-65``)."""
    return jnp.concatenate([srgb_to_linear(c[..., :3]), c[..., 3:4]], axis=-1)


def encode_srgb8(linear_rgb: jnp.ndarray, alpha: jnp.ndarray | None = None) -> jnp.ndarray:
    """Linear float -> sRGB uint8, the swapchain's R8G8B8A8-sRGB encode
    (``Swapchain.cpp:10-29``). Returns [...,4] uint8."""
    srgb = jnp.clip(linear_to_srgb(jnp.clip(linear_rgb, 0.0, 1.0)), 0.0, 1.0)
    a = jnp.ones_like(srgb[..., :1]) if alpha is None else jnp.clip(alpha[..., None], 0, 1)
    rgba = jnp.concatenate([srgb, a], axis=-1)
    return jnp.round(rgba * 255.0).astype(jnp.uint8)
