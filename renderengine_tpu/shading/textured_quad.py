"""Debug overlay quad (shadow-map preview etc).

Port of ``Source/Runtime/Renderer/TexturedQuad.{h,cpp}`` +
``textured_quad.{vert,frag}``: a vertex-less NDC quad at (center, size)
displaying a texture, with a grayscale mode for depth maps (the
``kIsGrayscale`` specialization constant, ``TexturedQuad.cpp:27-38``).
Deferred form: resample the source into the quad's pixel rect and
composite over the frame's linear rgb.
"""

from __future__ import annotations

import jax.numpy as jnp


def draw_textured_quad(rgb: jnp.ndarray, source: jnp.ndarray,
                       center=(-0.6, -0.6), size=(0.35, 0.35),
                       grayscale: bool | None = None) -> jnp.ndarray:
    """rgb [H,W,3] f32; source [h,w] (grayscale depth) or [h,w,3/4].
    center/size in NDC as in the reference DrawParams."""
    h, w = rgb.shape[:2]
    if grayscale is None:
        grayscale = source.ndim == 2
    # quad pixel rect from NDC center/size
    x0 = int(round((center[0] - size[0] + 1) * 0.5 * w))
    x1 = int(round((center[0] + size[0] + 1) * 0.5 * w))
    y0 = int(round((center[1] - size[1] + 1) * 0.5 * h))
    y1 = int(round((center[1] + size[1] + 1) * 0.5 * h))
    x0, x1 = max(0, x0), min(w, x1)
    y0, y1 = max(0, y0), min(h, y1)
    if x1 <= x0 or y1 <= y0:
        return rgb
    qh, qw = y1 - y0, x1 - x0

    sh, sw = source.shape[:2]
    sy = jnp.clip(((jnp.arange(qh) + 0.5) * sh / qh).astype(jnp.int32), 0, sh - 1)
    sx = jnp.clip(((jnp.arange(qw) + 0.5) * sw / qw).astype(jnp.int32), 0, sw - 1)
    patch = source[sy[:, None], sx[None, :]]
    if grayscale:
        if patch.ndim == 3:
            patch = patch[..., 0]
        patch = jnp.stack([patch] * 3, axis=-1)
    else:
        patch = patch[..., :3]
    patch = patch.astype(jnp.float32)
    if source.dtype == jnp.uint8:
        patch = patch / 255.0
    return rgb.at[y0:y1, x0:x1, :].set(patch)
