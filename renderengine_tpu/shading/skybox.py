"""Skybox pass: cubemap sample at far depth for uncovered pixels.

Reference: ``Assets/Shaders/skybox.{vert,frag}`` — the cube draws last with
``pos.xyww`` (depth 1.0) and LessOrEqual depth, i.e. it fills exactly the
pixels nothing else wrote. Deferred equivalent: composite the cubemap where
tri_id < 0. The view ray uses the rotation-only view matrix
(``skybox.vert:35``: ``mat4(mat3(view))``).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from .sampling import sample_cubemap


def skybox_ray_matrix(view: np.ndarray, proj: np.ndarray) -> np.ndarray:
    """Host-side: inverse(proj @ rotation-only-view), for unprojecting NDC
    points to world-space view rays."""
    v = np.asarray(view, np.float64).copy()
    v[:3, 3] = 0.0
    return np.linalg.inv(np.asarray(proj, np.float64) @ v).astype(np.float32)


def render_skybox(cube, inv_vp_rot: jnp.ndarray, height: int, width: int,
                  y0=0, full_height: int | None = None) -> jnp.ndarray:
    """Returns rgba f32 [H,W,4] (storage-space values, caller decodes sRGB
    like any texture — the reference samples an sRGB-format image, decoded
    by hardware; we decode explicitly). ``y0``/``full_height`` render a
    row slice of a taller viewport (image-space sharding)."""
    fh = height if full_height is None else full_height
    ys = (jnp.arange(height, dtype=jnp.float32) + jnp.asarray(y0, jnp.float32)
          + 0.5) / fh * 2.0 - 1.0
    xs = (jnp.arange(width, dtype=jnp.float32) + 0.5) / width * 2.0 - 1.0
    ndc_x = jnp.broadcast_to(xs[None, :], (height, width))
    ndc_y = jnp.broadcast_to(ys[:, None], (height, width))
    ndc = jnp.stack([ndc_x, ndc_y, jnp.ones_like(ndc_x), jnp.ones_like(ndc_x)], axis=-1)
    p = (inv_vp_rot[None, None] * ndc[:, :, None, :]).sum(-1)
    d = p[..., :3] / jnp.where(p[..., 3:4] == 0, 1.0, p[..., 3:4])
    d = d / jnp.maximum(jnp.linalg.norm(d, axis=-1, keepdims=True), 1e-20)
    return sample_cubemap(cube, d)
