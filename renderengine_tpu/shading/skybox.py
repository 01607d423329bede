"""Skybox pass: cubemap sample at far depth for uncovered pixels.

Reference: ``Assets/Shaders/skybox.{vert,frag}`` — the cube draws last with
``pos.xyww`` (depth 1.0) and LessOrEqual depth, i.e. it fills exactly the
pixels nothing else wrote. Deferred equivalent: composite the cubemap where
tri_id < 0. The view ray uses the rotation-only view matrix
(``skybox.vert:35``: ``mat4(mat3(view))``).
"""

from __future__ import annotations

import numpy as np
import jax
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


def render_skybox_halfres(cube, inv_vp_rot: jnp.ndarray, height: int,
                          width: int, y0=0,
                          full_height: int | None = None) -> jnp.ndarray:
    """``render_skybox`` sampled on the EVEN-pixel half grid + a bilinear
    upsample back to full res. Cubemap gathers price per index (a
    2M-index gather is ~2-4 ms regardless of the tiny table), and the sky
    is massively magnified at screen res (one cube texel spans many
    pixels), so quarter the indices cost nothing visually: the upsample
    error is bounded by the sample field's curvature over one pixel.
    Plane math only — no full-res gathers."""
    h2 = (height + 1) // 2
    w2 = (width + 1) // 2
    # half-grid rays at the EVEN pixel centers of the full grid
    fh = height if full_height is None else full_height
    ys = (jnp.arange(h2, dtype=jnp.float32) * 2.0
          + jnp.asarray(y0, jnp.float32) + 0.5) / fh * 2.0 - 1.0
    xs = (jnp.arange(w2, dtype=jnp.float32) * 2.0 + 0.5) / width * 2.0 - 1.0
    ndc_x = jnp.broadcast_to(xs[None, :], (h2, w2))
    ndc_y = jnp.broadcast_to(ys[:, None], (h2, w2))
    ndc = jnp.stack([ndc_x, ndc_y, jnp.ones_like(ndc_x),
                     jnp.ones_like(ndc_x)], axis=-1)
    p = (inv_vp_rot[None, None] * ndc[:, :, None, :]).sum(-1)
    d = p[..., :3] / jnp.where(p[..., 3:4] == 0, 1.0, p[..., 3:4])
    d = d / jnp.maximum(jnp.linalg.norm(d, axis=-1, keepdims=True), 1e-20)
    half = sample_cubemap(cube, d)                       # [h2, w2, 4]

    # bilinear 2x upsample: odd rows/cols mix the two nearest half
    # samples (weight .5), clamped at the far edge
    def up_axis(a, axis, n_full):
        nxt = jnp.concatenate(
            [jax.lax.slice_in_dim(a, 1, a.shape[axis], axis=axis),
             jax.lax.slice_in_dim(a, a.shape[axis] - 1, a.shape[axis],
                                  axis=axis)], axis=axis)
        even = a
        odd = 0.5 * (a + nxt)
        out = jnp.stack([even, odd], axis=axis + 1)
        shp = list(a.shape)
        shp[axis] = shp[axis] * 2
        return out.reshape(shp)[(slice(None),) * axis
                                + (slice(0, n_full),)]

    full = up_axis(up_axis(half, 1, width), 0, height)
    return full
