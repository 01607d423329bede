"""Editor ground grid — full-screen procedural pass.

Port of ``Assets/Shaders/grid.{vert,frag}``: per-pixel near/far unprojected
rays intersect the y=0 plane; anti-aliased two-scale grid lines with axis
coloring; computes its own depth and blends over the scene. The reference
constructs the Grid but never draws it (SURVEY §2.3 quirk); here it is
drawable behind ``RenderConfig.grid`` (the intent of main.cpp:27's
showGrid option).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from .sampling import quad_dfdx, quad_dfdy


def grid_unproject_matrix(view: np.ndarray, proj: np.ndarray) -> np.ndarray:
    """Host-side inverse(proj @ view) (grid.vert:47-52)."""
    return np.linalg.inv(np.asarray(proj, np.float64) @ np.asarray(view, np.float64)).astype(np.float32)


def _grid_color(pos_xz_x, pos_xz_z, scale):
    """grid() from grid.frag:31-52: anti-aliased lines + axis coloring."""
    cx = pos_xz_x * scale
    cz = pos_xz_z * scale
    dx = jnp.abs(quad_dfdx(cx)) + jnp.abs(quad_dfdy(cx))   # fwidth
    dz = jnp.abs(quad_dfdx(cz)) + jnp.abs(quad_dfdy(cz))
    gx = jnp.abs(jnp.mod(cx - 0.5, 1.0) - 0.5) / jnp.maximum(dx, 1e-9)
    gz = jnp.abs(jnp.mod(cz - 0.5, 1.0) - 0.5) / jnp.maximum(dz, 1e-9)
    line = jnp.minimum(gx, gz)
    min_x = jnp.minimum(dx, 1.0)
    min_z = jnp.minimum(dz, 1.0)
    r = jnp.full_like(cx, 0.2)
    g = jnp.full_like(cx, 0.2)
    b = jnp.full_like(cx, 0.2)
    a = 1.0 - jnp.minimum(line, 1.0)
    b = jnp.where((pos_xz_x > -0.1 * min_x) & (pos_xz_x < 0.1 * min_x), 1.0, b)  # z axis
    r = jnp.where((pos_xz_z > -0.1 * min_z) & (pos_xz_z < 0.1 * min_z), 1.0, r)  # x axis
    return jnp.stack([r, g, b, a], axis=-1)


def render_grid(inv_vp: jnp.ndarray, view: jnp.ndarray, proj: jnp.ndarray,
                scene_depth: jnp.ndarray, rgb: jnp.ndarray,
                near: float = 0.1, far: float = 100.0,
                y0=0, full_height: int | None = None) -> jnp.ndarray:
    """Blend the grid over rgb where its depth passes LessOrEqual against
    the scene depth. Shapes: scene_depth/rgb [H,W(,3)]. ``y0``/
    ``full_height`` shade a row slice of a taller viewport."""
    h, w = scene_depth.shape
    fh = h if full_height is None else full_height
    ys = (jnp.arange(h, dtype=jnp.float32) + jnp.asarray(y0, jnp.float32)
          + 0.5) / fh * 2.0 - 1.0
    xs = (jnp.arange(w, dtype=jnp.float32) + 0.5) / w * 2.0 - 1.0
    ndc_x = jnp.broadcast_to(xs[None, :], (h, w))
    ndc_y = jnp.broadcast_to(ys[:, None], (h, w))

    def unproject(z):
        p = jnp.stack([ndc_x, ndc_y, jnp.full_like(ndc_x, z), jnp.ones_like(ndc_x)], -1)
        q = (inv_vp[None, None] * p[:, :, None, :]).sum(-1)
        return q[..., :3] / jnp.where(q[..., 3:4] == 0, 1.0, q[..., 3:4])

    near_pt = unproject(0.0)
    far_pt = unproject(1.0)

    t = -near_pt[..., 1] / jnp.where(far_pt[..., 1] == near_pt[..., 1], 1.0,
                                     far_pt[..., 1] - near_pt[..., 1])
    pos = near_pt + t[..., None] * (far_pt - near_pt)

    c = (_grid_color(pos[..., 0], pos[..., 2], 10.0)
         + _grid_color(pos[..., 0], pos[..., 2], 1.0)) * (t > 0)[..., None]

    # computeDepth (grid.frag:55-58)
    vp = jnp.asarray(proj, jnp.float32) @ jnp.asarray(view, jnp.float32)
    ph = jnp.concatenate([pos, jnp.ones_like(pos[..., :1])], -1)
    clip = (vp[None, None] * ph[:, :, None, :]).sum(-1)
    depth = clip[..., 2] / jnp.where(clip[..., 3] == 0, 1.0, clip[..., 3])

    # computeLinearDepth with the hardcoded near=0.1 far=100 (grid.frag:60-67)
    csd = depth * 2.0 - 1.0
    linear_depth = (2.0 * 0.1 * 100.0) / (100.0 + 0.1 - csd * (100.0 - 0.1)) / 100.0
    spotlight = jnp.maximum(0.0, 1.0 - linear_depth)

    alpha = jnp.clip(c[..., 3] * spotlight, 0.0, 1.0)
    visible = (depth <= scene_depth) & (depth >= 0.0) & (depth <= 1.0) & (t > 0)
    a = jnp.where(visible, alpha, 0.0)[..., None]
    return rgb * (1 - a) + c[..., :3] * a
