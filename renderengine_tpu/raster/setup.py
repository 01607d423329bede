"""Vertex transform + clipless triangle setup.

This is the TPU-native replacement for the reference's vertex stage
(``Assets/Shaders/primitive.vert``) and Vulkan's fixed-function triangle
setup/clipping:

- Vertex transform is a batched matmul over ALL scene vertices (MXU work),
  not a per-draw loop.
- Triangle setup uses 2D homogeneous (clipless) rasterization: edge
  functions come from the adjugate of the 3x3 screen-homogeneous vertex
  matrix, so triangles crossing the near plane need no polygon clipping
  (variable topology would be hostile to XLA's static shapes). For a pixel
  p = (sx - W/2, sy - H/2, 1):

      E_i(p) = e_i . p          (e_i = +-adjugate column i)
      inside = all E_i >= 0 (with top-left tie rule)
      z_ndc  = (sum E_i z_i) / (sum E_i w_i)
      attr u = (sum E_i u_i) / (sum E_i)       [perspective correct]

  Front-facing (Vulkan CCW in framebuffer coords, reference back-cull
  config ``GraphicsPipelineCache.cpp:296-297``) corresponds to det(M) < 0;
  signs are normalized so interior is E >= 0 for kept triangles.

All functions are jit-traceable; shapes depend only on scene sizes.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..core.config import CullMode


class VertexOutputs(NamedTuple):
    """Post-vertex-stage arrays, the analog of primitive.vert outputs."""

    world_pos: jnp.ndarray    # [V,3] fragPos
    world_normal: jnp.ndarray # [V,3] fragNormal (normalized)
    uv: jnp.ndarray           # [V,2]
    clip: jnp.ndarray         # [V,4] gl_Position


class TriSetup(NamedTuple):
    """Per-triangle raster coefficients.

    coef[T,5,3]: rows = (e0, e1, e2, zrow, wrow); for pixel vector p,
    vals = coef @ p gives (E0, E1, E2, z_num, w_num) with
    depth = z_num / w_num and bary_i = E_i / (E0+E1+E2).
    """

    coef: jnp.ndarray      # [T,5,3] f32
    tie: jnp.ndarray       # [T,3] bool — accept E==0 (top-left rule)
    valid: jnp.ndarray     # [T] bool
    bbox: jnp.ndarray      # [T,4] i32 (x0,y0,x1,y1) inclusive pixel bounds
    packed: jnp.ndarray    # [T,24] f32 kernel rows (coef 15 | tie 3 | pad 6)


def vertex_transform(scene: dict, view: jnp.ndarray, proj: jnp.ndarray) -> VertexOutputs:
    """All-scene vertex stage (reference ``primitive.vert:49-57``):
    world = node transform; clip = proj @ view @ world; normals through the
    per-node inverse-transpose (hoisted to scene upload)."""
    pos = scene["positions"]
    nrm = scene["normals"]
    vert_node = scene["vert_node"]
    tf = scene["transforms"][vert_node]          # [V,4,4]
    nmat = scene["normal_mats"][vert_node]       # [V,3,3]
    # Explicit f32 FMAs (not einsum/matmul: those lower to bf16 MXU ops on
    # TPU by default, and positions need full f32).
    h = (tf[:, :3, :3] * pos[:, None, :]).sum(-1) + tf[:, :3, 3]
    w = (tf[:, 3, :3] * pos).sum(-1) + tf[:, 3, 3]
    world = h / w[:, None]
    wn = (nmat * nrm[:, None, :]).sum(-1)
    wn = wn / jnp.maximum(jnp.linalg.norm(wn, axis=-1, keepdims=True), 1e-20)
    proj = jnp.asarray(proj, jnp.float32)
    view = jnp.asarray(view, jnp.float32)
    vp = (proj[:, :, None] * view[None, :, :]).sum(1)  # f32 4x4 product
    world_h = jnp.concatenate([world, jnp.ones_like(world[:, :1])], axis=-1)
    clip = (vp[None, :, :] * world_h[:, None, :]).sum(-1)
    return VertexOutputs(world, wn, scene["uvs"], clip)


def corner_clip(corner_pos: jnp.ndarray, viewproj: jnp.ndarray) -> jnp.ndarray:
    """[T,3,4] corner clip coords from STATIC world-space corner positions
    (``scene.upload``'s ``corner_attr[..., 0:3]``): a dense FMA replaces
    the per-frame ``clip[tri_vidx]`` gather (TPU gathers price per index;
    this is pure VPU work)."""
    vp = jnp.asarray(viewproj, jnp.float32)
    return ((vp[None, None, :, :3] * corner_pos[:, :, None, :]).sum(-1)
            + vp[None, None, :, 3])


def triangle_setup(
    clip: jnp.ndarray,
    tri_vidx: jnp.ndarray,
    n_tris: jnp.ndarray,
    width: int,
    height: int,
    cull_mode: CullMode = CullMode.BACK,
    first_tri=0,
) -> TriSetup:
    """Build clipless raster coefficients for every triangle.

    [first_tri, n_tris) is the live range — the draw-list analog: opaque
    triangles come first, translucent after (``RenderScene.cpp:105-159``).
    """
    c = clip[tri_vidx]                     # [T,3,4] corner clip coords
    return triangle_setup_corners(c, n_tris, width, height, cull_mode,
                                  first_tri)


def triangle_setup_corners(
    c: jnp.ndarray,
    n_tris: jnp.ndarray,
    width: int,
    height: int,
    cull_mode: CullMode = CullMode.BACK,
    first_tri=0,
) -> TriSetup:
    """``triangle_setup`` from pre-gathered corner clip coords [T,3,4]
    (see ``corner_clip`` — the zero-gather per-frame path)."""
    x, y, z, w = c[..., 0], c[..., 1], c[..., 2], c[..., 3]

    # screen-homogeneous coords centered on the viewport middle
    a = x * (width * 0.5)                  # [T,3]
    b = y * (height * 0.5)
    r = jnp.stack([a, b, w], axis=-1)      # [T,3,3] rows r0,r1,r2

    # adjugate columns = cross products of rows
    r0, r1, r2 = r[:, 0], r[:, 1], r[:, 2]
    a0 = jnp.cross(r1, r2)                 # adj column 0
    a1 = jnp.cross(r2, r0)
    a2c = jnp.cross(r0, r1)
    det = (r0 * a0).sum(-1)  # explicit f32 (einsum may lower to bf16 MXU)

    front = det < 0.0                      # Vulkan-CCW front face
    if cull_mode == CullMode.BACK:
        orient_ok = front
    elif cull_mode == CullMode.FRONT:
        orient_ok = det > 0.0
    else:
        orient_ok = det != 0.0
    # sign-normalize so interior is E >= 0: inside means lambda_i =
    # (A[:,i].p)/det >= 0, i.e. sign(A.p) == sign(det), so e = sign(det)*A.
    s = jnp.where(det < 0, -1.0, 1.0)[:, None]
    e0, e1, e2 = s * a0, s * a1, s * a2c   # [T,3] each

    zrow = e0 * z[:, 0:1] + e1 * z[:, 1:2] + e2 * z[:, 2:3]
    wrow = e0 * w[:, 0:1] + e1 * w[:, 1:2] + e2 * w[:, 2:3]
    coef = jnp.stack([e0, e1, e2, zrow, wrow], axis=1)  # [T,5,3]

    # top-left tie rule: accept E==0 iff gradient points "down" (interior
    # below: top edge) or horizontal-left (left edge), in y-down coords.
    e = coef[:, 0:3, :]
    tie = (e[..., 1] > 0) | ((e[..., 1] == 0) & (e[..., 0] > 0))  # [T,3]

    # conservative frustum reject (all-out on one plane)
    out = (
        jnp.all(x > w, axis=1) | jnp.all(x < -w, axis=1)
        | jnp.all(y > w, axis=1) | jnp.all(y < -w, axis=1)
        | jnp.all(z > w, axis=1) | jnp.all(z < 0, axis=1)
    )

    # screen bbox (w>0 vertices only; any w<=0 -> conservative full screen)
    eps = 1e-6
    safe_w = jnp.where(w > eps, w, 1.0)
    sx = width * 0.5 + a / safe_w
    sy = height * 0.5 + b / safe_w
    any_behind = jnp.any(w <= eps, axis=1)
    x0 = jnp.where(any_behind, 0.0, jnp.floor(sx.min(axis=1)))
    y0 = jnp.where(any_behind, 0.0, jnp.floor(sy.min(axis=1)))
    x1 = jnp.where(any_behind, float(width - 1), jnp.ceil(sx.max(axis=1)))
    y1 = jnp.where(any_behind, float(height - 1), jnp.ceil(sy.max(axis=1)))
    x0 = jnp.clip(x0, 0, width - 1).astype(jnp.int32)
    y0 = jnp.clip(y0, 0, height - 1).astype(jnp.int32)
    x1 = jnp.clip(x1, 0, width - 1).astype(jnp.int32)
    y1 = jnp.clip(y1, 0, height - 1).astype(jnp.int32)
    bbox = jnp.stack([x0, y0, x1, y1], axis=-1)

    tri_ids = jnp.arange(c.shape[0], dtype=jnp.int32)
    in_range = (tri_ids < n_tris) & (tri_ids >= first_tri)
    valid = orient_ok & ~out & in_range & (x1 >= x0) & (y1 >= y0)
    coef = coef.astype(jnp.float32)
    t = coef.shape[0]
    packed = jnp.concatenate(
        [coef.reshape(t, 15), tie.astype(jnp.float32),
         jnp.zeros((t, 6), jnp.float32)], axis=-1)
    return TriSetup(coef, tie, valid, bbox, packed)


def pixel_vectors(height: int, width: int, y0: int = 0,
                  full_height: int | None = None) -> jnp.ndarray:
    """[H,W,3] pixel vectors p = (sx+0.5-W/2, sy+0.5-H/2, 1).

    ``y0``/``full_height`` render a row slice [y0, y0+height) of a taller
    virtual viewport (multi-chip image-space sharding).
    """
    fh = height if full_height is None else full_height
    ys = jnp.arange(height, dtype=jnp.float32) + (y0 + 0.5 - fh * 0.5)
    xs = jnp.arange(width, dtype=jnp.float32) + 0.5 - width * 0.5
    px = jnp.broadcast_to(xs[None, :], (height, width))
    py = jnp.broadcast_to(ys[:, None], (height, width))
    return jnp.stack([px, py, jnp.ones_like(px)], axis=-1)


def restrict_rows(setup: TriSetup, y0, slice_h: int, full_height: int) -> TriSetup:
    """Restrict a full-viewport TriSetup to rows [y0, y0+slice_h): rebases
    bboxes to slice-local coordinates and invalidates triangles fully
    outside. ``y0`` may be traced (per-device offset under shard_map)."""
    bbox = setup.bbox
    y0 = jnp.asarray(y0, jnp.int32)
    ny0 = jnp.clip(bbox[:, 1] - y0, 0, slice_h - 1)
    ny1 = jnp.clip(bbox[:, 3] - y0, 0, slice_h - 1)
    inside = (bbox[:, 3] >= y0) & (bbox[:, 1] < y0 + slice_h)
    new_bbox = jnp.stack([bbox[:, 0], ny0, bbox[:, 2], ny1], axis=-1)
    return TriSetup(setup.coef, setup.tie, setup.valid & inside, new_bbox,
                    setup.packed)
