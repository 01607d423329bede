"""Brute-force jnp rasterizer — the golden model.

Evaluates every triangle against every pixel in chunks. O(T * H * W): used
for correctness tests at small resolutions and as the semantic definition
the tiled/Pallas rasterizer must match bit-for-bit (same coefficient math,
same tie rule, same winner selection).

Winner semantics (shared by all rasterizers here): the covered fragment
with minimum depth wins; ties break to the lowest triangle id. Depth test
is LessOrEqual against a buffer cleared to 1.0
(reference ``GraphicsPipelineCache.cpp:334``, clear ``RenderScene.cpp:213``).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .setup import TriSetup, pixel_vectors

INF_DEPTH = jnp.float32(1.0)   # depth clear value
NO_TRI = jnp.int32(-1)


class GBuffer(NamedTuple):
    depth: jnp.ndarray   # [H,W] f32 in [0,1]; 1.0 where empty (cleared)
    tri_id: jnp.ndarray  # [H,W] i32; -1 where empty
    bary: jnp.ndarray | None = None  # [H,W,2] winner (b0, b1); b2 = 1-b0-b1
                                     # (pallas backend fills this in-kernel)
    mat_id: jnp.ndarray | None = None  # [H,W] i32 winner material; 0 where
                                       # empty (pallas fills it from the
                                       # pair table when tri_mat is given)


def _coverage_and_depth(coef, tie, p):
    """coef [K,5,3], tie [K,3], p [...,3] -> (cover [K,...], depth [K,...]).

    The shared semantic core: E>=0 with top-left tie rule, w>0, z in [0,1].

    NOTE: evaluated with explicit f32 FMAs, never matmul/einsum — on TPU
    those default to bf16 MXU passes, which is fatal for edge-function
    precision (coordinates up to +-W/2 would quantize to whole pixels).
    """
    c = coef.reshape(coef.shape[0], *([1] * (p.ndim - 1)), 5, 3)
    px = p[None, ..., 0:1]   # [1, ..., 1] broadcasts against [K, ..., 5]
    py = p[None, ..., 1:2]
    vals = c[..., 0] * px + c[..., 1] * py + c[..., 2]   # [K, ..., 5]
    e = vals[..., 0:3]
    znum = vals[..., 3]
    wnum = vals[..., 4]
    tie_b = tie.reshape(tie.shape[0], *([1] * (e.ndim - 2)), 3)
    inside = jnp.all((e > 0) | ((e == 0) & tie_b), axis=-1)
    wpos = wnum > 0
    depth = znum / jnp.where(wpos, wnum, 1.0)
    # depth bounds tested in RATIONAL space (exact: no divide rounding at
    # the 0/1 boundaries); identical rule in tiled.py and the pallas
    # kernels keeps all backends bit-exact against each other
    cover = inside & wpos & (znum >= 0.0) & (znum <= wnum)
    return cover, depth


def rasterize_reference(
    setup: TriSetup, height: int, width: int, chunk: int = 64,
    tri_offset: int = 0, y0: int = 0, full_height: int | None = None,
    peel_bounds=None,
) -> GBuffer:
    """Full-image brute force. ``tri_offset`` shifts reported tri ids (for
    rasterizing a sub-range of the scene's triangle list); ``y0``/
    ``full_height`` select a row slice of a taller virtual viewport."""
    t = setup.coef.shape[0]
    pad = (-t) % chunk
    coef = jnp.pad(setup.coef, ((0, pad), (0, 0), (0, 0)))
    tie = jnp.pad(setup.tie, ((0, pad), (0, 0)))
    valid = jnp.pad(setup.valid, (0, pad))
    n_chunks = coef.shape[0] // chunk
    p = pixel_vectors(height, width, y0, full_height)  # [H,W,3]

    def body(ci, carry):
        dmin, idmin = carry
        sl = ci * chunk
        c = jax.lax.dynamic_slice_in_dim(coef, sl, chunk, 0)
        tb = jax.lax.dynamic_slice_in_dim(tie, sl, chunk, 0)
        vm = jax.lax.dynamic_slice_in_dim(valid, sl, chunk, 0)
        cover, depth = _coverage_and_depth(c, tb, p)       # [K,H,W]
        cover = cover & vm[:, None, None]
        if peel_bounds is not None:
            cover = cover & (depth > peel_bounds[0][None]) & (depth <= peel_bounds[1][None])
        depth = jnp.where(cover, depth, INF_DEPTH + 1.0)
        ids = (sl + tri_offset) + jnp.arange(chunk, dtype=jnp.int32)[:, None, None]
        # lexicographic (depth, id) min within the chunk
        d_c = depth.min(axis=0)
        id_c = jnp.where(depth == d_c[None], ids, jnp.int32(2**31 - 1)).min(axis=0)
        any_c = cover.any(axis=0)
        # merge with carry: LessOrEqual depth test, lowest id on ties
        take = any_c & ((d_c < dmin) | ((d_c == dmin) & (id_c < idmin)))
        return jnp.where(take, d_c, dmin), jnp.where(take, id_c, idmin)

    dmin0 = jnp.full((height, width), INF_DEPTH, jnp.float32)
    idmin0 = jnp.full((height, width), jnp.int32(2**31 - 1), jnp.int32)
    dmin, idmin = jax.lax.fori_loop(0, n_chunks, body, (dmin0, idmin0))
    tri_id = jnp.where(idmin == 2**31 - 1, NO_TRI, idmin)
    return GBuffer(dmin, tri_id)


def barycentrics_at(coef: jnp.ndarray, tri_id: jnp.ndarray, height: int, width: int,
                    y0: int = 0, full_height: int | None = None):
    """Recompute normalized barycentrics + 1/w for a G-buffer.

    coef: [T,5,3] full table; tri_id: [H,W] (entries < 0 are empty).
    Returns (bary [H,W,3], w_frag [H,W]) — bary are the perspective-correct
    lambdas: attr = sum(bary_i * u_i).
    """
    safe = jnp.maximum(tri_id, 0)
    c = coef[safe]                         # [H,W,5,3]
    p = pixel_vectors(height, width, y0, full_height)  # [H,W,3]
    vals = c[..., 0] * p[..., 0:1] + c[..., 1] * p[..., 1:2] + c[..., 2]  # [H,W,5]
    e = vals[..., 0:3]
    esum = e.sum(axis=-1)
    bary = e / jnp.where(esum == 0, 1.0, esum)[..., None]
    w_frag = jnp.where(vals[..., 4] != 0, vals[..., 4], 1.0) / jnp.where(esum == 0, 1.0, esum)
    return bary, w_frag
