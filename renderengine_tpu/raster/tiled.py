"""Tiled rasterizer, pure-jnp formulation.

Same semantics as ``reference_raster`` but O(pairs * tile_pixels) instead
of O(T * H * W): every tile processes only its binned triangles. This is
the algorithmic shape the Pallas kernel implements; the jnp version runs
everywhere (CPU tests) and is the fallback when Pallas is off.

Structure: vectorized over ALL tiles at once, looping over chunk steps
(bounded by the longest bin). Work per step is [n_tiles, chunk, th, tw] —
dense, VPU-friendly, no data-dependent shapes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .binning import TileBins, bin_triangles
from .reference_raster import GBuffer
from .setup import TriSetup

_BIG_ID = jnp.int32(2**31 - 1)


def rasterize_tiled(setup: TriSetup, height: int, width: int,
                    tile_h: int = 8, tile_w: int = 128,
                    chunk: int = 16, max_pairs: int | None = None,
                    tri_offset: int = 0, y0: int = 0,
                    full_height: int | None = None,
                    peel_bounds=None) -> GBuffer:
    fh = height if full_height is None else full_height
    t = setup.coef.shape[0]
    if max_pairs is None:
        max_pairs = 4 * t
    bins = bin_triangles(setup, height, width, tile_h, tile_w, max_pairs)

    ntx = -(-width // tile_w)
    nty = -(-height // tile_h)
    n_tiles = ntx * nty

    # tile-local pixel vectors, offset per tile by its origin
    tile_ids = jnp.arange(n_tiles, dtype=jnp.int32)
    org_x = (tile_ids % ntx) * tile_w
    org_y = (tile_ids // ntx) * tile_h
    lx = jnp.arange(tile_w, dtype=jnp.float32)[None, None, :]
    ly = jnp.arange(tile_h, dtype=jnp.float32)[None, :, None]
    px = org_x.astype(jnp.float32)[:, None, None] + lx + 0.5 - width * 0.5
    py = org_y.astype(jnp.float32)[:, None, None] + ly + (jnp.asarray(y0, jnp.float32) + 0.5 - fh * 0.5)

    if peel_bounds is not None:
        ph = nty * tile_h - height
        pw = ntx * tile_w - width

        def tilefy(a, fill):
            a = jnp.pad(a, ((0, ph), (0, pw)), constant_values=fill)
            a = a.reshape(nty, tile_h, ntx, tile_w).transpose(0, 2, 1, 3)
            return a.reshape(n_tiles, tile_h, tile_w)

        prev_t = tilefy(peel_bounds[0], 2.0)
        zmax_t = tilefy(peel_bounds[1], -1.0)

    max_count = jnp.max(bins.counts)
    n_steps = (max_count + chunk - 1) // chunk

    coef = setup.coef
    tie = setup.tie

    def body(step, carry):
        dmin, idmin = carry  # [n_tiles, th, tw]
        k = step * chunk
        # per-tile chunk of pair indices
        rel = k + jnp.arange(chunk, dtype=jnp.int32)[None, :]           # [1,C]
        pidx = bins.starts[:, None] + rel                                # [n_tiles,C]
        in_bin = rel < bins.counts[:, None]
        pidx = jnp.clip(pidx, 0, bins.pair_tri.shape[0] - 1)
        tri = bins.pair_tri[pidx]                                        # [n_tiles,C]
        c = coef[tri]                                                    # [n_tiles,C,5,3]
        tb = tie[tri]                                                    # [n_tiles,C,3]

        # evaluate: vals[n,c,5,th,tw]
        vx = c[..., 0][..., None, None] * px[:, None, None, :, :]
        vy = c[..., 1][..., None, None] * py[:, None, None, :, :]
        vals = vx + vy + c[..., 2][..., None, None]
        e = vals[:, :, 0:3]
        inside = jnp.all((e > 0) | ((e == 0) & tb[..., None, None]), axis=2)
        wnum = vals[:, :, 4]
        znum = vals[:, :, 3]
        wpos = wnum > 0
        depth = znum / jnp.where(wpos, wnum, 1.0)
        # rational depth bounds — see reference_raster._eval_cover
        cover = (inside & wpos & (znum >= 0) & (znum <= wnum)
                 & in_bin[..., None, None])
        if peel_bounds is not None:
            cover = cover & (depth > prev_t[:, None]) & (depth <= zmax_t[:, None])
        depth = jnp.where(cover, depth, 2.0)
        ids = jnp.where(cover, (tri + tri_offset)[..., None, None], _BIG_ID)

        d_c = depth.min(axis=1)                                          # [n_tiles,th,tw]
        id_c = jnp.where(depth == d_c[:, None], ids, _BIG_ID).min(axis=1)
        any_c = cover.any(axis=1)
        take = any_c & ((d_c < dmin) | ((d_c == dmin) & (id_c < idmin)))
        return jnp.where(take, d_c, dmin), jnp.where(take, id_c, idmin)

    dmin0 = jnp.ones((n_tiles, tile_h, tile_w), jnp.float32)
    idmin0 = jnp.full((n_tiles, tile_h, tile_w), _BIG_ID, jnp.int32)
    dmin, idmin = jax.lax.while_loop(
        lambda sv: sv[0] < n_steps,
        lambda sv: (sv[0] + 1, body(sv[0], sv[1])),
        (jnp.int32(0), (dmin0, idmin0)),
    )[1]

    # untile to [H,W]
    def untile(a):
        a = a.reshape(nty, ntx, tile_h, tile_w).transpose(0, 2, 1, 3)
        return a.reshape(nty * tile_h, ntx * tile_w)[:height, :width]

    tri_id = jnp.where(idmin == _BIG_ID, jnp.int32(-1), idmin)
    return GBuffer(untile(dmin), untile(tri_id))
