"""Pallas TPU tile rasterizer — the production raster kernel.

Grid: one program per framebuffer tile. Per-tile triangle lists come from
``binning.bin_triangles``; pair data is re-laid-out OUTSIDE the kernel
(dense XLA gathers) into a lane-major table

    pair_data [24, P] f32   rows: e0(3) e1(3) e2(3) z(3) w(3) tie(3) pad(6)
    (the kernel records winning PAIR indices; pair -> triangle-id is one
    XLA gather afterwards, so no second DMA stream is needed)

with every tile's segment start padded to a 128 multiple, so the kernel's
memory traffic is nothing but aligned, sequential, double-buffered DMA:

    HBM pair_data[:, start + k*128 : +128] --DMA--> VMEM
    evaluate edge/depth planes over the tile's pixels (VPU f32 FMAs,
    statically unrolled over the chunk)
    fold the (depth, lowest-id) winner into the tile's VMEM z-buffer

This is the TPU translation of the reference's hot loop
(``RenderScene::RenderBasePass`` draw calls -> fragment coverage): instead
of one triangle at a time through a hardware rasterizer, each tile
processes its bin with all VPU lanes covering the tile's pixels.

Winner semantics match ``reference_raster`` exactly (LessOrEqual +
lowest-id ties; ids ascend within a bin, so strict-less keeps the lowest).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .binning import bin_triangles
from .reference_raster import GBuffer
from .setup import TriSetup

_BIG_ID = 2**31 - 1
CHUNK = 128  # DMA alignment quantum (lane width)
N_ROWS = 24  # 15 coefficient rows + 3 tie rows + sublane padding to 8


def _raster_kernel(
    # scalar prefetch
    starts_ref, counts_ref, y0_ref,
    # inputs (HBM)
    pair_data_hbm,
    # outputs (VMEM blocks)
    depth_ref, tri_ref,
    # scratch
    data_buf, sems,
    *, tile_h: int, tile_w: int, width: int, full_height: int, ntx: int,
):
    tile = pl.program_id(0)
    start = pl.multiple_of(starts_ref[tile], CHUNK)
    count = counts_ref[tile]
    n_steps = (count + CHUNK - 1) // CHUNK

    org_x = (tile % ntx) * tile_w
    org_y = (tile // ntx) * tile_h + y0_ref[0]
    lx = jax.lax.broadcasted_iota(jnp.int32, (tile_h, tile_w), 1).astype(jnp.float32)
    ly = jax.lax.broadcasted_iota(jnp.int32, (tile_h, tile_w), 0).astype(jnp.float32)
    px = org_x.astype(jnp.float32) + lx + (0.5 - width * 0.5)
    py = org_y.astype(jnp.float32) + ly + (0.5 - full_height * 0.5)

    def dma(slot, step):
        off = pl.multiple_of(start + step * CHUNK, CHUNK)
        return (pltpu.make_async_copy(pair_data_hbm.at[:, pl.ds(off, CHUNK)],
                                      data_buf.at[slot], sems.at[slot]),)

    @pl.when(n_steps > 0)
    def _():
        for d in dma(0, 0):
            d.start()

    def step_body(step, carry):
        dmin, idmin = carry
        slot = step % 2

        @pl.when(step + 1 < n_steps)
        def _():
            for d in dma((step + 1) % 2, step + 1):
                d.start()

        for d in dma(slot, step):
            d.wait()

        c = data_buf[slot]        # [24, CHUNK]
        base = step * CHUNK

        # statically unrolled per-triangle evaluation: each triangle's
        # planes broadcast over the whole tile (straight-line VPU code)
        dmin_i, idmin_i = dmin, idmin
        for k in range(CHUNK):
            e0 = c[0, k] * px + c[1, k] * py + c[2, k]
            e1 = c[3, k] * px + c[4, k] * py + c[5, k]
            e2 = c[6, k] * px + c[7, k] * py + c[8, k]
            zn = c[9, k] * px + c[10, k] * py + c[11, k]
            wn = c[12, k] * px + c[13, k] * py + c[14, k]
            inside = (
                ((e0 > 0) | ((e0 == 0) & (c[15, k] != 0)))
                & ((e1 > 0) | ((e1 == 0) & (c[16, k] != 0)))
                & ((e2 > 0) | ((e2 == 0) & (c[17, k] != 0)))
            )
            wpos = wn > 0
            d = zn / jnp.where(wpos, wn, 1.0)
            cover = inside & wpos & (d >= 0) & (d <= 1) & (base + k < count)
            take = cover & (d < dmin_i)
            dmin_i = jnp.where(take, d, dmin_i)
            # record the PAIR index; ids ascend within a bin (stable sort),
            # so lowest pair == lowest triangle on exact depth ties; the
            # caller maps pair -> triangle with one gather.
            idmin_i = jnp.where(take, start + base + k, idmin_i)
        return dmin_i, idmin_i

    dmin0 = jnp.ones((tile_h, tile_w), jnp.float32)
    idmin0 = jnp.full((tile_h, tile_w), _BIG_ID, jnp.int32)
    dmin, idmin = jax.lax.fori_loop(0, n_steps, step_body, (dmin0, idmin0))
    depth_ref[0, :, :] = dmin
    tri_ref[0, :, :] = idmin


def _pack_pairs(setup: TriSetup, bins, tri_offset: int, n_tiles: int):
    """Re-layout sorted pairs into chunk-aligned segments (gather form).

    Returns (pair_data [18, P2] f32, pair_tri [P2] i32,
    padded_starts [n_tiles] i32)."""
    t = setup.coef.shape[0]
    max_pairs = bins.pair_tri.shape[0]
    padded_counts = ((bins.counts + CHUNK - 1) // CHUNK) * CHUNK
    padded_starts = jnp.cumsum(padded_counts) - padded_counts
    p2 = max_pairs + CHUNK * n_tiles  # static upper bound

    q = jnp.arange(p2, dtype=jnp.int32)
    tile_of_q = jnp.clip(
        jnp.searchsorted(padded_starts, q, side="right").astype(jnp.int32) - 1,
        0, n_tiles - 1)
    rank = q - padded_starts[tile_of_q]
    src = jnp.clip(bins.starts[tile_of_q] + rank, 0, max_pairs - 1)
    live = rank < bins.counts[tile_of_q]

    tri = jnp.where(live, jnp.clip(bins.pair_tri[src], 0, t - 1), 0)
    coef = setup.coef[tri]                     # [P2,5,3]
    tie = setup.tie[tri].astype(jnp.float32)   # [P2,3]
    coef = jnp.where(live[:, None, None], coef, 0.0)
    pair_data = jnp.concatenate(
        [coef.reshape(p2, 15), tie,
         jnp.zeros((p2, N_ROWS - 18), jnp.float32)], axis=-1).T   # [24, P2]
    pair_tri = jnp.where(live, tri + tri_offset, _BIG_ID)
    return pair_data, pair_tri, padded_starts.astype(jnp.int32)


def rasterize_pallas(setup: TriSetup, height: int, width: int,
                     tile_h: int = 8, tile_w: int = 128,
                     chunk: int = CHUNK, max_pairs: int | None = None,
                     tri_offset: int = 0, interpret: bool = False,
                     y0=0, full_height: int | None = None) -> GBuffer:
    """Bin + pack + Pallas raster. Same result as ``rasterize_tiled``/
    ``rasterize_reference`` (asserted in tests). ``chunk`` is fixed at 128
    by DMA alignment; the arg is accepted for API parity and ignored."""
    del chunk
    t = setup.coef.shape[0]
    fh = height if full_height is None else full_height
    if max_pairs is None:
        max_pairs = 4 * t
    bins = bin_triangles(setup, height, width, tile_h, tile_w, max_pairs)

    ntx = -(-width // tile_w)
    nty = -(-height // tile_h)
    n_tiles = ntx * nty

    pair_data, pair_tri, padded_starts = _pack_pairs(setup, bins, tri_offset, n_tiles)

    kernel = functools.partial(
        _raster_kernel,
        tile_h=tile_h, tile_w=tile_w,
        width=width, full_height=fh, ntx=ntx,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=[
            pl.BlockSpec((1, tile_h, tile_w), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_h, tile_w), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, N_ROWS, CHUNK), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    y0_arr = jnp.asarray(y0, jnp.int32).reshape(1)
    depth, tri = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((n_tiles, tile_h, tile_w), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles, tile_h, tile_w), jnp.int32),
        ],
        interpret=interpret,
    )(padded_starts, bins.counts, y0_arr, pair_data)

    def untile(a):
        a = a.reshape(nty, ntx, tile_h, tile_w).transpose(0, 2, 1, 3)
        return a.reshape(nty * tile_h, ntx * tile_w)[:height, :width]

    pair_idx = untile(tri)
    won = pair_idx != _BIG_ID
    tri_id = jnp.where(won, pair_tri[jnp.where(won, pair_idx, 0)], -1)
    return GBuffer(untile(depth), tri_id)
