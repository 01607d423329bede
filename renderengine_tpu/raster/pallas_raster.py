"""Pallas TPU tile rasterizer — the production raster kernel.

Grid: one program per framebuffer tile. Per-tile triangle lists come from
``binning.bin_triangles``; pair data is re-laid-out OUTSIDE the kernel
(one dense XLA row gather) into a lane-major table

    pair_data [24|48, P] f32   rows: e0(3) e1(3) e2(3) z(3) w(3) tie(3)
                               pad(6) [+ attribute planes 8x3]
    (the kernel records winning PAIR indices; pair -> triangle-id is one
    XLA gather afterwards, so no second DMA stream is needed)

The kernel DMAs each tile's segment from its 128-aligned floor (live
pairs selected by a per-pair global-index test), so the memory traffic is
nothing but aligned, sequential, double-buffered DMA:

    HBM pair_data[:, base + k*128 : +128] --DMA--> VMEM
    evaluate edge/depth planes over the tile's pixels (VPU f32 FMAs,
    statically unrolled over the chunk)
    fold the (depth, lowest-id) winner into the tile's VMEM z-buffer

With ``attr_planes`` the kernel also interpolates the winner's vertex
attributes in-register (pos3 | normal3 | uv2 as rational planes
sum(E_i u_i)/sum(E_i)), replacing the deferred resolve stage's per-pixel
vertex gathers with per-triangle plane math.

This is the TPU translation of the reference's hot loop
(``RenderScene::RenderBasePass`` draw calls -> fragment coverage): instead
of one triangle at a time through a hardware rasterizer, each tile
processes its bin with all VPU lanes covering the tile's pixels.

Winner semantics match ``reference_raster`` exactly (LessOrEqual +
lowest-id ties; ids ascend within a bin, so strict-less keeps the lowest).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .binning import bin_triangles
from .reference_raster import GBuffer
from .setup import TriSetup

_BIG_ID = 2**31 - 1
CHUNK = 128   # DMA alignment quantum (lane width)
N_ROWS = 24   # 15 coefficient rows + 3 tie rows + sublane padding to 8
N_ATTRS = 8   # pos3 | normal3 | uv2
N_ROWS_ATTR = N_ROWS + 3 * N_ATTRS  # 48


def attribute_planes(setup: TriSetup, vo, tri_vidx) -> jnp.ndarray:
    """[T,24] f32 rational attribute planes: row triplet 3k..3k+2 is
    arow_k = sum_i u_ik * e_i, so attr_k(p) = (arow_k . p) / sum(E_i)."""
    vattr = jnp.concatenate([vo.world_pos, vo.world_normal, vo.uv], axis=-1)
    corners = vattr[tri_vidx]                 # [T,3,8]
    e = setup.coef[:, 0:3, :]                 # [T,3(edges),3(xyc)]
    planes = (corners[:, :, :, None] * e[:, :, None, :]).sum(1)  # [T,8,3]
    return planes.reshape(planes.shape[0], 3 * N_ATTRS)


def _raster_kernel(
    # scalar prefetch
    starts_ref, counts_ref, y0_ref,
    # inputs (HBM + optional VMEM bounds block)
    pair_data_hbm, *rest,
    tile_h: int, tile_w: int, width: int, full_height: int, ntx: int,
    peel: bool, interp: bool,
):
    rest = list(rest)
    bounds_ref = rest.pop(0) if peel else None
    depth_ref = rest.pop(0)
    tri_ref = rest.pop(0)
    bary_ref = rest.pop(0)
    attr_ref = rest.pop(0) if interp else None
    data_buf, sems = rest

    tile = pl.program_id(0)
    start = starts_ref[tile]
    count = counts_ref[tile]
    base0 = (start // CHUNK) * CHUNK          # aligned DMA floor
    span_end = start + count
    n_steps = jnp.where(count > 0,
                        (span_end - base0 + CHUNK - 1) // CHUNK, 0)

    org_x = (tile % ntx) * tile_w
    org_y = (tile // ntx) * tile_h + y0_ref[0]
    lx = jax.lax.broadcasted_iota(jnp.int32, (tile_h, tile_w), 1).astype(jnp.float32)
    ly = jax.lax.broadcasted_iota(jnp.int32, (tile_h, tile_w), 0).astype(jnp.float32)
    px = org_x.astype(jnp.float32) + lx + (0.5 - width * 0.5)
    py = org_y.astype(jnp.float32) + ly + (0.5 - full_height * 0.5)

    def dma(slot, step):
        off = pl.multiple_of(base0 + step * CHUNK, CHUNK)
        return (pltpu.make_async_copy(pair_data_hbm.at[:, pl.ds(off, CHUNK)],
                                      data_buf.at[slot], sems.at[slot]),)

    @pl.when(n_steps > 0)
    def _():
        for d in dma(0, 0):
            d.start()

    n_attr_carry = N_ATTRS if interp else 0

    def step_body(step, carry):
        dmin, idmin, b0c, b1c = carry[0], carry[1], carry[2], carry[3]
        attrs_c = list(carry[4:])
        slot = step % 2

        @pl.when(step + 1 < n_steps)
        def _():
            for d in dma((step + 1) % 2, step + 1):
                d.start()

        for d in dma(slot, step):
            d.wait()

        c = data_buf[slot]        # [N_ROWS(_ATTR), CHUNK]
        base = base0 + step * CHUNK
        if peel:
            prev_d = bounds_ref[0, 0]   # nearest already-peeled layer
            zmax = bounds_ref[0, 1]     # opaque depth bound (LessOrEqual)

        # statically unrolled per-triangle evaluation: each triangle's
        # planes broadcast over the whole tile (straight-line VPU code)
        dmin_i, idmin_i, b0_i, b1_i = dmin, idmin, b0c, b1c
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
            g = base + k              # global pair index
            cover = (inside & wpos & (d >= 0) & (d <= 1)
                     & (g >= start) & (g < span_end))
            if peel:
                cover = cover & (d > prev_d) & (d <= zmax)
            take = cover & (d < dmin_i)
            dmin_i = jnp.where(take, d, dmin_i)
            # record the PAIR index; ids ascend within a bin (stable sort),
            # so lowest pair == lowest triangle on exact depth ties; the
            # caller maps pair -> triangle with one gather.
            idmin_i = jnp.where(take, g, idmin_i)
            esum = e0 + e1 + e2
            inv = 1.0 / jnp.where(esum == 0, 1.0, esum)
            # winner barycentrics (perspective-correct lambdas)
            b0_i = jnp.where(take, e0 * inv, b0_i)
            b1_i = jnp.where(take, e1 * inv, b1_i)
            if interp:
                for a in range(N_ATTRS):
                    num = (c[N_ROWS + 3 * a, k] * px
                           + c[N_ROWS + 3 * a + 1, k] * py
                           + c[N_ROWS + 3 * a + 2, k])
                    attrs_c[a] = jnp.where(take, num * inv, attrs_c[a])
        return (dmin_i, idmin_i, b0_i, b1_i, *attrs_c)

    dmin0 = jnp.ones((tile_h, tile_w), jnp.float32)
    idmin0 = jnp.full((tile_h, tile_w), _BIG_ID, jnp.int32)
    z0 = jnp.zeros((tile_h, tile_w), jnp.float32)
    init = (dmin0, idmin0, z0, z0) + tuple(z0 for _ in range(n_attr_carry))
    out = jax.lax.fori_loop(0, n_steps, step_body, init)
    depth_ref[0, :, :] = out[0]
    tri_ref[0, :, :] = out[1]
    bary_ref[0, 0, :, :] = out[2]
    bary_ref[0, 1, :, :] = out[3]
    if interp:
        for a in range(N_ATTRS):
            attr_ref[0, a, :, :] = out[4 + a]


def _tile_bounds(peel_bounds, height, width, tile_h, tile_w, nty, ntx):
    """(prev[H,W], zmax[H,W]) -> [n_tiles, 2, th, tw] VMEM blocks."""
    prev, zmax = peel_bounds
    ph = nty * tile_h - height
    pw = ntx * tile_w - width

    def tile(a, fill):
        a = jnp.pad(a, ((0, ph), (0, pw)), constant_values=fill)
        a = a.reshape(nty, tile_h, ntx, tile_w).transpose(0, 2, 1, 3)
        return a.reshape(nty * ntx, tile_h, tile_w)

    return jnp.stack([tile(prev, 2.0), tile(zmax, -1.0)], axis=1)


MAT_SHIFT = 20                 # pair_aux: tri(+offset) in low 20 bits,
MAT_LIMIT = 2047               # material id in bits 20..30 (< 2047 so the
TRI_LIMIT = (1 << MAT_SHIFT)   # packed value never collides with _BIG_ID)


class PreparedPairs(NamedTuple):
    """Binned + packed pair tables, reusable across raster passes over the
    same geometry+camera (e.g. successive depth-peel layers)."""
    bins: object                 # TileBins
    pair_data: jnp.ndarray       # [N_ROWS(_ATTR), P2] f32 lane-major rows
    pair_aux: jnp.ndarray        # [P2] i32 tri(+offset) | mat<<20; _BIG_ID dead
    has_mat: bool                # static: whether mat ids are packed in aux


def _pack_pairs(setup: TriSetup, bins, tri_offset: int, attr_planes=None,
                tri_mat=None):
    """Gather sorted-pair rows into the kernel's lane-major layout — ONE
    row gather per pair (setup pre-packs coef+tie; attribute planes are
    appended when interpolating in-kernel).

    Returns a PreparedPairs; P2 = budget rounded up so the last aligned DMA
    stays in bounds. Dead slots carry zero coefficients => never cover.
    When ``tri_mat`` ([T] i32 material ids) is given and the id spaces fit,
    the material rides the same aux word as the triangle id, so the shading
    pass needs no separate [H,W] material gather."""
    t = setup.coef.shape[0]
    max_pairs = bins.pair_tri.shape[0]
    p2 = (-(-max_pairs // CHUNK)) * CHUNK + CHUNK

    live = jnp.pad(bins.pair_valid, (0, p2 - max_pairs))
    tri = jnp.pad(jnp.clip(bins.pair_tri, 0, t - 1), (0, p2 - max_pairs))
    tri = jnp.where(live, tri, 0)
    rows = setup.packed if attr_planes is None else jnp.concatenate(
        [setup.packed, attr_planes], axis=-1)
    pair_data = jnp.where(live[:, None], rows[tri], 0.0).T  # [rows, P2]
    aux = tri + tri_offset
    has_mat = tri_mat is not None and t + tri_offset <= TRI_LIMIT
    if has_mat:
        aux = aux | (jnp.clip(tri_mat[tri], 0, MAT_LIMIT - 1) << MAT_SHIFT)
    pair_aux = jnp.where(live, aux, _BIG_ID)
    return PreparedPairs(bins, pair_data, pair_aux, has_mat)


def prepare_pallas_pairs(setup: TriSetup, height: int, width: int,
                         tile_h: int = 8, tile_w: int = 128,
                         max_pairs: int | None = None, tri_offset: int = 0,
                         attr_planes=None, tri_mat=None) -> PreparedPairs:
    """Bin + pack for ``rasterize_pallas``. Split out so passes over the
    same geometry (successive depth-peel layers) bin and pack once."""
    t = setup.coef.shape[0]
    if max_pairs is None:
        max_pairs = 4 * t
    bins = bin_triangles(setup, height, width, tile_h, tile_w, max_pairs)
    return _pack_pairs(setup, bins, tri_offset, attr_planes, tri_mat)


def rasterize_pallas(setup: TriSetup, height: int, width: int,
                     tile_h: int = 8, tile_w: int = 128,
                     chunk: int = CHUNK, max_pairs: int | None = None,
                     tri_offset: int = 0, interpret: bool = False,
                     y0=0, full_height: int | None = None,
                     peel_bounds=None, attr_planes=None, tri_mat=None,
                     prepared: PreparedPairs | None = None):
    """Bin + pack + Pallas raster. Same G-buffer as ``rasterize_tiled``/
    ``rasterize_reference`` (asserted in tests). ``chunk`` is fixed at 128
    by DMA alignment; the arg is accepted for API parity and ignored.

    ``peel_bounds``: optional (prev_depth [H,W], zmax [H,W]) — keep only
    fragments with prev < depth <= zmax (depth-peeling for the sorted
    translucent pass).

    ``attr_planes``: optional [T,24] from ``attribute_planes`` — the kernel
    then interpolates pos/normal/uv for the winner, and the return value is
    (GBuffer, attrs [H,W,8]); otherwise returns (GBuffer, None).

    ``tri_mat``: optional [T] i32 material ids — rides the pair-aux word so
    the G-buffer's ``mat_id`` plane costs no extra gather.

    ``prepared``: a ``prepare_pallas_pairs`` result to reuse (skips binning
    and packing; ``max_pairs``/``tri_offset``/``tri_mat`` are then ignored).
    """
    del chunk
    fh = height if full_height is None else full_height

    ntx = -(-width // tile_w)
    nty = -(-height // tile_h)
    n_tiles = ntx * nty

    interp = attr_planes is not None
    n_rows = N_ROWS_ATTR if interp else N_ROWS
    if prepared is None:
        prepared = prepare_pallas_pairs(setup, height, width, tile_h, tile_w,
                                        max_pairs, tri_offset, attr_planes,
                                        tri_mat)
    bins, pair_data, pair_aux = (prepared.bins, prepared.pair_data,
                                 prepared.pair_aux)

    peel = peel_bounds is not None
    kernel = functools.partial(
        _raster_kernel,
        tile_h=tile_h, tile_w=tile_w,
        width=width, full_height=fh, ntx=ntx, peel=peel, interp=interp,
    )
    in_specs = [pl.BlockSpec(memory_space=pltpu.HBM)]
    if peel:
        in_specs.append(pl.BlockSpec((1, 2, tile_h, tile_w),
                                     lambda i, *_: (i, 0, 0, 0),
                                     memory_space=pltpu.VMEM))
    out_specs = [
        pl.BlockSpec((1, tile_h, tile_w), lambda i, *_: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, tile_h, tile_w), lambda i, *_: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 2, tile_h, tile_w), lambda i, *_: (i, 0, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((n_tiles, tile_h, tile_w), jnp.float32),
        jax.ShapeDtypeStruct((n_tiles, tile_h, tile_w), jnp.int32),
        jax.ShapeDtypeStruct((n_tiles, 2, tile_h, tile_w), jnp.float32),
    ]
    if interp:
        out_specs.append(pl.BlockSpec((1, N_ATTRS, tile_h, tile_w),
                                      lambda i, *_: (i, 0, 0, 0),
                                      memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((n_tiles, N_ATTRS, tile_h, tile_w),
                                              jnp.float32))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n_tiles,),
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=[
            pltpu.VMEM((2, n_rows, CHUNK), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    y0_arr = jnp.asarray(y0, jnp.int32).reshape(1)
    args = [bins.starts, bins.counts, y0_arr, pair_data]
    if peel:
        args.append(_tile_bounds(peel_bounds, height, width, tile_h, tile_w,
                                 nty, ntx))
    outs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
    )(*args)
    depth, tri, bary = outs[0], outs[1], outs[2]

    def untile(a):
        a = a.reshape(nty, ntx, tile_h, tile_w).transpose(0, 2, 1, 3)
        return a.reshape(nty * tile_h, ntx * tile_w)[:height, :width]

    pair_idx = untile(tri)
    won = pair_idx != _BIG_ID
    aux = pair_aux[jnp.where(won, pair_idx, 0)]     # ONE [H,W] gather
    if prepared.has_mat:
        tri_id = jnp.where(won, aux & (TRI_LIMIT - 1), -1)
        mat_id = jnp.where(won, aux >> MAT_SHIFT, 0)
    else:
        tri_id = jnp.where(won, aux, -1)
        mat_id = None
    b0 = untile(bary[:, 0])
    b1 = untile(bary[:, 1])
    g = GBuffer(untile(depth), tri_id, jnp.stack([b0, b1], axis=-1), mat_id)
    if not interp:
        return g
    attrs = jnp.stack([untile(outs[3][:, a]) for a in range(N_ATTRS)], axis=-1)
    return g, attrs
