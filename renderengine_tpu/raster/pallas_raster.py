"""Pallas TPU tile rasterizer — the production raster kernel.

Grid: one program per 8x16-pixel subtile (128 pixels = one VPU vreg of
lanes) — or, for sparse passes, per COVERED subtile via a scalar-prefetched
program->tile map. Per-tile triangle lists come from
``binning.bin_triangles``; pair data is laid out OUTSIDE the kernel (one
dense XLA row gather) as

    pair_data [P2, 128] f32   cols: e0(3) e1(3) e2(3) z(3) w(3)
                              tie-eps(3) tri_f mat_f [attr planes 8x3] pad

The kernel DMAs each tile's segment in [CHUNK, cols] slabs and evaluates
**8 pairs at a time across the VPU's sublanes**: a group's coefficient
columns broadcast as (8,1) against the subtile's (1,128) pixel vectors, so
one vector op advances 8 triangles x 128 pixels. Each sublane keeps an
independent (depth, lowest-pair) winner; a 3-op masked fold merges the 8
sublane candidates at tile end. This is ~6x less vector work per pair than
evaluating one triangle over an 8x128 tile, and the group loop is bounded
by the tile's live count (empty slots cost nothing).

Tie rule without branches: the pack stage stores eps_i = 1e-35 for edges
that accept E==0 (top-left rule) and the kernel tests ``E + eps_i > 0``.
1e-35 is normal in f32 (no FTZ flush) and far below any nonzero |E| the
setup FMAs can produce, so the biased test is bit-exact with
``(E > 0) | ((E == 0) & tie)`` — asserted against the brute-force model in
tests/test_pallas_raster.py.

With ``attr_planes`` the kernel also interpolates the winner's vertex
attributes in-register (pos3 | normal3 | uv2 as rational planes
sum(E_i u_i)/sum(E_i)), replacing the deferred resolve stage's per-pixel
vertex gathers with per-triangle plane math.

This is the TPU translation of the reference's hot loop
(``RenderScene::RenderBasePass`` draw calls -> fragment coverage): instead
of one triangle at a time through a hardware rasterizer, tiles process
their bins with all VPU lanes covering pixels and all sublanes covering
triangles.

Winner semantics match ``reference_raster`` exactly (LessOrEqual +
lowest-id ties; ids ascend within a bin and within each sublane's
subsequence; the final fold breaks equal depths by lowest pair index).
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
_BIG_F = float(2 ** 30)   # fold sentinel: exact f32, above any id float
_TIE_EPS = 1e-35          # normal f32; survives TPU FTZ, vanishes vs any |E|
CHUNK = 64                # pairs per DMA slab
GROUP = 8                 # pair ROWS evaluated per step (across sublanes)
TILE_H = 8                # subtile pixel rows
TILE_W = 32               # subtile pixel cols (TILE_H * TILE_W = 256 lanes; 2
                          # vregs/op — measured better than the 1-vreg 8x16:
                          # per-TILE fixed cost (~0.6 us: carry init, fold,
                          # store, DMA admin) dominates the walk, so halving
                          # the tile count beats the extra pair-pixel lanes,
                          # and wider tiles also shrink bbox spans => fewer
                          # pairs through sort+pack)
TILES_PER_PROGRAM = 8     # tile slots per program (amortizes ~0.5 us/program
#                           grid + block-DMA overhead; see _raster_kernel)
N_ATTRS = 8               # pos3 | normal3 | uv2
TRI_COL = 18              # triangle id as an exact integer-valued f32
MAT_COL = 19              # material id as an exact integer-valued f32
ATTR0 = 20                # first attribute-plane column
# ids ride as integer-valued FLOATS, not bitcasts: bit patterns of small
# ints are f32 DENORMALS, and TPU hardware flushes denormals to zero in
# the vector path (interpret mode does not — a hardware-only corruption).
# Integer-valued floats are exact below 2^24 and always normal-or-zero.
#
# Pair packing: HBM DMA slices must span full 128-lane tiles, so rows are
# 128 f32 wide — but a PAIR needs only 20 + 3*n_attrs columns. Several
# pairs therefore share each 128-lane row (the kernel is DMA-bound;
# PERF.md): a pair's column block is the next divisor of 128 that fits,
#   depth-only (20 cols)       -> 32-col blocks, 4 pairs/row
#   TSS attrs   (20+12 = 32)   -> 32-col blocks, 4 pairs/row
#   full attrs  (20+24 = 44)   -> 64-col blocks, 2 pairs/row
# Pair p lives at row p // P, column block p % P.


def _cols_per_pair(n_attrs: int) -> int:
    """Column block per pair: smallest divisor of 128 fitting the layout."""
    need = ATTR0 + 3 * n_attrs
    for c in (32, 64, 128):
        if need <= c:
            return c
    raise ValueError(f"pair layout needs {need} > 128 columns")


def attribute_planes(setup: TriSetup, vo=None, tri_vidx=None,
                     corners=None) -> jnp.ndarray:
    """[T,24] f32 rational attribute planes: column triplet 3k..3k+2 is
    arow_k = sum_i u_ik * e_i, so attr_k(p) = (arow_k . p) / sum(E_i).

    ``corners``: the STATIC [T,3,8] per-corner attr table from
    ``scene.upload`` (zero per-frame gathers); else gathered from
    ``vo``/``tri_vidx``."""
    if corners is None:
        vattr = jnp.concatenate([vo.world_pos, vo.world_normal, vo.uv],
                                axis=-1)
        corners = vattr[tri_vidx]             # [T,3,8]
    e = setup.coef[:, 0:3, :]                 # [T,3(edges),3(xyc)]
    planes = (corners[:, :, :, None] * e[:, :, None, :]).sum(1)  # [T,8,3]
    return planes.reshape(planes.shape[0], 3 * N_ATTRS)


_NFB = 8                  # first-chunk DMA ring depth (per-tile lookahead)
_NCB = 2                  # continuation-chunk double buffer (within a tile)


def _raster_kernel(
    # scalar prefetch
    tile_map_ref, starts_ref, counts_ref, org_ref, y0_ref,
    # inputs (HBM + optional VMEM bounds block)
    pair_data_hbm, *rest,
    tile_h: int, tile_w: int, width: int, full_height: int, ntx: int,
    n_slots: int, chunk: int, peel: bool, n_attrs: int, cpp: int,
    nt: int, dual: bool = False,
):
    ppr = 128 // cpp                          # pairs per 128-lane row
    rest = list(rest)
    bounds_ref = rest.pop(0) if peel else None
    out_ref = rest.pop(0)   # [1, NT, 5|13, npx]: per tile slot j:
    #                          depth | tri_f | mat_f | bary2 [| attrs8]
    data_buf, sems = rest

    pid = pl.program_id(0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, tile_h * tile_w), 1)
    lx = (lane % tile_w).astype(jnp.float32)
    ly = (lane // tile_w).astype(jnp.float32)
    sub = jax.lax.broadcasted_iota(jnp.int32, (GROUP, 1), 0)     # (8,1)
    shape = (GROUP, tile_h * tile_w)
    interp = n_attrs > 0
    n_num = n_attrs if interp else 2
    npx_ = tile_h * tile_w
    pp_ = 3 + n_num                     # planes per layer
    one_ = jnp.ones((1, npx_), jnp.float32)
    zero_ = jnp.zeros((pp_ - 2, npx_), jnp.float32)
    lay_ = jnp.concatenate([one_, -one_, zero_], axis=0)
    empty_blk = jnp.concatenate([lay_, lay_], axis=0) if dual else lay_

    # Each program owns ``nt`` consecutive tile SLOTS (grid-iteration and
    # block-DMA overhead is ~0.5 us/program; amortized over nt tiles).
    # Slot s's tile comes from the scalar-prefetched map (identity+clamp
    # on dense grids, top-k covered tiles on sparse peels).
    #
    # DMA pipelining: slot s's FIRST chunk lands in ring buffer s % _NFB,
    # issued _NFB tiles ahead (tile s-_NFB issues it at its end, so ~8
    # copies are always in flight — a 1-deep lookahead left ~0.5 us/tile
    # of DMA-latency stall at typical 35-pair bins). Continuation chunks
    # (step >= 1, rare) double-buffer in slots _NFB + (step-1) % _NCB,
    # issued one step ahead within the tile; buffer lifetimes never cross
    # a tile boundary, so the two rings are independent and no phase
    # bookkeeping is needed.
    def slot_first_dma(s):
        """DMA of slot s's first chunk into ring slot s % _NFB."""
        t_ = tile_map_ref[s]
        st = starts_ref[t_]
        b0 = (st // GROUP) * GROUP
        return pltpu.make_async_copy(
            pair_data_hbm.at[pl.ds(b0 // ppr, chunk // ppr), :],
            data_buf.at[s % _NFB], sems.at[s % _NFB])

    def issue_first(s):
        """Guarded issue of slot s's first chunk (skip empty tiles)."""
        @pl.when((s < n_slots) & (counts_ref[tile_map_ref[
            jnp.minimum(s, n_slots - 1)]] > 0))
        def _():
            slot_first_dma(jnp.minimum(s, n_slots - 1)).start()

    for j in range(nt):
        s = pid * nt + j
        tile = tile_map_ref[s]
        start = starts_ref[tile]
        count = counts_ref[tile]
        base0 = (start // GROUP) * GROUP      # sublane-aligned DMA floor
        span_end = start + count
        n_steps = jnp.where(count > 0,
                            (span_end - base0 + chunk - 1) // chunk, 0)

        # per-slot pixel origin, packed host-side (oy<<16|ox): integer
        # div/mod on the scalar core is a multi-cycle slice of the
        # ~0.28 us/tile fixed cost
        org = org_ref[s]
        org_x = org & 0xFFFF
        org_y = (org >> 16) + y0_ref[0]
        px = org_x.astype(jnp.float32) + lx + (0.5 - width * 0.5)  # (1,128)
        py = org_y.astype(jnp.float32) + ly + (0.5 - full_height * 0.5)

        if peel:
            prev_d = bounds_ref[0, j, 0, :].reshape(1, -1)  # nearest peel
            zmax = bounds_ref[0, j, 1, :].reshape(1, -1)    # opaque bound

        def buf_of(step, s=s):
            # step 0 -> first-chunk ring; steps >= 1 -> continuation pair
            return jnp.where(step == 0, s % _NFB,
                             _NFB + (step - 1) % _NCB)

        def dma(step, base0=base0, buf_of=buf_of):
            off = (base0 + step * chunk) // ppr   # slab offset in ROWS
            b = buf_of(step)
            return pltpu.make_async_copy(
                pair_data_hbm.at[pl.ds(off, chunk // ppr), :],
                data_buf.at[b], sems.at[b])

        if j == 0:
            # bootstrap the ring: the first program fills the whole
            # lookahead window (later programs inherit it from their
            # predecessors — grid iterations run in order on one core)
            @pl.when(pid == 0)
            def _():
                for i in range(_NFB):
                    issue_first(jnp.int32(i))

        def chunk_body(step, carry, dma=dma, buf_of=buf_of, base0=base0,
                       n_steps=n_steps, span_end=span_end, start=start,
                       px=px, py=py,
                       prev_d=prev_d if peel else None,
                       zmax=zmax if peel else None):
            slot = buf_of(step)

            @pl.when(step + 1 < n_steps)
            def _():
                dma(step + 1).start()

            dma(step).wait()

            cbase = base0 + step * chunk
            # one group-step reads GROUP rows = GROUP * ppr pairs: sublane
            # su of column block k evaluates pair cbase + (8g + su)*ppr + k
            gsz = GROUP * ppr
            n_groups = jnp.clip((span_end - cbase + gsz - 1) // gsz,
                                0, chunk // gsz)

            def group_body(g, cr):
                cg = data_buf[slot, pl.ds(GROUP * g, GROUP), :]   # (8, 128)
                for k in range(ppr):
                    c0 = k * cpp
                    dmin, trif, matf, esum_c = (cr[0], cr[1], cr[2], cr[3])
                    num_c = list(cr[4:4 + n_num])  # bary/attr NUMERATORS
                    if dual:
                        (d2, tri2, mat2, es2) = cr[4 + n_num:8 + n_num]
                        num2 = list(cr[8 + n_num:])

                    e0 = cg[:, c0+0:c0+1] * px + cg[:, c0+1:c0+2] * py + cg[:, c0+2:c0+3]
                    e1 = cg[:, c0+3:c0+4] * px + cg[:, c0+4:c0+5] * py + cg[:, c0+5:c0+6]
                    e2 = cg[:, c0+6:c0+7] * px + cg[:, c0+7:c0+8] * py + cg[:, c0+8:c0+9]
                    zn = cg[:, c0+9:c0+10] * px + cg[:, c0+10:c0+11] * py + cg[:, c0+11:c0+12]
                    wn = cg[:, c0+12:c0+13] * px + cg[:, c0+13:c0+14] * py + cg[:, c0+14:c0+15]
                    # coverage in RATIONAL space (zn>=0, zn<=wn replace
                    # d-bounds; min-fold replaces 3 cmp + 2 and), and NO
                    # idx-span test: slots outside [start, span_end) hold
                    # either a NEIGHBOR tile's pairs — screen-space planes
                    # are globally valid, and any pair covering a pixel
                    # here is also in THIS tile's span (bbox binning), so
                    # drawing it is correct — or zeroed rows (dead/padding,
                    # see the pack), whose coverage self-voids (0 > 0).
                    emin = jnp.minimum(
                        e0 + cg[:, c0+15:c0+16],
                        jnp.minimum(e1 + cg[:, c0+16:c0+17],
                                    e2 + cg[:, c0+17:c0+18]))
                    d = zn / wn   # wn<=0 never covers; inf/NaN cmp = False
                    cover = ((emin > 0) & (wn > 0)
                             & (zn >= 0) & (zn <= wn))
                    if peel:
                        cover = cover & (d > prev_d) & (d <= zmax)
                    take = cover & (d < dmin)
                    if dual:
                        # two-layer depth peel in ONE pass over the pairs:
                        # slot 1 tracks the nearest fragment, slot 2 the
                        # nearest STRICTLY behind slot 1 (equal depths are
                        # excluded, matching the two-pass d > prev rule);
                        # a new slot-1 winner demotes the old one.
                        take2 = cover & (d > dmin) & (d < d2)
                        d2 = jnp.where(take, dmin, jnp.where(take2, d, d2))
                        tri2 = jnp.where(take, trif,
                                         jnp.where(take2, cg[:, c0+TRI_COL:c0+TRI_COL+1], tri2))
                        mat2 = jnp.where(take, matf,
                                         jnp.where(take2, cg[:, c0+MAT_COL:c0+MAT_COL+1], mat2))
                    dmin = jnp.where(take, d, dmin)
                    # the TRIANGLE id is the tie-break tracker: within a
                    # sublane's (g, k) sequence pair slots ascend, and the
                    # sort key orders tris ascending inside a tile, so
                    # strict-less keeps the lowest tri on exact depth ties
                    # (brute-force semantics); the cross-sublane fold ties
                    # by lowest tri too. Ids ride as exact integer floats.
                    trif = jnp.where(take, cg[:, c0+TRI_COL:c0+TRI_COL+1], trif)
                    matf = jnp.where(take, cg[:, c0+MAT_COL:c0+MAT_COL+1], matf)
                    # rational attributes: carry the winner's NUMERATORS
                    # and edge sum; the single 1/esum divide happens at
                    # tile end (same product = bit-identical results,
                    # ~10 fewer instructions per 8-pair group step)
                    esum = e0 + e1 + e2
                    if dual:
                        es2 = jnp.where(take, esum_c,
                                        jnp.where(take2, esum, es2))
                    esum_c = jnp.where(take, esum, esum_c)
                    nums = []
                    ni = 0
                    if not interp:
                        # bary numerators (only consumed when the resolve
                        # stage runs, i.e. no in-kernel attrs)
                        nums = [e0, e1]
                        ni = 2
                    for a in range(n_attrs):
                        a0 = c0 + ATTR0 + 3 * a
                        nums.append(cg[:, a0:a0+1] * px
                                    + cg[:, a0+1:a0+2] * py
                                    + cg[:, a0+2:a0+3])
                    if dual:
                        for i, nv in enumerate(nums):
                            num2[i] = jnp.where(take, num_c[i],
                                                jnp.where(take2, nv, num2[i]))
                    for i, nv in enumerate(nums):
                        num_c[i] = jnp.where(take, nv, num_c[i])
                    cr = (dmin, trif, matf, esum_c, *num_c)
                    if dual:
                        cr = cr + (d2, tri2, mat2, es2, *num2)
                return cr

            return jax.lax.fori_loop(0, n_groups, group_body, carry)

        dmin0 = jnp.ones(shape, jnp.float32)
        z0 = jnp.zeros(shape, jnp.float32)
        slot_init = ((dmin0, jnp.full(shape, -1.0, jnp.float32),
                      z0, z0) + tuple(z0 for _ in range(n_num)))
        init = slot_init + slot_init if dual else slot_init
        out = jax.lax.fori_loop(0, n_steps, chunk_body, init)

        # our first-chunk ring buffer (s % _NFB) is free again: hand it to
        # slot s + _NFB (keeps ~_NFB first-chunk copies in flight)
        issue_first(s + _NFB)

        def fold(dc, trid, matd, esumd, numsd, cand_gt=None):
            """Fold the 8 per-sublane candidates: min depth, then lowest
            TRIANGLE id among equal depths (exact f32 equality — same
            rounded; tri order == pair order inside a tile, and it is the
            brute-force tie rule). ``cand_gt``: for the dual second layer,
            only depths STRICTLY greater than the layer-1 winner are
            candidates."""
            if cand_gt is not None:
                dc = [jnp.where(c > cand_gt, c, 2.0) for c in dc]
            dwin = jnp.min(dc[0], axis=0, keepdims=True)          # (1,128)
            for c in dc[1:]:
                dwin = jnp.minimum(dwin, jnp.min(c, axis=0, keepdims=True))
            triwin = jnp.full((1, shape[1]), _BIG_F, jnp.float32)
            meqs = []
            for c, tr in zip(dc, trid):
                meq = c == dwin
                meqs.append(meq)
                triwin = jnp.minimum(
                    triwin, jnp.min(jnp.where(meq, tr, _BIG_F),
                                    axis=0, keepdims=True))
            planes = [None, None, None]
            esum_w = jnp.zeros((1, shape[1]), jnp.float32)
            mat_w = jnp.full((1, shape[1]), _BIG_F, jnp.float32)
            nums_w = [jnp.zeros((1, shape[1]), jnp.float32)
                      for _ in range(n_num)]
            for meq, tr, ma, es, nu in zip(meqs, trid, matd, esumd, numsd):
                # duplicate overhang copies of the winning tri can match
                # m2 twice: min-select the mat (copies agree); the
                # esum/nums doubling cancels in the rational divide
                m2 = meq & (tr == triwin)
                mat_w = jnp.minimum(mat_w, jnp.min(
                    jnp.where(m2, ma, _BIG_F), axis=0, keepdims=True))
                m2f = m2.astype(jnp.float32)
                esum_w = esum_w + jnp.sum(es * m2f, axis=0, keepdims=True)
                for i, nv in enumerate(nu):
                    nums_w[i] = nums_w[i] + jnp.sum(nv * m2f, axis=0,
                                                    keepdims=True)
            inv_w = 1.0 / jnp.where(esum_w == 0, 1.0, esum_w)
            none_ = triwin < 0
            planes[0] = jnp.where(none_, 1.0, dwin) if cand_gt is not None \
                else dwin
            planes[1] = jnp.where(none_, -1.0, triwin)
            planes[2] = jnp.where(mat_w == _BIG_F, 0.0, mat_w)
            return planes + [nv * inv_w for nv in nums_w], dwin

        # ONE (n_planes, 128) store per tile instead of n_planes separate
        # (1,128) stores (per-store overhead was a measurable slice of the
        # ~0.28 us/tile serial cost). The m2 sums are exact: at most one
        # nonzero term. The deferred rational divide lands here: one
        # reciprocal per tile instead of one per group step.
        @pl.when(count > 0)
        def _():
            o1 = out[:4 + n_num]
            planes, dwin1 = fold([o1[0]], [o1[1]], [o1[2]],
                                 [o1[3]], [list(o1[4:])])
            if dual:
                o2 = out[4 + n_num:]
                # layer-2 candidates: each sublane's demoted second-best
                # AND the layer-1 losers strictly behind the global winner
                planes2, _ = fold([o1[0], o2[0]], [o1[1], o2[1]],
                                  [o1[2], o2[2]], [o1[3], o2[3]],
                                  [list(o1[4:]), list(o2[4:])],
                                  cand_gt=dwin1)
                planes = planes + planes2
            out_ref[0, j] = jnp.concatenate(planes, axis=0)

        # empty tile: skip the ~45-op fold and store the clear block
        # (depth 1.0, tri -1, everything else 0) — a real fraction of
        # tiles on shadow grids (4096^2 maps) and sparse scenes
        @pl.when(count == 0)
        def _():
            out_ref[0, j] = empty_blk


def _merged_kernel(
    # scalar prefetch
    starts_ref, counts_ref, starts2_ref, counts2_ref, org_ref, y0_ref,
    # inputs (both pair tables, HBM)
    pair_data_hbm, pair_data2_hbm,
    # output + scratch
    out_ref, data_buf, sems,
    *, tile_h: int, tile_w: int, width: int, full_height: int,
    n_slots: int, chunk: int, n_attrs: int, n_attrs_b: int, cpp: int,
    nt: int,
):
    """Opaque base pass + TWO translucent peel layers in ONE tile walk.

    Table 1 (opaque) runs the single-winner tracker; table 2 (the small
    blend draw list) runs the dual two-min tracker with NO depth bounds —
    the opaque-occlusion test (d <= opaque depth) applies at the fold,
    which is exact: occluded blend fragments are strictly deeper than
    every visible one, so they can only occupy tracker slots when fewer
    than two visible fragments exist, and the fold's cap then voids them.
    This folds the former dual-peel launch's entire per-tile walk (its
    dominant cost: 16200 tiles for ~66k pairs at the headline) into the
    opaque pass, and the peel-bounds input disappears entirely.

    Dense grids only (the opaque pass needs every tile; slots map 1:1 to
    tiles).
    """
    ppr = 128 // cpp
    assert n_attrs > 0, "merged kernel serves the TSS interp path"
    # stream B (the peels) may interpolate a PREFIX of the packed attrs:
    # pre-shaded peels consume chart_uv only, so uv's plane FMAs + dual
    # select chains (and two live vregs per layer) drop out of the group
    # loop. The pair table layout is shared (cpp from the full count).
    n_num = n_attrs
    n_num_b = n_attrs_b
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, tile_h * tile_w), 1)
    lx = (lane % tile_w).astype(jnp.float32)
    ly = (lane // tile_w).astype(jnp.float32)
    sub = jax.lax.broadcasted_iota(jnp.int32, (GROUP, 1), 0)
    shape = (GROUP, tile_h * tile_w)
    npx_ = tile_h * tile_w
    pp_ = 3 + n_num
    ppb_ = 3 + n_num_b
    one_ = jnp.ones((1, npx_), jnp.float32)
    empty2_lay = jnp.concatenate(
        [jnp.concatenate([one_, -one_,
                          jnp.zeros((ppb_ - 2, npx_), jnp.float32)], axis=0)
         ] * 2, axis=0)
    pid = pl.program_id(0)

    # stream DMA rings: A (opaque) buffers [0, _NFB+_NCB); B (blend)
    # buffers [_NFB+_NCB, 2(_NFB+_NCB)) — same scheme as _raster_kernel
    nb1 = _NFB + _NCB

    def first_dma(stream, s):
        tbl = pair_data_hbm if stream == 0 else pair_data2_hbm
        st = (starts_ref if stream == 0 else starts2_ref)[s]
        b0 = (st // GROUP) * GROUP
        buf = s % _NFB + stream * nb1
        return pltpu.make_async_copy(
            tbl.at[pl.ds(b0 // ppr, chunk // ppr), :],
            data_buf.at[buf], sems.at[buf])

    def issue_first(stream, s):
        cnts = counts_ref if stream == 0 else counts2_ref
        @pl.when((s < n_slots) & (cnts[jnp.minimum(s, n_slots - 1)] > 0))
        def _():
            first_dma(stream, jnp.minimum(s, n_slots - 1)).start()

    def fold(dc, trid, matd, esumd, numsd, cand_gt=None, cap=None):
        """Cross-sublane winner fold (see _raster_kernel.fold); ``cap``
        voids the winner when its depth exceeds the cap (the merged
        peel-vs-opaque occlusion test)."""
        if cand_gt is not None:
            dc = [jnp.where(c > cand_gt, c, 2.0) for c in dc]
        dwin = jnp.min(dc[0], axis=0, keepdims=True)
        for c in dc[1:]:
            dwin = jnp.minimum(dwin, jnp.min(c, axis=0, keepdims=True))
        # tie-break on the TRIANGLE id (brute-force semantics): pair order
        # ascends with tri id inside a tile (the sort key), so tri ids can
        # replace the former carried pair-index tracker — one less live
        # vreg per layer in the group loop. Untouched sublanes carry
        # tri = -1 with depth 1.0, so triwin < 0 <=> nothing drawn.
        triwin = jnp.full((1, shape[1]), _BIG_F, jnp.float32)
        meqs = []
        for c, tr in zip(dc, trid):
            meq = c == dwin
            meqs.append(meq)
            triwin = jnp.minimum(
                triwin, jnp.min(jnp.where(meq, tr, _BIG_F),
                                axis=0, keepdims=True))
        esum_w = jnp.zeros((1, shape[1]), jnp.float32)
        mat_w = jnp.full((1, shape[1]), _BIG_F, jnp.float32)
        nums_w = [jnp.zeros((1, shape[1]), jnp.float32)
                  for _ in range(len(numsd[0]))]
        for meq, tr, ma, es, nu in zip(meqs, trid, matd, esumd, numsd):
            # duplicate pairs of the SAME tri (DMA overhang from a
            # neighbor's span) can match m2 in two sublanes: min-select
            # the mat (all copies agree) and let the esum/nums doubling
            # cancel in the rational divide below.
            m2 = meq & (tr == triwin)
            mat_w = jnp.minimum(mat_w, jnp.min(
                jnp.where(m2, ma, _BIG_F), axis=0, keepdims=True))
            m2f = m2.astype(jnp.float32)
            esum_w = esum_w + jnp.sum(es * m2f, axis=0, keepdims=True)
            for i, nv in enumerate(nu):
                nums_w[i] = nums_w[i] + jnp.sum(nv * m2f, axis=0,
                                                keepdims=True)
        inv_w = 1.0 / jnp.where(esum_w == 0, 1.0, esum_w)
        none_ = triwin < 0
        if cap is not None:
            none_ = none_ | (dwin > cap)
        dep = jnp.where(none_, 1.0, dwin) if (cand_gt is not None
                                              or cap is not None) else dwin
        planes = [dep, jnp.where(none_, -1.0, triwin),
                  jnp.where(mat_w == _BIG_F, 0.0, mat_w)]
        return planes + [nv * inv_w for nv in nums_w], dwin

    # does ANY of this program's nt tiles have blend pairs? 87% of
    # programs at the headline have none (blend geometry clusters), and
    # for them the whole stream-B tile loop below — loop setup, carry
    # init, branches, per-tile stores — collapses to ONE broadcast store.
    # The measured per-tile fixed cost of this kernel is ~0.6 us (9.5 ms
    # at the 16200-tile 1080p grid with only 7k pairs), so skipped fixed
    # work is the dominant lever, not pair math.
    b_any = counts2_ref[pid * nt] > 0
    for jj in range(1, nt):
        b_any = b_any | (counts2_ref[pid * nt + jj] > 0)

    def tile_px(j):
        s = pid * nt + j
        org = org_ref[s]
        org_x = org & 0xFFFF
        org_y = (org >> 16) + y0_ref[0]
        px = org_x.astype(jnp.float32) + lx + (0.5 - width * 0.5)
        py = org_y.astype(jnp.float32) + ly + (0.5 - full_height * 0.5)
        return s, px, py

    def make_run_stream(s, px, py):
        def run_stream(stream, dual):
            nn = n_num if stream == 0 else n_num_b   # interpolated attrs
            tbl = pair_data_hbm if stream == 0 else pair_data2_hbm
            start = (starts_ref if stream == 0 else starts2_ref)[s]
            count = (counts_ref if stream == 0 else counts2_ref)[s]
            base0 = (start // GROUP) * GROUP
            span_end = start + count
            n_steps = jnp.where(count > 0,
                                (span_end - base0 + chunk - 1) // chunk, 0)

            def buf_of(step):
                return jnp.where(step == 0, s % _NFB,
                                 _NFB + (step - 1) % _NCB) + stream * nb1

            def dma(step):
                off = (base0 + step * chunk) // ppr
                b = buf_of(step)
                return pltpu.make_async_copy(
                    tbl.at[pl.ds(off, chunk // ppr), :],
                    data_buf.at[b], sems.at[b])

            def chunk_body(step, carry):
                slot = buf_of(step)

                @pl.when(step + 1 < n_steps)
                def _():
                    dma(step + 1).start()

                dma(step).wait()
                cbase = base0 + step * chunk
                gsz = GROUP * ppr
                n_groups = jnp.clip((span_end - cbase + gsz - 1) // gsz,
                                    0, chunk // gsz)

                def group_body(g, cr):
                    cg = data_buf[slot, pl.ds(GROUP * g, GROUP), :]
                    for k in range(ppr):
                        c0 = k * cpp
                        dmin, trif, matf, esum_c = (
                            cr[0], cr[1], cr[2], cr[3])
                        num_c = list(cr[4:4 + nn])
                        if dual:
                            (d2, tri2, mat2, es2) = \
                                cr[4 + nn:8 + nn]
                            num2 = list(cr[8 + nn:])

                        e0 = cg[:, c0+0:c0+1] * px + cg[:, c0+1:c0+2] * py + cg[:, c0+2:c0+3]
                        e1 = cg[:, c0+3:c0+4] * px + cg[:, c0+4:c0+5] * py + cg[:, c0+5:c0+6]
                        e2 = cg[:, c0+6:c0+7] * px + cg[:, c0+7:c0+8] * py + cg[:, c0+8:c0+9]
                        zn = cg[:, c0+9:c0+10] * px + cg[:, c0+10:c0+11] * py + cg[:, c0+11:c0+12]
                        wn = cg[:, c0+12:c0+13] * px + cg[:, c0+13:c0+14] * py + cg[:, c0+14:c0+15]
                        # rational-space coverage, no idx-span test — see
                        # _raster_kernel.group_body for the argument
                        emin = jnp.minimum(
                            e0 + cg[:, c0+15:c0+16],
                            jnp.minimum(e1 + cg[:, c0+16:c0+17],
                                        e2 + cg[:, c0+17:c0+18]))
                        d = zn / wn
                        cover = ((emin > 0) & (wn > 0)
                                 & (zn >= 0) & (zn <= wn))
                        take = cover & (d < dmin)
                        if dual:
                            take2 = cover & (d > dmin) & (d < d2)
                            d2 = jnp.where(take, dmin,
                                           jnp.where(take2, d, d2))
                            tri2 = jnp.where(
                                take, trif,
                                jnp.where(take2,
                                          cg[:, c0+TRI_COL:c0+TRI_COL+1],
                                          tri2))
                            mat2 = jnp.where(
                                take, matf,
                                jnp.where(take2,
                                          cg[:, c0+MAT_COL:c0+MAT_COL+1],
                                          mat2))
                        dmin = jnp.where(take, d, dmin)
                        trif = jnp.where(take, cg[:, c0+TRI_COL:c0+TRI_COL+1], trif)
                        matf = jnp.where(take, cg[:, c0+MAT_COL:c0+MAT_COL+1], matf)
                        esum = e0 + e1 + e2
                        if dual:
                            es2 = jnp.where(take, esum_c,
                                            jnp.where(take2, esum, es2))
                        esum_c = jnp.where(take, esum, esum_c)
                        nums = []
                        for a in range(nn):
                            a0 = c0 + ATTR0 + 3 * a
                            nums.append(cg[:, a0:a0+1] * px
                                        + cg[:, a0+1:a0+2] * py
                                        + cg[:, a0+2:a0+3])
                        if dual:
                            for i, nv in enumerate(nums):
                                num2[i] = jnp.where(
                                    take, num_c[i],
                                    jnp.where(take2, nv, num2[i]))
                        for i, nv in enumerate(nums):
                            num_c[i] = jnp.where(take, nv, num_c[i])
                        cr = (dmin, trif, matf, esum_c, *num_c)
                        if dual:
                            cr = cr + (d2, tri2, mat2, es2, *num2)
                    return cr

                return jax.lax.fori_loop(0, n_groups, group_body, carry)

            dmin0 = jnp.ones(shape, jnp.float32)
            z0 = jnp.zeros(shape, jnp.float32)
            slot_init = ((dmin0, jnp.full(shape, -1.0, jnp.float32),
                          z0, z0) + tuple(z0 for _ in range(nn)))
            init = slot_init + slot_init if dual else slot_init
            out = jax.lax.fori_loop(0, n_steps, chunk_body, init)
            return out, count

        return run_stream

    # ---- stream A (opaque): every tile ----
    for j in range(nt):
        s, px, py = tile_px(j)
        if j == 0:
            @pl.when(pid == 0)
            def _():
                for i in range(_NFB):
                    issue_first(0, jnp.int32(i))
                    issue_first(1, jnp.int32(i))

        out_a, count_a = make_run_stream(s, px, py)(0, dual=False)
        # ring: our stream-A first-chunk buffer (s % _NFB) is consumed;
        # hand it to tile s + _NFB. Stream B's ring is kept warm in the
        # B loop / skip branch below (issuing here would race the B loop:
        # buffer (s+_NFB) % _NFB == s % _NFB is still unconsumed)
        issue_first(0, s + _NFB)

        # opaque fold — UNCONDITIONAL: folding the untouched init carries
        # yields exactly the clear block (dwin=1, tri=-1, all sums 0), so
        # the empty-tile branch pair costs more than the fold it skips on
        # this dense grid (most tiles are covered; the sparse shadow
        # grids keep their branch in _raster_kernel)
        planes_a, _ = fold([out_a[0]], [out_a[1]], [out_a[2]],
                           [out_a[3]], [list(out_a[4:])])
        out_ref[0, j, 0:pp_] = jnp.concatenate(planes_a, axis=0)

    # ---- stream B (two peel layers): only when this program has any ----
    @pl.when(b_any)
    def _():
        for j in range(nt):
            s, px, py = tile_px(j)
            out_b, count_b = make_run_stream(s, px, py)(1, dual=True)
            issue_first(1, s + _NFB)
            # opaque winning depth caps both peel layers (occlusion):
            # read back the STORED dep plane (== the fold-A dwin; 1.0
            # where the opaque pass drew nothing)
            dwin_o = out_ref[0, j, 0:1]

            @pl.when(count_b > 0)
            def _():
                o1 = out_b[:4 + n_num_b]
                o2 = out_b[4 + n_num_b:]
                planes1, dwin1 = fold([o1[0]], [o1[1]], [o1[2]],
                                      [o1[3]], [list(o1[4:])], cap=dwin_o)
                planes2, _ = fold([o1[0], o2[0]], [o1[1], o2[1]],
                                  [o1[2], o2[2]], [o1[3], o2[3]],
                                  [list(o1[4:]), list(o2[4:])],
                                  cand_gt=dwin1, cap=dwin_o)
                out_ref[0, j, pp_:pp_ + 2 * ppb_] = jnp.concatenate(
                    planes1 + planes2, axis=0)

            @pl.when(count_b == 0)
            def _():
                out_ref[0, j, pp_:pp_ + 2 * ppb_] = empty2_lay

    @pl.when(jnp.logical_not(b_any))
    def _():
        # no blend pairs anywhere in this program: ONE broadcast store
        # clears both peel layers of all nt tiles, and the B ring is kept
        # warm for downstream programs (all of OUR tiles' counts are 0,
        # so none of their buffers were ever claimed)
        for j in range(nt):
            issue_first(1, pid * nt + j + _NFB)
        out_ref[0, :, pp_:pp_ + 2 * ppb_] = jnp.broadcast_to(
            empty2_lay[None], (nt, 2 * ppb_, npx_))


def rasterize_pallas_merged(setup, height: int, width: int,
                            prepared: PreparedPairs,
                            prepared_blend: PreparedPairs,
                            chunk: int = CHUNK, interpret: bool = False,
                            y0=0, full_height: int | None = None,
                            n_attrs_b: int | None = None):
    """One launch = opaque base pass + two translucent peel layers (see
    ``_merged_kernel``). Both PreparedPairs must carry the same attr
    count. ``n_attrs_b``: peel layers interpolate only this PREFIX of the
    packed attrs (pre-shaded peels consume chart_uv alone — uv's FMAs and
    dual select chains leave the group loop). Returns
    ((g_opaque, attrs), [(g1, a1), (g2, a2)]) with attrs as PLANAR plane
    lists (peel lists are ``n_attrs_b`` long)."""
    tile_h, tile_w = TILE_H, TILE_W
    fh = height if full_height is None else full_height
    ntx = -(-width // tile_w)
    nty = -(-height // tile_h)
    n_tiles = ntx * nty
    npx = tile_h * tile_w
    n_attrs = prepared.n_attrs
    assert n_attrs == prepared_blend.n_attrs and n_attrs > 0
    nab = n_attrs if n_attrs_b is None else min(n_attrs_b, n_attrs)
    cpp = _cols_per_pair(n_attrs)
    gsz = GROUP * (128 // cpp)
    chunk = max(gsz, (chunk // gsz) * gsz)
    chunk = min(chunk, prepared.chunk, prepared_blend.chunk)

    nt = TILES_PER_PROGRAM
    grid_n = -(-n_tiles // nt)
    n_slots = grid_n * nt
    pp = 3 + n_attrs
    ppb = 3 + nab
    n_planes = pp + 2 * ppb

    kernel = functools.partial(
        _merged_kernel,
        tile_h=tile_h, tile_w=tile_w, width=width, full_height=fh,
        n_slots=n_slots, chunk=chunk, n_attrs=n_attrs, n_attrs_b=nab,
        cpp=cpp, nt=nt,
    )

    def padded(a, fill=0):
        if n_slots > n_tiles:
            a = jnp.concatenate(
                [a, jnp.full((n_slots - n_tiles,), fill, a.dtype)])
        return a

    tiles = jnp.arange(n_slots, dtype=jnp.int32)
    tile_org = ((((tiles // ntx) * tile_h) << 16)
                | ((tiles % ntx) * tile_w)).astype(jnp.int32)
    y0_arr = jnp.asarray(y0, jnp.int32).reshape(1)
    args = [padded(prepared.bins.starts), padded(prepared.bins.counts),
            padded(prepared_blend.bins.starts),
            padded(prepared_blend.bins.counts),
            tile_org, y0_arr,
            prepared.pair_data, prepared_blend.pair_data]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=6,
        grid=(grid_n,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM),
                  pl.BlockSpec(memory_space=pltpu.HBM)],
        out_specs=[pl.BlockSpec((1, nt, n_planes, npx),
                                lambda i, *_: (i, 0, 0, 0),
                                memory_space=pltpu.VMEM)],
        scratch_shapes=[
            pltpu.VMEM((2 * (_NFB + _NCB), chunk // (128 // cpp), 128),
                       jnp.float32),
            pltpu.SemaphoreType.DMA((2 * (_NFB + _NCB),)),
        ],
    )
    outs = pl.pallas_call(kernel, grid_spec=grid_spec,
                          out_shape=[jax.ShapeDtypeStruct(
                              (grid_n, nt, n_planes, npx), jnp.float32)],
                          interpret=interpret)(*args)
    blk = outs[0].reshape(n_slots, n_planes, npx)[:n_tiles]

    def untile(a):
        a = a.reshape(nty, ntx, tile_h, tile_w).transpose(0, 2, 1, 3)
        return a.reshape(nty * tile_h, ntx * tile_w)[:height, :width]

    def unpack(lb, has_mat, na):
        tri_id = untile(lb[:, 1]).astype(jnp.int32)
        mat_id = (jnp.where(tri_id >= 0,
                            untile(lb[:, 2]).astype(jnp.int32), 0)
                  if has_mat else None)
        g = GBuffer(untile(lb[:, 0]), tri_id, None, mat_id)
        return g, [untile(lb[:, 3 + a]) for a in range(na)]

    opaque = unpack(blk[:, 0:pp], prepared.has_mat, n_attrs)
    l1 = unpack(blk[:, pp:pp + ppb], prepared_blend.has_mat, nab)
    l2 = unpack(blk[:, pp + ppb:pp + 2 * ppb], prepared_blend.has_mat, nab)
    return opaque, [l1, l2]


def _tile_bounds(peel_bounds, height, width, tile_h, tile_w, nty, ntx):
    """(prev[H,W], zmax[H,W]) -> [n_tiles, 2, th*tw] lane-major rows."""
    prev, zmax = peel_bounds
    ph = nty * tile_h - height
    pw = ntx * tile_w - width

    def tile(a, fill):
        a = jnp.pad(a, ((0, ph), (0, pw)), constant_values=fill)
        a = a.reshape(nty, tile_h, ntx, tile_w).transpose(0, 2, 1, 3)
        return a.reshape(nty * ntx, tile_h * tile_w)

    return jnp.stack([tile(prev, 2.0), tile(zmax, -1.0)], axis=1)


MAT_LIMIT = 1 << 24            # ids must stay exact as integer-valued f32


class PreparedPairs(NamedTuple):
    """Binned + packed pair tables, reusable across raster passes over the
    same geometry+camera (e.g. successive depth-peel layers).

    Registered as a pytree with ``has_mat``/``chunk``/``n_attrs`` as STATIC
    aux data: they steer trace-time decisions (output planes; DMA slab
    bounds; pair column-block width), so they must survive jit boundaries
    as Python values, not tracers."""
    bins: object                 # TileBins
    pair_data: jnp.ndarray       # [P2 // ppr, 128] f32: ppr pairs per row
    pair_aux: object             # always None (kernel selects ids in-register); kept for pytree shape compat
    has_mat: bool                # static: whether mat ids are packed in aux
    chunk: int = CHUNK           # pack-time DMA slab size; P2 was rounded
    #                              for THIS chunk, so raster calls must not
    #                              use a larger one (the last aligned slab
    #                              would read past the table)
    n_attrs: int = 0             # static: attr planes packed per pair


jax.tree_util.register_pytree_node(
    PreparedPairs,
    lambda p: ((p.bins, p.pair_data, p.pair_aux),
               (p.has_mat, p.chunk, p.n_attrs)),
    lambda aux, ch: PreparedPairs(*ch, *aux),
)


def _pack_pairs(setup: TriSetup, bins, tri_offset: int, attr_planes=None,
                tri_mat=None, chunk: int = CHUNK):
    """Gather sorted-pair rows into the kernel's layout — ONE row gather
    per pair, ``128 // cpp`` pairs per 128-lane row (see module header).
    Tie bits become the +eps test columns.

    Returns a PreparedPairs; P2 = budget rounded up so the last aligned DMA
    slab stays in bounds. Dead slots carry zero coefficients => never cover.
    When ``tri_mat`` ([T] i32 material ids) is given and the id spaces fit,
    the material rides the same aux word as the triangle id, so the shading
    pass needs no separate [H,W] material gather."""
    t = setup.coef.shape[0]
    max_pairs = bins.pair_tri.shape[0]

    eps = jnp.where(setup.tie, _TIE_EPS, 0.0).astype(jnp.float32)   # [T,3]
    # ids ride as exact integer-valued floats (see module header: bitcast
    # int patterns are denormals, which TPU hardware flushes to zero);
    # the kernel selects the winner's ids in-register and outputs them,
    # replacing a 7ns/index [H,W] gather per raster pass
    assert t + tri_offset < (1 << 24), "tri ids must stay f32-exact"
    tri_f = (jnp.arange(t, dtype=jnp.int32) + tri_offset).astype(jnp.float32)
    has_mat = tri_mat is not None
    if has_mat:
        mat_f = jnp.clip(tri_mat, 0, MAT_LIMIT - 1).astype(jnp.float32)
    else:
        mat_f = jnp.zeros(t, jnp.float32)
    cols = [setup.coef.reshape(t, 15), eps, tri_f[:, None], mat_f[:, None]]
    n_attrs = 0
    if attr_planes is not None:
        cols.append(attr_planes)
        n_attrs = attr_planes.shape[1] // 3
    cpp = _cols_per_pair(n_attrs)
    ppr = 128 // cpp
    # the DMA slab must hold whole group spans (GROUP rows = 8*ppr pairs)
    gsz = GROUP * ppr
    chunk = max(gsz, (chunk // gsz) * gsz)
    p2 = (-(-max_pairs // chunk)) * chunk + chunk
    rows = jnp.concatenate(cols, axis=-1)
    rows = jnp.pad(rows, ((0, 0), (0, cpp - rows.shape[1])))

    live = jnp.pad(bins.pair_valid, (0, p2 - max_pairs))
    tri = jnp.pad(jnp.clip(bins.pair_tri, 0, t - 1), (0, p2 - max_pairs))
    tri = jnp.where(live, tri, 0)
    pair_data = jnp.where(live[:, None], rows[tri], 0.0)    # [P2, cpp]
    pair_data = pair_data.reshape(p2 // ppr, 128)
    return PreparedPairs(bins, pair_data, None, has_mat, chunk, n_attrs)


def prepare_pallas_pairs(setup: TriSetup, height: int, width: int,
                         tile_h: int = TILE_H, tile_w: int = TILE_W,
                         max_pairs: int | None = None, tri_offset: int = 0,
                         attr_planes=None, tri_mat=None,
                         chunk: int = CHUNK,
                         dense_k: int | None = None) -> PreparedPairs:
    """Bin + pack for ``rasterize_pallas``. Split out so passes over the
    same geometry (successive depth-peel layers) bin and pack once.
    ``dense_k``: scatter-free dense binning (see ``bin_triangles``)."""
    t = setup.coef.shape[0]
    if max_pairs is None:
        max_pairs = 4 * t
    bins = bin_triangles(setup, height, width, tile_h, tile_w, max_pairs,
                         dense_k=dense_k)
    return _pack_pairs(setup, bins, tri_offset, attr_planes, tri_mat, chunk)


def rasterize_pallas(setup: TriSetup, height: int, width: int,
                     tile_h: int = TILE_H, tile_w: int = TILE_W,
                     chunk: int = CHUNK, max_pairs: int | None = None,
                     tri_offset: int = 0, interpret: bool = False,
                     y0=0, full_height: int | None = None,
                     peel_bounds=None, attr_planes=None, tri_mat=None,
                     prepared: PreparedPairs | None = None,
                     active_tiles: int | None = None,
                     peel_layers: int = 1, planar_attrs: bool = False):
    """Bin + pack + Pallas raster. Same G-buffer as ``rasterize_tiled``/
    ``rasterize_reference`` (asserted in tests). ``tile_h * tile_w`` must be
    128 (one vreg of lanes); ``chunk`` is the DMA slab in pairs (multiple
    of 8). ``active_tiles`` runs a sparse grid over only the K
    most-covered tiles (for passes touching a small screen fraction);
    tiles beyond K render empty — callers guard with the covered-tile
    count.

    ``peel_bounds``: optional (prev_depth [H,W], zmax [H,W]) — keep only
    fragments with prev < depth <= zmax (depth-peeling for the sorted
    translucent pass).

    ``attr_planes``: optional [T,24] from ``attribute_planes`` — the kernel
    then interpolates pos/normal/uv for the winner, and the return value is
    (GBuffer, attrs [H,W,8]); otherwise returns (GBuffer, None).

    ``tri_mat``: optional [T] i32 material ids — rides the pair-aux word so
    the G-buffer's ``mat_id`` plane costs no extra gather.

    ``y0``/``full_height`` raster a row slice of a taller virtual viewport
    (multi-chip image-space sharding).

    ``prepared``: a ``prepare_pallas_pairs`` result to reuse (skips binning
    and packing; ``max_pairs``/``tri_offset``/``tri_mat`` are then ignored).

    ``peel_layers=2`` (requires ``peel_bounds``) extracts the TWO nearest
    depth layers in ONE pass over the pairs (the in-kernel two-min tracker
    with demotion) and returns a list of two per-layer results — the
    translucent pass's successive peel launches collapse pairwise, saving
    a full per-tile walk + DMA sweep per pair of layers.
    """
    if tile_h * tile_w != GROUP * TILE_W:
        raise ValueError(f"tile_h*tile_w must be {GROUP * TILE_W}")
    fh = height if full_height is None else full_height

    ntx = -(-width // tile_w)
    nty = -(-height // tile_h)
    n_tiles = ntx * nty
    npx = tile_h * tile_w

    if prepared is None:
        prepared = prepare_pallas_pairs(setup, height, width, tile_h, tile_w,
                                        max_pairs, tri_offset, attr_planes,
                                        tri_mat, chunk)
    bins, pair_data = prepared.bins, prepared.pair_data
    n_attrs = prepared.n_attrs
    interp = n_attrs > 0
    cpp = _cols_per_pair(n_attrs)
    gsz = GROUP * (128 // cpp)        # pairs per group step
    chunk = max(gsz, (chunk // gsz) * gsz)
    if chunk > prepared.chunk:
        # the packed table's P2 was rounded for the pack-time chunk; a
        # larger call-time slab would DMA past it — clamp to the packed one
        chunk = prepared.chunk

    peel = peel_bounds is not None
    dual = peel_layers == 2
    if peel_layers not in (1, 2):
        raise ValueError("peel_layers must be 1 or 2")
    if dual and not peel:
        raise ValueError("peel_layers=2 requires peel_bounds")
    sparse = active_tiles is not None and active_tiles < n_tiles
    n_sel = active_tiles if sparse else n_tiles
    # NT tile slots per program (grid-iteration + block-DMA overhead is
    # ~0.5 us/program — 26 of 30 ms at a 16200-tile 1080p grid before
    # batching); slots beyond n_sel re-process the last tile (harmless
    # duplicates, sliced/overwritten below)
    nt = TILES_PER_PROGRAM
    grid_n = -(-n_sel // nt)
    n_slots = grid_n * nt
    kernel = functools.partial(
        _raster_kernel,
        tile_h=tile_h, tile_w=tile_w,
        width=width, full_height=fh, ntx=ntx, n_slots=n_slots, chunk=chunk,
        peel=peel, n_attrs=n_attrs, cpp=cpp, nt=nt, dual=dual,
    )
    if sparse:
        # sparse grid: run only the top-K covered tiles (translucent peels
        # touch a small screen fraction; empty-tile programs still cost
        # ~1 us each on a dense grid). Ascending order keeps the pair DMAs
        # sequential. Correctness guard: the caller compares K against the
        # covered-tile count (tile_overflow below).
        _, sel = jax.lax.top_k(bins.counts, n_sel)
        tile_map = jnp.sort(sel).astype(jnp.int32)
    else:
        tile_map = jnp.arange(n_tiles, dtype=jnp.int32)
    if n_slots > n_sel:   # pad slots repeat the last selected tile
        tile_map = jnp.concatenate(
            [tile_map, jnp.broadcast_to(tile_map[-1:], (n_slots - n_sel,))])
    in_specs = [pl.BlockSpec(memory_space=pltpu.HBM)]
    if peel:
        # per-slot peel bounds, pre-arranged in slot order ([G, NT, 2, npx])
        # so each program's block is contiguous
        in_specs.append(pl.BlockSpec(
            (1, nt, 2, npx), lambda i, *_: (i, 0, 0, 0),
            memory_space=pltpu.VMEM))
    # plane layout: depth | tri | mat | attrs (interp) or bary2 (resolve);
    # doubled for the dual-peel second layer
    n_planes = (3 + (n_attrs if interp else 2)) * (2 if dual else 1)
    out_specs = [
        pl.BlockSpec((1, nt, n_planes, npx), lambda i, *_: (i, 0, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((grid_n, nt, n_planes, npx), jnp.float32),
    ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(grid_n,),
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=[
            pltpu.VMEM((_NFB + _NCB, chunk // (128 // cpp), 128),
                       jnp.float32),
            pltpu.SemaphoreType.DMA((_NFB + _NCB,)),
        ],
    )
    y0_arr = jnp.asarray(y0, jnp.int32).reshape(1)
    tile_org = ((((tile_map // ntx) * tile_h) << 16)
                | ((tile_map % ntx) * tile_w)).astype(jnp.int32)
    args = [tile_map, bins.starts, bins.counts, tile_org, y0_arr, pair_data]
    if peel:
        tb = _tile_bounds(peel_bounds, height, width, tile_h, tile_w,
                          nty, ntx)
        if sparse or n_slots > n_tiles:
            tb = tb[tile_map]                      # slot order
        args.append(tb.reshape(grid_n, nt, 2, npx))
    outs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
    )(*args)
    blk = outs[0].reshape(n_slots, n_planes, npx)
    pp = n_planes // 2 if dual else n_planes   # planes per layer
    if sparse:
        # scatter slot blocks back to the full tile layout; untouched
        # tiles read as empty (depth clear 1.0, no winner = tri -1);
        # duplicate pad slots rewrite the same tile with the same values
        fill = jnp.zeros((n_planes, 1), jnp.float32)
        for lo in range(0, n_planes, pp):
            fill = fill.at[lo + 0, 0].set(1.0)
            fill = fill.at[lo + 1, 0].set(-1.0)
        full = jnp.broadcast_to(fill[None], (n_tiles, n_planes, npx))
        blk = full.at[tile_map].set(blk)
    else:
        blk = blk[:n_tiles]

    def untile(a):
        a = a.reshape(nty, ntx, tile_h, tile_w).transpose(0, 2, 1, 3)
        return a.reshape(nty * tile_h, ntx * tile_w)[:height, :width]

    def unpack(lb):
        # the kernel outputs the winner's tri/mat ids directly (selected
        # in-register from the pair rows) — no [H,W] gather needed
        tri_id = untile(lb[:, 1]).astype(jnp.int32)  # exact int-val floats
        if prepared.has_mat:
            mat_id = jnp.where(tri_id >= 0,
                               untile(lb[:, 2]).astype(jnp.int32), 0)
        else:
            mat_id = None
        if not interp:
            # bary planes exist only on the resolve path (in-kernel attrs
            # make them dead weight: every consumer reads attrs instead)
            b0 = untile(lb[:, 3])
            b1 = untile(lb[:, 4])
            return GBuffer(untile(lb[:, 0]), tri_id,
                           jnp.stack([b0, b1], axis=-1), mat_id), None
        g = GBuffer(untile(lb[:, 0]), tri_id, None, mat_id)
        if planar_attrs:
            # hand back 2D [H,W] planes: the TSS shade path consumes
            # channels individually, and the minor-A stack + re-slice
            # round trip costs real relayout ms at 1080p
            return g, [untile(lb[:, 3 + a]) for a in range(n_attrs)]
        attrs = jnp.stack([untile(lb[:, 3 + a]) for a in range(n_attrs)],
                          axis=-1)
        return g, attrs

    if dual:
        return [unpack(blk[:, :pp]), unpack(blk[:, pp:])]
    g, attrs = unpack(blk)
    return (g, attrs) if interp else g
