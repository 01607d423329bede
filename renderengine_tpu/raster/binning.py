"""Triangle -> tile binning (device-side, per frame).

The TPU answer to the irregular "draw call" structure: instead of
scan-converting triangles one at a time, we build (tile, triangle) pairs
with a sort — all dense XLA ops:

1. per-triangle covered tile span from its screen bbox
2. exclusive-scan the span sizes -> pair slots
3. each slot finds its triangle by binary search (searchsorted)
4. stable-sort pairs by tile id (payload: triangle id)
5. per-tile segments via searchsorted over the sorted keys

The stable sort preserves ascending triangle ids within a tile, which
keeps the (depth, lowest-id) winner semantics identical to the brute-force
rasterizer.

Pair-table capacity is a static budget; overflow is counted and reported
(``n_overflow``) rather than silently dropped — the reference's analog of
bounded bindless capacity (1024 slots, ``Bindless.h:76``).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import jax

from .setup import TriSetup


# test hook: force the (key, payload) variadic sort path even when the
# combined u32 key would fit (tests assert both paths agree bit-for-bit)
_FORCE_VARIADIC_SORT = False


class TileBins(NamedTuple):
    pair_tri: jnp.ndarray    # [MAX_PAIRS] i32 triangle id (sorted by tile)
    pair_valid: jnp.ndarray  # [MAX_PAIRS] bool
    starts: jnp.ndarray      # [n_tiles] i32 first pair index per tile
    counts: jnp.ndarray      # [n_tiles] i32 pairs per tile
    n_overflow: jnp.ndarray  # scalar i32: pairs that didn't fit the budget
    # pairs of span>dense_k triangles beyond the big-list compaction cap
    # (_BIG_TRI_CAP) — a SEPARATE counter because budget growth cannot fix
    # them (the reaction must grow dense_k instead); always 0 on the
    # fill path
    n_tail: jnp.ndarray | int = 0


def bin_triangles(setup: TriSetup, height: int, width: int,
                  tile_h: int, tile_w: int, max_pairs: int,
                  dense_k: int | None = None) -> TileBins:
    """``dense_k``: enumerate the first k pairs of every triangle DENSELY
    ([T,k] grid, zero scatters) and only the span>k tail through the
    scatter+cummax fills — the two head-scatters are the dominant binning
    cost at camera-pass sizes (2x ~2.4 ms at 261k tris on v5e; the
    cummaxes are ~0.5 ms), and camera spans are small (mean ~2 tiles), so
    the dense grid replaces them with pure vector math plus a slightly
    larger sort. Use None for span-heavy views (the 4096^2 shadow fit
    puts most pairs in the tail, where the dense grid only adds sort
    rows)."""
    ntx = -(-width // tile_w)
    nty = -(-height // tile_h)
    n_tiles = ntx * nty

    bbox = setup.bbox
    tx0 = bbox[:, 0] // tile_w
    ty0 = bbox[:, 1] // tile_h
    tx1 = bbox[:, 2] // tile_w
    ty1 = bbox[:, 3] // tile_h
    nx = (tx1 - tx0 + 1)
    ny = (ty1 - ty0 + 1)
    span = jnp.where(setup.valid, nx * ny, 0).astype(jnp.int32)

    t_ = span.shape[0]
    tri_bits_ = max(1, int(t_ - 1).bit_length())
    tile_bits_ = max(1, int(n_tiles - 1).bit_length())
    if (dense_k is not None and ntx <= 255
            and ((n_tiles + 1) << tri_bits_) <= (1 << 32)
            and tri_bits_ + tile_bits_ <= 32
            and max_pairs < (1 << 23) and not _FORCE_VARIADIC_SORT):
        rowbase_ = ty0 * ntx + tx0
        return _bin_dense(span, nx, ny, rowbase_, n_tiles, ntx, max_pairs,
                          int(dense_k), tri_bits_,
                          setup=setup, tx0=tx0, ty0=ty0,
                          tile_h=tile_h, tile_w=tile_w,
                          width=width, height=height)

    offsets = jnp.cumsum(span) - span            # exclusive scan
    total = offsets[-1] + span[-1]
    n_overflow = jnp.maximum(total - max_pairs, 0)

    slots = jnp.arange(max_pairs, dtype=jnp.int32)
    # triangle owning each slot: last t with offsets[t] <= s. NOT
    # jnp.searchsorted — its default 'scan' method is a sequential binary
    # search costing ~80ms/Mquery on TPU; a scatter of segment heads + a
    # cummax fill is a handful of fast passes instead.
    t_tris = offsets.shape[0]
    tri_bits = max(1, int(t_tris - 1).bit_length())
    rowbase = ty0 * ntx + tx0
    # per-slot triangle data rides head-fills (scatter at segment heads +
    # cummax — per-pair gathers price ~10 ns/index, so every channel that
    # can forward-fill instead of gather saves real ms at 600k budgets):
    #  - tri ids fill directly (strictly increasing across heads);
    #  - c0 = offset<<8 | nx is monotonic (the <<8 jump dominates);
    #  - (tri << ceil(log2 n_tiles)) | rowbase is monotonic because tri
    #    strictly increases across non-empty heads — recovering rowbase
    #    WITHOUT the [P] gather whenever the bit budget fits u32.
    tile_bits = max(1, int(n_tiles - 1).bit_length())
    if ntx <= 255 and max_pairs < (1 << 23) and n_tiles < (1 << 23):
        # two SEPARATE 1-D fills: a combined [T,2] fill measured 2x
        # SLOWER on chip (10.4 vs 8.8 ms at the headline) — the [P,2]
        # cummax/scatter layout packs 2 of 128 vector lanes, so each scan
        # pass wastes 98% of the VPU; 1-D scans pack lanes fully
        c0 = _fill_from_heads(
            ((offsets << 8) | nx).astype(jnp.uint32),
            offsets, span, max_pairs)
        if tri_bits + tile_bits <= 32:
            tb = _fill_from_heads(
                (jnp.arange(t_tris, dtype=jnp.uint32) << tile_bits)
                | rowbase.astype(jnp.uint32), offsets, span, max_pairs)
            tri = (tb >> tile_bits).astype(jnp.int32)
            base_s = (tb & ((1 << tile_bits) - 1)).astype(jnp.int32)
        else:
            tri = _segment_ids_from_offsets(offsets, span, max_pairs)
            base_s = rowbase[tri]                                 # [P]
        off_s = (c0 >> 8).astype(jnp.int32)
        nxv = (c0 & 255).astype(jnp.int32)
    else:
        tri = _segment_ids_from_offsets(offsets, span, max_pairs)
        bin_rows = jnp.stack([offsets, nx, rowbase], axis=-1)
        row = bin_rows[tri]
        off_s = row[..., 0]
        nxv = row[..., 1]
        base_s = row[..., 2]
    local = slots - off_s
    dy = jnp.floor(local.astype(jnp.float32) / nxv.astype(jnp.float32)).astype(jnp.int32)
    rem = local - dy * nxv
    dy = jnp.where(rem < 0, dy - 1, jnp.where(rem >= nxv, dy + 1, dy))
    dx = local - dy * nxv
    tile = base_s + dy * ntx + dx
    slot_valid = slots < jnp.minimum(total, max_pairs)
    key = jnp.where(slot_valid, tile, n_tiles).astype(jnp.int32)  # invalid sorts last

    # combined-key sort when (tile | tri) fits u32: ONE array through the
    # sort network instead of a key+payload pair (~half the sorted bytes;
    # the tri id rides the low bits, so ascending-id-within-tile comes
    # from key order instead of sort stability). 1080p: 16201 tiles << 18
    # id bits = 4.25e9 < 2^32 — the u32 gate matters. Edges use the
    # 'scan_unrolled' binary search — measured 2x the default 'scan'
    # (3.7 vs 7.4 ms at a 582k table / 16k queries).
    if ((n_tiles + 1) << tri_bits <= (1 << 32)) and not _FORCE_VARIADIC_SORT:
        ck = ((key.astype(jnp.uint32) << tri_bits)
              | tri.astype(jnp.uint32))
        sck = jax.lax.sort(ck, dimension=0, is_stable=False)  # keys unique
        sorted_tri = (sck & ((1 << tri_bits) - 1)).astype(jnp.int32)
        sorted_key = (sck >> tri_bits).astype(jnp.int32)
        # (starts, counts) via segment-HEAD positions, not searchsorted:
        # the binary search is 20 SEQUENTIAL latency-bound gather rounds
        # (~4 ms at a 574k table); sorting the head positions instead
        # costs one more u32 sort (~0.4 ms) + 16k-sized gathers/scatters.
        # Segments (distinct sorted keys' tiles, + one invalid-key
        # segment) number <= n_tiles + 1, so the first n_tiles + 1 sorted
        # positions hold every head.
        is_head = jnp.concatenate(
            [jnp.ones((1,), jnp.bool_),
             sorted_key[1:] != sorted_key[:-1]])
        hp = jax.lax.sort(jnp.where(is_head, slots, max_pairs)
                          .astype(jnp.uint32), dimension=0,
                          is_stable=False)[:n_tiles + 1]
        hp = hp.astype(jnp.int32)
        ht = sorted_key[jnp.minimum(hp, max_pairs - 1)]       # tile ids
        hn = jnp.concatenate([hp[1:],
                              jnp.full((1,), max_pairs, jnp.int32)])
        hn = jnp.minimum(hn, max_pairs)
        live = (hp < max_pairs) & (ht < n_tiles)
        idx = jnp.where(live, ht, n_tiles)
        starts = jnp.zeros(n_tiles, jnp.int32).at[idx].max(
            jnp.where(live, hp, 0), mode="drop")
        counts = jnp.zeros(n_tiles, jnp.int32).at[idx].max(
            jnp.where(live, hn - hp, 0), mode="drop")
        return TileBins(sorted_tri, sorted_key < n_tiles, starts, counts,
                        n_overflow)
    else:
        sorted_key, sorted_tri = jax.lax.sort((key, tri), dimension=0,
                                              num_keys=1, is_stable=True)
        # per-tile segments via binary search over the sorted keys:
        # n_tiles+1 queries x log2(P) gather steps — an order of magnitude
        # cheaper than scattering min/add over every pair (measured 14 ms
        # of scatters at a 789k budget vs ~1 ms here)
        edges = jnp.searchsorted(sorted_key,
                                 jnp.arange(n_tiles + 1, dtype=jnp.int32),
                                 side="left",
                                 method="scan_unrolled").astype(jnp.int32)
    starts = edges[:-1]
    counts = edges[1:] - starts
    # empty tiles: make starts well-defined (their count is 0 anyway)
    starts = jnp.where(counts > 0, starts, 0)
    return TileBins(sorted_tri, sorted_key < n_tiles, starts, counts,
                    n_overflow)


_BIG_TRI_CAP = 65536      # compacted span>k triangle list (sorted prefix)


def live_pairs_estimate(setup: TriSetup, height: int, width: int,
                        tile_h: int, tile_w: int, k: int):
    """Post-cull live pair count for ``dense_k`` binning: the dense
    columns apply the same conservative corner test as ``_bin_dense``;
    the span>k tail is assumed fully live. Lets budget auto-tune track
    the culled count instead of the bbox overcount (every unused budget
    slot is a per-frame sort+pack+gather tax)."""
    ntx = -(-width // tile_w)
    bbox = setup.bbox
    tx0 = bbox[:, 0] // tile_w
    ty0 = bbox[:, 1] // tile_h
    nx = bbox[:, 2] // tile_w - tx0 + 1
    ny = bbox[:, 3] // tile_h - ty0 + 1
    span = jnp.where(setup.valid, nx * ny, 0).astype(jnp.int32)
    a_ = setup.coef[:, 0:3, 0]
    b_ = setup.coef[:, 0:3, 1]
    c_ = setup.coef[:, 0:3, 2]
    cpx0 = (tx0 * tile_w + (tile_w - 1) * 0.5 + 0.5
            - width * 0.5).astype(jnp.float32)[:, None]
    cpy0 = (ty0 * tile_h + (tile_h - 1) * 0.5 + 0.5
            - height * 0.5).astype(jnp.float32)[:, None]
    e0 = a_ * cpx0 + b_ * cpy0 + c_
    sx = a_ * float(tile_w)
    sy = b_ * float(tile_h)
    margin = (jnp.abs(a_) * ((tile_w - 1) * 0.5)
              + jnp.abs(b_) * ((tile_h - 1) * 0.5))
    margin = margin + 1e-5 * (jnp.abs(e0) + jnp.abs(sx) + jnp.abs(sy)
                              + margin)
    nxf = nx.astype(jnp.float32)
    live = jnp.maximum(span - k, 0)
    for j in range(k):
        dy = jnp.floor(jnp.float32(j) / nxf).astype(jnp.int32)
        dx = j - dy * nx
        dxf = dx.astype(jnp.float32)[:, None]
        dyf = dy.astype(jnp.float32)[:, None]
        reach = e0 + dxf * sx + dyf * sy + margin
        ok = (j < span) & jnp.all(reach > 0, axis=-1)
        live = live + ok.astype(jnp.int32)
    return live.sum()


def _bin_dense(span, nx, ny, rowbase, n_tiles: int, ntx: int,
               max_pairs: int, k: int, tri_bits: int,
               setup=None, tx0=None, ty0=None,
               tile_h: int = 8, tile_w: int = 32,
               width: int = 0, height: int = 0) -> TileBins:
    """Dense-grid binning (see ``bin_triangles``): pair (t, j) for j <
    min(span, k) comes from a [T,k] vector grid; the span>k tail is
    compacted to <= _BIG_TRI_CAP triangles by one u32 sort, enumerated
    with the (now tiny) head-fills, and both key streams go through ONE
    combined-key sort whose first ``max_pairs`` slots are the budget —
    live keys sort before the invalid sentinel, so slicing preserves the
    exact drop-and-count overflow semantics of the scatter path."""
    t = span.shape[0]
    tris = jnp.arange(t, dtype=jnp.uint32)
    inval = jnp.uint32(n_tiles << tri_bits)

    # exact-coverage cull: bbox binning overcounts ~15-25% at camera tri
    # sizes (a triangle spanning 2x2 tiles usually covers 3). The dense
    # loop runs in TRIANGLE-index space, so the edge planes are at hand
    # with no gather: a conservative corner test — edge value at the tile
    # center plus the tile's worst-case half-extent along the edge
    # normal — voids (t, tile) pairs the triangle cannot touch. Margins
    # are padded by a relative slack (~1e-5 >> 3 ulps) so f32 rounding in
    # the kernel's own edge evaluation can never resurrect a culled
    # pixel; the kernel's DMA-overhang argument stays valid because the
    # test is conservative (any covered pixel keeps its pair).
    if setup is not None:
        a_ = setup.coef[:, 0:3, 0]                # [T,3]
        b_ = setup.coef[:, 0:3, 1]
        c_ = setup.coef[:, 0:3, 2]
        cpx0 = (tx0 * tile_w + (tile_w - 1) * 0.5 + 0.5
                - width * 0.5).astype(jnp.float32)[:, None]   # [T,1]
        cpy0 = (ty0 * tile_h + (tile_h - 1) * 0.5 + 0.5
                - height * 0.5).astype(jnp.float32)[:, None]
        e0 = a_ * cpx0 + b_ * cpy0 + c_                       # [T,3]
        sx = a_ * float(tile_w)
        sy = b_ * float(tile_h)
        margin = (jnp.abs(a_) * ((tile_w - 1) * 0.5)
                  + jnp.abs(b_) * ((tile_h - 1) * 0.5))
        margin = margin + 1e-5 * (jnp.abs(e0) + jnp.abs(sx) + jnp.abs(sy)
                                  + margin)
    else:
        e0 = None

    # dense stream: j is a STATIC column index, so dy = j // nx unrolls to
    # k cheap vector divides (nx <= 255; exact in f32)
    key_cols = []
    live_cols = []
    nxf = nx.astype(jnp.float32)
    for j in range(k):
        dy = jnp.floor(jnp.float32(j) / nxf).astype(jnp.int32)
        dx = j - dy * nx
        tile_j = rowbase + dy * ntx + dx
        ok = j < span          # span==0 for culled tris
        if e0 is not None:
            dxf = dx.astype(jnp.float32)[:, None]
            dyf = dy.astype(jnp.float32)[:, None]
            reach = e0 + dxf * sx + dyf * sy + margin
            ok = ok & jnp.all(reach > 0, axis=-1)
        key_cols.append(jnp.where(
            ok, (tile_j.astype(jnp.uint32) << tri_bits) | tris,
            inval | tris))
        live_cols.append(ok)
    dense_keys = jnp.stack(key_cols, axis=1).reshape(-1)      # [t*k]
    dense_live = jnp.stack(live_cols, axis=1).sum()

    # span>k tail: compact the big triangles to a sorted id prefix
    span_big = jnp.maximum(span - k, 0)
    big_total = span_big.sum()
    sel = jnp.where(span_big > 0, tris, tris | jnp.uint32(1 << 31))
    sel = jax.lax.sort(sel, dimension=0, is_stable=False)[:_BIG_TRI_CAP]
    live_row = (sel >> 31) == 0
    big_tri = (sel & jnp.uint32(0x7FFFFFFF)).astype(jnp.int32)
    big_tri = jnp.minimum(big_tri, t - 1)
    # ONE row gather for (span_big, nx, rowbase) — three separate [CAP]
    # gathers shared the same indices and each paid the per-index cost
    big_rows = jnp.stack([span_big, nx, rowbase], axis=-1)[big_tri]
    b_span = jnp.where(live_row, big_rows[:, 0], 0)           # [CAP]
    b_nx = big_rows[:, 1]
    b_rowbase = big_rows[:, 2]
    kept_total = b_span.sum()                 # spans of tris that fit CAP
    b_off = jnp.cumsum(b_span) - b_span
    # the tail gets the FULL budget: the fills' cost driver was the
    # head-scatter index count (now <= _BIG_TRI_CAP), not the slot count,
    # so a max_pairs-deep tail costs only its cummax (~0.5 ms at 574k).
    # (A max_pairs//4 diet was tried: its overruns feed the budget-growth
    # equation need = budget + dropped, which is wrong for tail drops —
    # the controller then grows past the fill-path steady state.)
    b_budget = max_pairs
    # per-slot (offset, nx) and (tri, rowbase) ride the two head-fills —
    # the scatters now index a 16k table instead of the full draw list
    tile_bits = max(1, int(n_tiles - 1).bit_length())
    c0 = _fill_from_heads(((b_off.astype(jnp.uint32) << 8)
                           | b_nx.astype(jnp.uint32)),
                          b_off, b_span, b_budget)
    # tri in the HIGH bits drives the fill's required monotonicity
    # (compacted ids ascend); rowbase rides the low bits
    tb = _fill_from_heads((big_tri.astype(jnp.uint32) << tile_bits)
                          | b_rowbase.astype(jnp.uint32),
                          b_off, b_span, b_budget)
    s_slots = jnp.arange(b_budget, dtype=jnp.int32)
    off_s = (c0 >> 8).astype(jnp.int32)
    nx_s = jnp.maximum((c0 & 255).astype(jnp.int32), 1)
    tri_s = (tb >> tile_bits)
    base_s = (tb & ((1 << tile_bits) - 1)).astype(jnp.int32)
    jloc = k + (s_slots - off_s)
    dy = jloc // nx_s
    dx = jloc - dy * nx_s
    tile_s = base_s + dy * ntx + dx
    ok_s = s_slots < jnp.minimum(kept_total, b_budget)
    big_keys = jnp.where(ok_s,
                         (tile_s.astype(jnp.uint32) << tri_bits) | tri_s,
                         inval | jnp.uint32(t - 1))
    big_live = jnp.minimum(kept_total, b_budget)

    ck = jnp.concatenate([dense_keys, big_keys])
    if ck.shape[0] < max_pairs:
        ck = jnp.concatenate([ck, jnp.full(max_pairs - ck.shape[0],
                                           inval, jnp.uint32)])
    sck = jax.lax.sort(ck, dimension=0, is_stable=False)[:max_pairs]
    live_total = dense_live + big_live
    n_overflow = (jnp.maximum(kept_total - b_budget, 0)
                  + jnp.maximum(live_total - max_pairs, 0)).astype(jnp.int32)
    n_tail = (big_total - kept_total).astype(jnp.int32)  # big tris past CAP
    return _segments_from_sorted(sck, tri_bits, n_tiles, max_pairs,
                                 n_overflow, n_tail)


def _segments_from_sorted(sck, tri_bits: int, n_tiles: int, max_pairs: int,
                          n_overflow, n_tail=0) -> TileBins:
    """(starts, counts) from a sorted combined-key array via segment-HEAD
    positions (see the comment in ``bin_triangles``)."""
    slots = jnp.arange(max_pairs, dtype=jnp.int32)
    sorted_tri = (sck & ((1 << tri_bits) - 1)).astype(jnp.int32)
    sorted_key = (sck >> tri_bits).astype(jnp.int32)
    is_head = jnp.concatenate(
        [jnp.ones((1,), jnp.bool_),
         sorted_key[1:] != sorted_key[:-1]])
    hp = jax.lax.sort(jnp.where(is_head, slots, max_pairs)
                      .astype(jnp.uint32), dimension=0,
                      is_stable=False)[:n_tiles + 1]
    hp = hp.astype(jnp.int32)
    ht = sorted_key[jnp.minimum(hp, max_pairs - 1)]
    hn = jnp.concatenate([hp[1:],
                          jnp.full((1,), max_pairs, jnp.int32)])
    hn = jnp.minimum(hn, max_pairs)
    live = (hp < max_pairs) & (ht < n_tiles)
    idx = jnp.where(live, ht, n_tiles)
    starts = jnp.zeros(n_tiles, jnp.int32).at[idx].max(
        jnp.where(live, hp, 0), mode="drop")
    counts = jnp.zeros(n_tiles, jnp.int32).at[idx].max(
        jnp.where(live, hn - hp, 0), mode="drop")
    return TileBins(sorted_tri, sorted_key < n_tiles, starts, counts,
                    n_overflow, n_tail)


def count_span_overflow(setup: TriSetup, tile_h: int, tile_w: int,
                        max_pairs: int) -> jnp.ndarray:
    """``TileBins.n_overflow`` without the sort: the (tile, triangle) pair
    total is the bbox span sum, so the overflow count needs no binning —
    used by stat-only paths that would otherwise bin twice."""
    bbox = setup.bbox
    nx = bbox[:, 2] // tile_w - bbox[:, 0] // tile_w + 1
    ny = bbox[:, 3] // tile_h - bbox[:, 1] // tile_h + 1
    total = jnp.where(setup.valid, nx * ny, 0).astype(jnp.int32).sum()
    return jnp.maximum(total - max_pairs, 0)


def _segment_ids_from_offsets(offsets, span, n_out: int):
    """Inverse of an exclusive scan: for each output slot, the segment id
    it belongs to. Scatter each non-empty segment's id at its head
    position (max-combining duplicates), then forward-fill with cummax."""
    t = offsets.shape[0]
    heads = jnp.where(span > 0, offsets, n_out)  # drop empty segments
    seg = jnp.zeros(n_out + 1, jnp.int32).at[heads].max(
        jnp.arange(t, dtype=jnp.int32), mode="drop")[:n_out]
    return jax.lax.cummax(seg)


def _fill_from_heads(values, offsets, span, n_out: int):
    """Forward-fill per-segment ``values`` (which must be MONOTONIC
    non-decreasing across non-empty segment heads) over the slot axis:
    scatter at heads, cummax-fill — the gather-free sibling of
    ``_segment_ids_from_offsets``. ``values`` may be [T] or [T, k]
    (k lanes fill together through one scatter + one scan)."""
    heads = jnp.where(span > 0, offsets, n_out)
    shape = (n_out + 1,) + values.shape[1:]
    v = jnp.zeros(shape, values.dtype).at[heads].max(
        values, mode="drop")[:n_out]
    return jax.lax.cummax(v, axis=0)
