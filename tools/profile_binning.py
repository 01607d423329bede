#!/usr/bin/env python
"""Micro-breakdown of the binning + pack chain at the headline budget.

Isolates each sub-step of raster/binning.py + the pair pack so the
redesign attacks the真 cost. Run on chip: python tools/profile_binning.py
"""

import argparse
import sys

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=8)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from renderengine_tpu.core import engine
    engine.init()
    from renderengine_tpu.core.config import RenderConfig, RasterConfig
    from renderengine_tpu.graph.frame import FrameRenderer, cached_vertex_outputs
    from renderengine_tpu.graph.uniforms import unpack_params
    from renderengine_tpu.raster.setup import triangle_setup
    from renderengine_tpu.raster import binning as B
    from renderengine_tpu.raster import pallas_raster as pr
    from renderengine_tpu.scene import procedural
    from renderengine_tpu.utils.profiling import time_jitted

    w, h, tris, ntex = 1920, 1080, 260_000, 8
    scene = procedural.sponza_scene(width=w, height=h, n_textures=ntex,
                                    target_tris=tris)
    cfg = RenderConfig(width=w, height=h, shadow_extent=256,
                       translucency=False, shadows=False)
    r = FrameRenderer(scene, cfg, backend="pallas")
    dev = r.scene_dev
    u = jax.device_put(jnp.asarray(r.uniform_for_camera()))
    budget = r.config.raster.pair_budget
    print(f"# budget {budget}", file=sys.stderr)

    params = unpack_params(u, 0)
    vo = jax.jit(lambda d, u: cached_vertex_outputs(
        d, unpack_params(u, 0)["view"], unpack_params(u, 0)["proj"]))(dev, u)
    setup = jax.jit(lambda vo, d: triangle_setup(
        vo.clip, d["tri_vidx"], d["n_opaque"], w, h, cfg.cull_mode))(vo, dev)
    ap_ = jax.jit(lambda s, vo, d: pr.attribute_planes(
        s, vo, d["tri_vidx"]))(setup, vo, dev)

    def stage(name, fn, *a):
        jf = jax.jit(fn)
        t = time_jitted(jf, *a, reps=args.reps)
        print(f"{name:46s} {t['min']*1e3:8.2f} ms (med {t['median']*1e3:.2f})",
              file=sys.stderr)
        return jf(*a)

    ntx = -(-w // pr.TILE_W)
    nty = -(-h // pr.TILE_H)
    n_tiles = ntx * nty
    max_pairs = budget

    # full binning for reference
    stage("bin_triangles (all)", lambda s: B.bin_triangles(
        s, h, w, pr.TILE_H, pr.TILE_W, max_pairs).pair_tri.sum(), setup)
    bins = jax.jit(lambda s: B.bin_triangles(
        s, h, w, pr.TILE_H, pr.TILE_W, max_pairs))(setup)
    print(f"# live pairs {int(np.asarray(bins.pair_valid.sum()))}",
          file=sys.stderr)

    # sub-steps
    def spans_offsets(s):
        bbox = s.bbox
        tx0 = bbox[:, 0] // pr.TILE_W
        ty0 = bbox[:, 1] // pr.TILE_H
        tx1 = bbox[:, 2] // pr.TILE_W
        ty1 = bbox[:, 3] // pr.TILE_H
        nx = tx1 - tx0 + 1
        ny = ty1 - ty0 + 1
        span = jnp.where(s.valid, nx * ny, 0).astype(jnp.int32)
        offsets = jnp.cumsum(span) - span
        return span, offsets, tx0, ty0, nx
    stage("spans+cumsum", lambda s: sum(x.sum() for x in spans_offsets(s)),
          setup)
    span, offsets, tx0, ty0, nx = jax.jit(spans_offsets)(setup)

    stage("segment ids (scatter head + cummax)",
          lambda o, sp: B._segment_ids_from_offsets(o, sp, max_pairs).sum(),
          offsets, span)
    tri = jax.jit(lambda o, sp: B._segment_ids_from_offsets(
        o, sp, max_pairs))(offsets, span)

    def slot_tiles(tri, offsets, nx, tx0, ty0):
        slots = jnp.arange(max_pairs, dtype=jnp.int32)
        rowbase = ty0 * ntx + tx0
        packed_rows = jnp.stack([(offsets << 8) | nx,
                                 (rowbase << 8) | tx0], axis=-1)
        row = packed_rows[tri]
        off_s = row[..., 0] >> 8
        nxv = row[..., 0] & 255
        base_s = row[..., 1] >> 8
        local = slots - off_s
        dy = jnp.floor(local.astype(jnp.float32) / nxv.astype(jnp.float32)).astype(jnp.int32)
        rem = local - dy * nxv
        dy = jnp.where(rem < 0, dy - 1, jnp.where(rem >= nxv, dy + 1, dy))
        dx = local - dy * nxv
        return base_s + dy * ntx + dx
    stage("slot->tile (row gather + arith)",
          lambda t, o, n, x, y: slot_tiles(t, o, n, x, y).sum(),
          tri, offsets, nx, tx0, ty0)
    tile = jax.jit(slot_tiles)(tri, offsets, nx, tx0, ty0)
    total = jnp.minimum(offsets[-1] + span[-1], max_pairs)

    def keyed(tile, tri, total):
        slots = jnp.arange(max_pairs, dtype=jnp.int32)
        key = jnp.where(slots < total, tile, n_tiles).astype(jnp.int32)
        return jax.lax.sort((key, tri), dimension=0, num_keys=1,
                            is_stable=True)
    stage("stable sort (key,tri)",
          lambda t, r, tt: sum(x.sum() for x in keyed(t, r, tt)), tile, tri,
          total)
    sorted_key, sorted_tri = jax.jit(keyed)(tile, tri, total)

    stage("searchsorted segment bounds",
          lambda sk: jnp.searchsorted(
              sk, jnp.arange(n_tiles + 1, dtype=jnp.int32),
              side="left").astype(jnp.int32).sum(), sorted_key)

    stage("pack rows [P2,128] (row gather)",
          lambda s, b, a, m: pr._pack_pairs(s, b, 0, a, m).pair_data.sum(),
          setup, bins, ap_, dev["tri_material"])

    # what would a narrower pack cost?
    t = setup.coef.shape[0]
    rows44 = jnp.concatenate([setup.coef.reshape(t, 15),
                              jnp.zeros((t, 5)), ap_], axis=-1)

    def pack_narrow(rows, bins):
        p2 = (-(-max_pairs // 64)) * 64 + 64
        live = jnp.pad(bins.pair_valid, (0, p2 - max_pairs))
        trx = jnp.pad(jnp.clip(bins.pair_tri, 0, t - 1), (0, p2 - max_pairs))
        trx = jnp.where(live, trx, 0)
        return jnp.where(live[:, None], rows[trx], 0.0)
    stage("pack rows [P2,44] (row gather, no pad)",
          lambda rr, b: pack_narrow(rr, b).sum(), rows44, bins)

    stage("pack transposed [44,P2] (gather axis1)",
          lambda rr, b: pack_narrow(rr, b).T.sum(), rows44, bins)


if __name__ == "__main__":
    main()
