"""Pallas raster kernel vs the brute-force golden model (interpret mode on
CPU; the same kernel compiles for TPU via Mosaic). Covers every kernel
branch: plain depth/id, in-kernel attribute interpolation (attr_planes),
depth peeling (peel_bounds), packed material ids, and budget overflow."""

import numpy as np
import jax.numpy as jnp

from renderengine_tpu.core.config import CullMode
from renderengine_tpu.raster.reference_raster import (rasterize_reference,
                                                      barycentrics_at)
from renderengine_tpu.raster.pallas_raster import (rasterize_pallas,
                                                   attribute_planes,
                                                   prepare_pallas_pairs)
from renderengine_tpu.raster.setup import VertexOutputs

from test_tiled import random_setup


def random_vo(rng, s, n_verts):
    """Random vertex attributes for attribute_planes (clip unused there)."""
    return VertexOutputs(
        world_pos=jnp.asarray(rng.uniform(-5, 5, (n_verts, 3)).astype(np.float32)),
        world_normal=jnp.asarray(rng.uniform(-1, 1, (n_verts, 3)).astype(np.float32)),
        uv=jnp.asarray(rng.uniform(0, 4, (n_verts, 2)).astype(np.float32)),
        clip=None,
    )


class TestPallasMatchesReference:
    def test_exact_match_random(self, rng):
        w, h = 64, 48
        s = random_setup(rng, n=16, w=w, h=h)
        ref = rasterize_reference(s, h, w)
        pal = rasterize_pallas(s, h, w, chunk=8,
                               max_pairs=8192, interpret=True)
        np.testing.assert_array_equal(np.asarray(ref.tri_id), np.asarray(pal.tri_id))
        np.testing.assert_array_equal(np.asarray(ref.depth), np.asarray(pal.depth))

    def test_exact_match_back_cull_odd_extent(self, rng):
        w, h = 53, 37
        s = random_setup(rng, n=12, w=w, h=h, cull=CullMode.BACK)
        ref = rasterize_reference(s, h, w)
        pal = rasterize_pallas(s, h, w, chunk=4,
                               max_pairs=8192, interpret=True)
        np.testing.assert_array_equal(np.asarray(ref.tri_id), np.asarray(pal.tri_id))


class TestPallasSparseTiles:
    def test_active_tiles_matches_dense_when_sufficient(self, rng):
        """Sparse grid over the K most-covered tiles == the dense grid
        whenever K >= covered tiles (the translucent-peel configuration)."""
        import jax.numpy as jnp
        from renderengine_tpu.raster.binning import bin_triangles

        w, h = 64, 48
        s = random_setup(rng, n=12, w=w, h=h)
        bins = bin_triangles(s, h, w, 8, 16, 4096)
        n_active = int(np.asarray((bins.counts > 0).sum()))
        dense = rasterize_pallas(s, h, w, max_pairs=4096, interpret=True)
        sparse = rasterize_pallas(s, h, w, max_pairs=4096, interpret=True,
                                  active_tiles=max(1, n_active))
        np.testing.assert_array_equal(np.asarray(dense.tri_id),
                                      np.asarray(sparse.tri_id))
        np.testing.assert_array_equal(np.asarray(dense.depth),
                                      np.asarray(sparse.depth))


class TestPallasProductionPaths:
    """The branches the headline frame actually runs on TPU."""

    def test_attr_interpolation_matches_barycentric_resolve(self, rng):
        w, h = 48, 32
        n = 14
        s = random_setup(rng, n=n, w=w, h=h)
        vidx = jnp.arange(3 * n, dtype=jnp.int32).reshape(n, 3)
        vo = random_vo(rng, s, 3 * n)
        ap = attribute_planes(s, vo, vidx)
        g, attrs = rasterize_pallas(s, h, w, max_pairs=8192, interpret=True,
                                    attr_planes=ap)
        ref = rasterize_reference(s, h, w)
        np.testing.assert_array_equal(np.asarray(ref.tri_id), np.asarray(g.tri_id))
        # golden attrs: perspective-correct barycentric interpolation
        bary, _ = barycentrics_at(s.coef, ref.tri_id, h, w)
        vattr = jnp.concatenate([vo.world_pos, vo.world_normal, vo.uv], -1)
        corners = vattr[vidx[jnp.maximum(ref.tri_id, 0)]]
        golden = (corners * bary[..., None]).sum(-2)
        covered = np.asarray(ref.tri_id) >= 0
        np.testing.assert_allclose(np.asarray(attrs)[covered],
                                   np.asarray(golden)[covered],
                                   rtol=2e-4, atol=2e-4)

    def test_packed_material_ids(self, rng):
        w, h = 64, 48
        n = 14
        s = random_setup(rng, n=n, w=w, h=h)
        tri_mat = jnp.asarray(rng.integers(0, 9, n).astype(np.int32))
        g = rasterize_pallas(s, h, w, max_pairs=8192, interpret=True,
                             tri_mat=tri_mat)
        ref = rasterize_reference(s, h, w)
        np.testing.assert_array_equal(np.asarray(ref.tri_id), np.asarray(g.tri_id))
        covered = np.asarray(ref.tri_id) >= 0
        expect = np.asarray(tri_mat)[np.asarray(ref.tri_id)[covered]]
        np.testing.assert_array_equal(np.asarray(g.mat_id)[covered], expect)
        assert (np.asarray(g.mat_id)[~covered] == 0).all()

    def test_peel_bounds_matches_reference_peel(self, rng):
        w, h = 64, 48
        s = random_setup(rng, n=16, w=w, h=h)
        opaque = rasterize_reference(s, h, w)
        prev = jnp.full((h, w), -1.0, jnp.float32)
        zmax = opaque.depth
        ref1 = rasterize_reference(s, h, w, peel_bounds=(prev, zmax))
        pal1 = rasterize_pallas(s, h, w, max_pairs=8192, interpret=True,
                                peel_bounds=(prev, zmax))
        np.testing.assert_array_equal(np.asarray(ref1.tri_id), np.asarray(pal1.tri_id))
        # second layer: peel past the first
        prev2 = jnp.where(pal1.tri_id >= 0, pal1.depth, 2.0)
        ref2 = rasterize_reference(s, h, w, peel_bounds=(prev2, zmax))
        pal2 = rasterize_pallas(s, h, w, max_pairs=8192, interpret=True,
                                peel_bounds=(prev2, zmax))
        np.testing.assert_array_equal(np.asarray(ref2.tri_id), np.asarray(pal2.tri_id))

    def test_peel_with_prepared_pairs_and_attrs(self, rng):
        """The exact headline-translucency configuration: one bin+pack
        reused across peel layers, with in-kernel attrs and mat ids."""
        w, h = 48, 32
        n = 10
        s = random_setup(rng, n=n, w=w, h=h)
        vidx = jnp.arange(3 * n, dtype=jnp.int32).reshape(n, 3)
        vo = random_vo(rng, s, 3 * n)
        ap = attribute_planes(s, vo, vidx)
        tri_mat = jnp.asarray(rng.integers(0, 5, n).astype(np.int32))
        prep = prepare_pallas_pairs(s, h, w, max_pairs=4096,
                                    attr_planes=ap, tri_mat=tri_mat)
        prev = jnp.full((h, w), -1.0, jnp.float32)
        zmax = jnp.ones((h, w), jnp.float32)
        g1, attrs1 = rasterize_pallas(s, h, w, interpret=True,
                                      peel_bounds=(prev, zmax),
                                      attr_planes=ap, prepared=prep)
        ref1 = rasterize_reference(s, h, w, peel_bounds=(prev, zmax))
        np.testing.assert_array_equal(np.asarray(ref1.tri_id), np.asarray(g1.tri_id))
        assert attrs1.shape == (h, w, 8)

    def test_budget_overflow_reported_not_crashing(self, rng):
        w, h = 64, 48
        s = random_setup(rng, n=24, w=w, h=h)
        prep = prepare_pallas_pairs(s, h, w, max_pairs=16)
        assert int(prep.bins.n_overflow) > 0
        g = rasterize_pallas(s, h, w, interpret=True, prepared=prep)
        # whatever renders must still be a subset of real triangles
        ids = np.asarray(g.tri_id)
        assert ids.max() < 24 and ids.min() >= -1


class TestPallasDualPeel:
    def test_dual_peel_matches_two_single_peels(self, rng):
        """peel_layers=2 == two successive single-peel launches, including
        attrs/mat ids and the sparse grid (the production blend config)."""
        w, h = 64, 48
        n = 16
        s = random_setup(rng, n=n, w=w, h=h)
        vidx = jnp.arange(3 * n, dtype=jnp.int32).reshape(n, 3)
        vo = random_vo(rng, s, 3 * n)
        ap = attribute_planes(s, vo, vidx)
        tri_mat = jnp.asarray(rng.integers(0, 5, n).astype(np.int32))
        prep = prepare_pallas_pairs(s, h, w, max_pairs=8192,
                                    attr_planes=ap, tri_mat=tri_mat)
        prev = jnp.full((h, w), -1.0, jnp.float32)
        zmax = jnp.ones((h, w), jnp.float32)

        g1, a1 = rasterize_pallas(s, h, w, interpret=True,
                                  peel_bounds=(prev, zmax),
                                  attr_planes=ap, prepared=prep)
        prev2 = jnp.where(g1.tri_id >= 0, g1.depth, 2.0)
        g2, a2 = rasterize_pallas(s, h, w, interpret=True,
                                  peel_bounds=(prev2, zmax),
                                  attr_planes=ap, prepared=prep)

        (d1, da1), (d2, da2) = rasterize_pallas(
            s, h, w, interpret=True, peel_bounds=(prev, zmax),
            attr_planes=ap, prepared=prep, peel_layers=2)
        for single, dual_ in (((g1, a1), (d1, da1)), ((g2, a2), (d2, da2))):
            (gs, asr), (gd, ad) = single, dual_
            np.testing.assert_array_equal(np.asarray(gs.tri_id),
                                          np.asarray(gd.tri_id))
            np.testing.assert_array_equal(np.asarray(gs.depth),
                                          np.asarray(gd.depth))
            np.testing.assert_array_equal(np.asarray(gs.mat_id),
                                          np.asarray(gd.mat_id))
            cov = np.asarray(gs.tri_id) >= 0
            np.testing.assert_array_equal(np.asarray(asr)[cov],
                                          np.asarray(ad)[cov])

    def test_dual_peel_sparse_grid(self, rng):
        from renderengine_tpu.raster.binning import bin_triangles

        w, h = 64, 48
        n = 12
        s = random_setup(rng, n=n, w=w, h=h)
        vidx = jnp.arange(3 * n, dtype=jnp.int32).reshape(n, 3)
        vo = random_vo(rng, s, 3 * n)
        ap = attribute_planes(s, vo, vidx)
        prep = prepare_pallas_pairs(s, h, w, max_pairs=4096, attr_planes=ap)
        bins = bin_triangles(s, h, w, 8, 16, 4096)
        n_active = max(1, int(np.asarray((bins.counts > 0).sum())))
        prev = jnp.full((h, w), -1.0, jnp.float32)
        zmax = jnp.ones((h, w), jnp.float32)
        dense = rasterize_pallas(s, h, w, interpret=True,
                                 peel_bounds=(prev, zmax), attr_planes=ap,
                                 prepared=prep, peel_layers=2)
        sparse = rasterize_pallas(s, h, w, interpret=True,
                                  peel_bounds=(prev, zmax), attr_planes=ap,
                                  prepared=prep, peel_layers=2,
                                  active_tiles=n_active)
        for (gd, _), (gs, _) in zip(dense, sparse):
            np.testing.assert_array_equal(np.asarray(gd.tri_id),
                                          np.asarray(gs.tri_id))
            np.testing.assert_array_equal(np.asarray(gd.depth),
                                          np.asarray(gs.depth))


class TestMergedLaunch:
    def test_merged_frame_matches_separate_launches(self):
        """The merged opaque+dual-peel launch (one tile walk) must render
        the TSS translucent frame bit-exactly like the separate
        opaque + peel launches (the occlusion cap moves from the per-
        fragment test to the fold — exact by the depth-ordering
        argument in _merged_kernel's docstring)."""
        from renderengine_tpu.core.config import RenderConfig, RasterConfig
        from renderengine_tpu.graph import frame as fr
        from renderengine_tpu.graph.frame import FrameRenderer
        from renderengine_tpu.scene import procedural

        w, h = 64, 32
        sc = procedural.sponza_scene(width=w, height=h, n_textures=4,
                                     target_tris=400)
        cfg = RenderConfig(width=w, height=h, shadow_extent=32,
                           texture_space=True, translucency=True,
                           debug_views=False,
                           raster=RasterConfig(pallas_interpret=True,
                                               auto_tune_pairs=False,
                                               pairs_per_tri=8))
        merged = np.asarray(FrameRenderer(sc, cfg, backend="pallas").render())
        fr._FORCE_UNMERGED = True
        try:
            sep = np.asarray(FrameRenderer(sc, cfg, backend="pallas").render())
        finally:
            fr._FORCE_UNMERGED = False
        mismatch = (merged != sep).mean()
        assert mismatch == 0.0, f"merged differs on {mismatch:.2%} of bytes"
