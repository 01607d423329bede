"""Tiled rasterizer must match the brute-force golden model exactly."""

import numpy as np
import jax.numpy as jnp

from renderengine_tpu.core.config import CullMode
from renderengine_tpu.raster.setup import triangle_setup
from renderengine_tpu.raster.binning import bin_triangles
from renderengine_tpu.raster.reference_raster import rasterize_reference
from renderengine_tpu.raster.tiled import rasterize_tiled


def random_setup(rng, n=60, w=96, h=80, cull=CullMode.NONE):
    # random triangles in NDC with random depth, some tiny, some large
    scale = rng.uniform(0.02, 1.0, (n, 1, 1)).astype(np.float32)
    center = rng.uniform(-1.1, 1.1, (n, 1, 2)).astype(np.float32)
    tri = center + scale * rng.uniform(-1, 1, (n, 3, 2)).astype(np.float32)
    z = rng.uniform(0.05, 0.95, (n, 3)).astype(np.float32)
    clip = np.concatenate([tri, z[..., None], np.ones((n, 3, 1), np.float32)], axis=-1)
    clip = clip.reshape(-1, 4)
    vidx = np.arange(3 * n, dtype=np.int32).reshape(n, 3)
    return triangle_setup(jnp.asarray(clip), jnp.asarray(vidx), jnp.int32(n), w, h, cull)


class TestBinning:
    def test_bins_cover_valid_triangles(self, rng):
        w = h = 48
        s = random_setup(rng, n=24, w=w, h=h)
        bins = bin_triangles(s, h, w, 8, 16, max_pairs=4096)
        assert int(bins.n_overflow) == 0
        # every valid triangle appears in at least one bin
        binned = set(np.asarray(bins.pair_tri)[np.asarray(bins.pair_valid)])
        for t in np.nonzero(np.asarray(s.valid))[0]:
            assert int(t) in binned
        # counts/starts describe disjoint segments totalling the valid pairs
        assert int(np.asarray(bins.counts).sum()) == int(np.asarray(bins.pair_valid).sum())

    def test_overflow_reported(self, rng):
        s = random_setup(rng, n=40, w=64, h=64)
        bins = bin_triangles(s, 64, 64, 8, 16, max_pairs=8)
        assert int(bins.n_overflow) > 0


class TestTiledMatchesReference:
    def test_exact_match_random(self, rng):
        w, h = 64, 56
        s = random_setup(rng, n=32, w=w, h=h)
        ref = rasterize_reference(s, h, w)
        til = rasterize_tiled(s, h, w, tile_h=8, tile_w=16, chunk=8, max_pairs=8192)
        np.testing.assert_array_equal(np.asarray(ref.tri_id), np.asarray(til.tri_id))
        # winner ids are exact; depth is the same formula but compiled into
        # different fusions (XLA may or may not contract the plane FMAs per
        # backend), so allow a few ulp
        rd = np.asarray(ref.depth).view(np.int32).astype(np.int64)
        td = np.asarray(til.depth).view(np.int32).astype(np.int64)
        assert np.abs(rd - td).max() <= 128, "depth beyond fusion tolerance"

    def test_exact_match_nondivisible_extent(self, rng):
        # odd resolution not a multiple of the tile size
        w, h = 53, 37
        s = random_setup(rng, n=30, w=w, h=h)
        ref = rasterize_reference(s, h, w)
        til = rasterize_tiled(s, h, w, tile_h=8, tile_w=16, chunk=4, max_pairs=8192)
        np.testing.assert_array_equal(np.asarray(ref.tri_id), np.asarray(til.tri_id))

    def test_exact_match_back_cull(self, rng):
        w, h = 64, 64
        s = random_setup(rng, n=50, w=w, h=h, cull=CullMode.BACK)
        ref = rasterize_reference(s, h, w)
        til = rasterize_tiled(s, h, w, tile_h=16, tile_w=16, chunk=16, max_pairs=8192)
        np.testing.assert_array_equal(np.asarray(ref.tri_id), np.asarray(til.tri_id))


class TestCombinedKeySort:
    def test_combined_matches_variadic(self, rng):
        """The u32 combined-key sort path must produce identical TileBins
        to the (key, payload) variadic path."""
        import numpy as np
        import renderengine_tpu.raster.binning as binning
        w = h = 96
        s = random_setup(rng, n=200, w=w, h=h)
        a = bin_triangles(s, h, w, 8, 16, max_pairs=4096)
        binning._FORCE_VARIADIC_SORT = True
        try:
            b = bin_triangles(s, h, w, 8, 16, max_pairs=4096)
        finally:
            binning._FORCE_VARIADIC_SORT = False
        np.testing.assert_array_equal(np.asarray(a.pair_valid),
                                      np.asarray(b.pair_valid))
        pv = np.asarray(a.pair_valid)
        np.testing.assert_array_equal(np.asarray(a.pair_tri)[pv],
                                      np.asarray(b.pair_tri)[pv])
        np.testing.assert_array_equal(np.asarray(a.starts),
                                      np.asarray(b.starts))
        np.testing.assert_array_equal(np.asarray(a.counts),
                                      np.asarray(b.counts))
        assert int(a.n_overflow) == int(b.n_overflow)

    def test_combined_with_overflow(self, rng):
        import numpy as np
        import renderengine_tpu.raster.binning as binning
        s = random_setup(rng, n=80, w=64, h=64)
        a = bin_triangles(s, 64, 64, 8, 16, max_pairs=64)
        binning._FORCE_VARIADIC_SORT = True
        try:
            b = bin_triangles(s, 64, 64, 8, 16, max_pairs=64)
        finally:
            binning._FORCE_VARIADIC_SORT = False
        pv = np.asarray(a.pair_valid)
        np.testing.assert_array_equal(pv, np.asarray(b.pair_valid))
        np.testing.assert_array_equal(np.asarray(a.pair_tri)[pv],
                                      np.asarray(b.pair_tri)[pv])
        np.testing.assert_array_equal(np.asarray(a.counts),
                                      np.asarray(b.counts))
        assert int(a.n_overflow) == int(b.n_overflow) > 0
