"""Pallas raster kernel vs the brute-force golden model (interpret mode on
CPU; the same kernel compiles for TPU via Mosaic)."""

import numpy as np

from renderengine_tpu.core.config import CullMode
from renderengine_tpu.raster.reference_raster import rasterize_reference
from renderengine_tpu.raster.pallas_raster import rasterize_pallas

from test_tiled import random_setup


class TestPallasMatchesReference:
    def test_exact_match_random(self, rng):
        w, h = 64, 48
        s = random_setup(rng, n=16, w=w, h=h)
        ref = rasterize_reference(s, h, w)
        pal = rasterize_pallas(s, h, w, tile_h=8, tile_w=16, chunk=8,
                               max_pairs=8192, interpret=True)
        np.testing.assert_array_equal(np.asarray(ref.tri_id), np.asarray(pal.tri_id))
        np.testing.assert_array_equal(np.asarray(ref.depth), np.asarray(pal.depth))

    def test_exact_match_back_cull_odd_extent(self, rng):
        w, h = 53, 37
        s = random_setup(rng, n=12, w=w, h=h, cull=CullMode.BACK)
        ref = rasterize_reference(s, h, w)
        pal = rasterize_pallas(s, h, w, tile_h=8, tile_w=16, chunk=4,
                               max_pairs=8192, interpret=True)
        np.testing.assert_array_equal(np.asarray(ref.tri_id), np.asarray(pal.tri_id))
