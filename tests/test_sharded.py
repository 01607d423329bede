"""Multi-chip sharded frame must match the single-device frame (CPU mesh
with virtual devices; conftest forces 8)."""

import numpy as np
import jax
import pytest

from renderengine_tpu.core.config import RenderConfig
from renderengine_tpu.graph.frame import FrameRenderer
from renderengine_tpu.parallel import sharded
from renderengine_tpu.scene import procedural


class TestShardedEquivalence:
    def test_two_device_frame_matches_single(self):
        w, h = 64, 32
        sc = procedural.cube_scene(width=w, height=h)
        cfg = RenderConfig(width=w, height=h, shadow_extent=32,
                           translucency=False)

        single = np.asarray(FrameRenderer(sc, cfg, backend="tiled").render())

        mesh = sharded.make_mesh(2)
        fn, scene_dev, params_builder = sharded.build_sharded_renderer(
            sc, cfg, mesh, backend="tiled")
        multi = np.asarray(fn(jax.device_put(scene_dev), params_builder()))

        assert multi.shape == single.shape
        # raster/shading math is identical per pixel; tiny fp differences
        # can only come from the all_gather'd vertex path (same values) —
        # expect bit-exact agreement
        mismatch = (multi != single).mean()
        assert mismatch == 0.0, f"sharded frame differs on {mismatch:.2%} of bytes"

    def test_eight_device_runs(self):
        sc = procedural.sponza_scene(width=64, height=32, n_textures=4,
                                     target_tris=600)
        cfg = RenderConfig(width=64, height=32, shadow_extent=32)
        mesh = sharded.make_mesh(8)
        fn, scene_dev, params_builder = sharded.build_sharded_renderer(
            sc, cfg, mesh, backend="tiled")
        img = np.asarray(fn(jax.device_put(scene_dev), params_builder()))
        assert img.shape == (32, 64, 4)
        assert img.any()

    def test_pallas_full_features_matches_single(self):
        """VERDICT item 4 'done' condition: the sharded frame with the
        PRODUCTION pallas kernel (interpret mode on the CPU mesh) and the
        feature flags on — translucency, grid, skybox, shadows — is
        bit-exact vs the single-chip pallas frame (same _frame_core, row
        slicing through the kernel's y0 path)."""
        import dataclasses

        from renderengine_tpu.core.config import RasterConfig

        w, h = 64, 32
        sc = procedural.sponza_scene(width=w, height=h, n_textures=4,
                                     target_tris=400)
        cfg = RenderConfig(width=w, height=h, shadow_extent=32, grid=True,
                           raster=RasterConfig(pallas_interpret=True,
                                               auto_tune_pairs=False,
                                               pairs_per_tri=8))
        single = np.asarray(FrameRenderer(sc, cfg, backend="pallas").render())

        mesh = sharded.make_mesh(2)
        fn, scene_dev, params_builder = sharded.build_sharded_renderer(
            sc, cfg, mesh, backend="pallas")
        multi = np.asarray(fn(jax.device_put(scene_dev), params_builder()))
        assert multi.shape == single.shape
        mismatch = (multi != single).mean()
        assert mismatch == 0.0, f"sharded differs on {mismatch:.2%} of bytes"

    def test_texture_space_matches_single(self):
        """Texture-space shading under the mesh: the chart SPECULAR pass
        runs row-sharded over the atlas + all_gather (elementwise over
        texels -> exact), the bakes/layout are the shared
        lightchart.setup_scene_tss — bit-exact vs single-chip TSS with
        pre-shaded peels and translucency on."""
        w, h = 64, 32
        sc = procedural.sponza_scene(width=w, height=h, n_textures=4,
                                     target_tris=400)
        cfg = RenderConfig(width=w, height=h, shadow_extent=32,
                           translucency=True, debug_views=False,
                           texture_space=True, tss_preshaded_blend=True,
                           chart_density=1.0)
        single = np.asarray(FrameRenderer(sc, cfg, backend="tiled").render())

        mesh = sharded.make_mesh(2)
        fn, scene_dev, params_builder = sharded.build_sharded_renderer(
            sc, cfg, mesh, backend="tiled")
        multi = np.asarray(fn(jax.device_put(scene_dev), params_builder()))
        assert multi.shape == single.shape
        mismatch = (multi != single).mean()
        assert mismatch == 0.0, f"sharded TSS differs on {mismatch:.2%} of bytes"


class TestCompactionShardInvariance:
    """The repo's design rule: every screen-space compaction (top-K
    selection of screen segments/tiles for a budgeted expensive path)
    must be SHARD-INVARIANT — an image-row sharding computes bit-identical
    selections to the single-chip pass. The rule exists because round-4's
    global 8x128-tile top-k in the tiered aniso sampler broke two-device
    bit-exactness (each shard picked its own top-K); the fix is per-pixel-
    ROW [1,128] segment selection (sampling.select_row_segments) with
    budgets stated in FULL-FRAME units. This sweep turns each compaction
    feature on, including at budgets small enough that the selection
    actually drops work, and asserts two-device == single-chip exactly."""

    CASES = {
        # tiered exact-tap anisotropy on all 4 material slots, budgets
        # small enough that tier selection + isotropic fallback both fire
        "aniso_tiers": dict(max_anisotropy=16,
                            aniso_tile_fracs=(0.25, 0.15, 0.08),
                            translucency=False),
        # two-stage PCF: per-row penumbra segment budget (stated in
        # full-frame tiles — shadow.py converts by the FULL height)
        "penumbra_budget": dict(max_anisotropy=1, translucency=False,
                                penumbra_tile_budget=4, shadow_extent=64),
        # sparse peel-layer shading: per-band tile budgets sized from the
        # same screen fraction; exact while per-band coverage fits the
        # band budget (overflow is counted and re-tuned, frame.py)
        "blend_sparse_tiles": dict(max_anisotropy=1, translucency=True,
                                   translucency_tile_fraction=0.9),
    }

    @pytest.mark.parametrize("case", sorted(CASES))
    def test_two_device_bit_exact(self, case):
        w, h = 256, 32
        sc = procedural.sponza_scene(width=w, height=h, n_textures=4,
                                     target_tris=400)
        kw = dict(width=w, height=h, shadow_extent=32, debug_views=False)
        kw.update(self.CASES[case])
        cfg = RenderConfig(**kw)
        single = np.asarray(FrameRenderer(sc, cfg, backend="tiled").render())

        mesh = sharded.make_mesh(2)
        fn, scene_dev, params_builder = sharded.build_sharded_renderer(
            sc, cfg, mesh, backend="tiled")
        multi = np.asarray(fn(jax.device_put(scene_dev), params_builder()))
        assert multi.shape == single.shape
        mismatch = (multi != single).mean()
        assert mismatch == 0.0, \
            f"[{case}] sharded differs on {mismatch:.2%} of bytes"
