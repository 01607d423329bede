"""Render-time reaction to pair-budget overflow: a camera move into a
dense view must not silently lose geometry — the renderer observes the
overflow counter from in-flight frames, doubles the budget and re-jits
(``FrameRenderer._poll_overflow``)."""

import numpy as np

from renderengine_tpu.core.config import RenderConfig, RasterConfig
from renderengine_tpu.core.aabb import AABB
from renderengine_tpu.core import math3d
from renderengine_tpu.graph.frame import FrameRenderer
from renderengine_tpu.scene import procedural
from renderengine_tpu.scene.camera import Camera
from renderengine_tpu.scene.materials import (MaterialInstanceInfo,
                                              MaterialProperties)
from renderengine_tpu.scene.scene import Scene
from renderengine_tpu.scene.lights import Light, LightType


def _dense_scene(w, h, n_quads=3000):
    """Many screen-filling quads stacked in depth: every triangle spans
    every tile, so (tile, tri) pairs = tris x tiles >> the static budget."""
    sc = Scene()
    plane = procedural.make_plane(0.5, normal_axis=2)
    rng = np.random.default_rng(7)
    for i in range(n_quads):
        mat = sc.materials.create_material_instance(MaterialInstanceInfo(
            MaterialProperties(
                base_color=np.array([*rng.uniform(0.2, 1.0, 3), 1.0],
                                    np.float32))))
        # nearest quad LAST (highest triangle id): budget overflow drops
        # high-id pairs, so dropping must visibly change the image
        z = -10.0 + 8.0 * (i + 1) / n_quads
        node = sc.tree.create_node(
            math3d.translate([0, 0, z]) @ math3d.scale([20, 20, 1]),
            AABB.from_points([[-0.5, -0.5, 0], [0.5, 0.5, 0]]))
        p, n, u, idx = plane
        base = sc.meshes.add_vertices(p, n, u)
        sc.meshes.add_mesh(idx + base, mat, node)
    sc.lights.add_light(Light(type=LightType.DIRECTIONAL,
                              color=np.ones(3, np.float32),
                              direction=math3d.normalize([0.0, -0.3, -1.0]),
                              intensity=3.0))
    sc.camera = Camera(eye=np.array([0, 0, 2.0], np.float32),
                       look_at=np.array([0, 0, -5.0], np.float32),
                       up=np.array([0, 1, 0], np.float32),
                       fov_degrees=60.0, near=0.1, far=100.0,
                       width=w, height=h, exposure=1.0)
    return sc


def _cfg(w, h):
    return RenderConfig(
        width=w, height=h, shadows=False, skybox=False, translucency=False,
        raster=RasterConfig(pairs_per_tri=2, auto_tune_pairs=False))


class TestOverflowReaction:
    def test_overflow_triggers_retune_and_recovers(self):
        w, h = 64, 48
        sc = _dense_scene(w, h)

        # ground truth: brute-force reference backend (no binning budget)
        ref = np.asarray(FrameRenderer(sc, _cfg(w, h),
                                       backend="reference").render())

        r = FrameRenderer(sc, _cfg(w, h), backend="tiled")
        r._react_overflow = True
        r._rebuild_frame_fn()
        assert r.binning_stats()["overflow"] > 0, \
            "test setup failed to provoke overflow"

        before = r.config.raster.pairs_per_tri
        img0 = np.asarray(r.render())          # overflowing frame
        assert (img0 != ref).any(), "expected dropped geometry pre-retune"

        # next renders poll the counter; the budget must grow until the
        # image matches the unbudgeted reference exactly
        for _ in range(6):
            img = np.asarray(r.render())
            if (img == ref).all():
                break
        assert r.config.raster.pairs_per_tri > before
        np.testing.assert_array_equal(img, ref)
        assert r.binning_stats()["overflow"] == 0

    def test_absolute_budget_growth(self):
        """The auto-tuned ABSOLUTE pair budget grows by 1.5x on overflow
        (the path the headline bench runs)."""
        import dataclasses

        w, h = 64, 48
        sc = _dense_scene(w, h, n_quads=1200)
        ref = np.asarray(FrameRenderer(sc, _cfg(w, h),
                                       backend="reference").render())
        r = FrameRenderer(sc, _cfg(w, h), backend="tiled")
        r.config = r.config.replace(raster=dataclasses.replace(
            r.config.raster, pair_budget=4096))
        r._react_overflow = True
        r._rebuild_frame_fn()
        before = r.config.raster.pair_budget
        np.asarray(r.render())
        for _ in range(8):
            img = np.asarray(r.render())
            if (img == ref).all():
                break
        assert r.config.raster.pair_budget > before
        np.testing.assert_array_equal(img, ref)
