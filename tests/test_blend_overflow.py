"""Blend-pass budget reaction: a camera facing dense translucent geometry
must not silently lose peel fragments. ``_poll_overflow``'s blend branch
grows the pair/tile/shade budgets until the image converges to the
unbudgeted reference backend; the per-layer shade budgets also re-tune
from OBSERVED coverage (growing fast, shrinking only after a streak of
low-coverage frames)."""

import dataclasses

import numpy as np

from renderengine_tpu.core.config import RenderConfig, RasterConfig
from renderengine_tpu.core.aabb import AABB
from renderengine_tpu.core import math3d
from renderengine_tpu.graph.frame import FrameRenderer
from renderengine_tpu.scene import procedural
from renderengine_tpu.scene.camera import Camera
from renderengine_tpu.scene.materials import (AlphaMode, MaterialInstanceInfo,
                                              MaterialProperties)
from renderengine_tpu.scene.scene import Scene
from renderengine_tpu.scene.lights import Light, LightType


def _banner_scene(w, h, n_banners=24):
    """An opaque backdrop + a stack of translucent quads in front of it:
    two+ peel layers of near-full-screen blend coverage at the 'front'
    camera, zero at the 'away' camera."""
    sc = Scene()
    plane = procedural.make_plane(0.5, normal_axis=2)
    rng = np.random.default_rng(3)

    back = sc.materials.create_material_instance(MaterialInstanceInfo(
        MaterialProperties(base_color=np.array([0.7, 0.7, 0.2, 1.0],
                                               np.float32))))
    node = sc.tree.create_node(
        math3d.translate([0, 0, -12.0]) @ math3d.scale([40, 40, 1]),
        AABB.from_points([[-0.5, -0.5, 0], [0.5, 0.5, 0]]))
    p, n, u, idx = plane
    base = sc.meshes.add_vertices(p, n, u)
    sc.meshes.add_mesh(idx + base, back, node)

    for i in range(n_banners):
        mat = sc.materials.create_material_instance(MaterialInstanceInfo(
            MaterialProperties(
                base_color=np.array([*rng.uniform(0.2, 1.0, 3), 0.5],
                                    np.float32)),
            alpha_mode=AlphaMode.BLEND))
        z = -10.0 + 6.0 * (i + 1) / n_banners
        node = sc.tree.create_node(
            math3d.translate([0, 0, z]) @ math3d.scale([15, 15, 1]),
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


def _cfg(w, h, **kw):
    return RenderConfig(
        width=w, height=h, shadows=False, skybox=False, translucency=True,
        raster=RasterConfig(pairs_per_tri=8, auto_tune_pairs=False), **kw)


def _away_view(sc):
    """Camera turned to empty space (no blend geometry on screen)."""
    from renderengine_tpu.scene.camera import ViewProperties
    cam = sc.camera
    cam.set_camera_view(np.array([0, 0, 2.0], np.float32),
                        np.array([0, 50.0, 30.0], np.float32),
                        np.array([0, 1, 0], np.float32))
    vp = ViewProperties.from_camera(cam)
    cam.set_camera_view(np.array([0, 0, 2.0], np.float32),
                        np.array([0, 0, -5.0], np.float32),
                        np.array([0, 1, 0], np.float32))
    return vp


class TestBlendOverflowReaction:
    def test_blend_budgets_grow_until_image_converges(self):
        w, h = 64, 48
        sc = _banner_scene(w, h)
        ref = np.asarray(FrameRenderer(sc, _cfg(w, h),
                                       backend="reference").render())

        # deliberately starved: tiny pair budget, tiny shade budgets
        r = FrameRenderer(sc, _cfg(
            w, h, blend_pair_budget=64,
            translucency_tile_fraction=0.05,
            blend_layer_tile_budgets=(2, 2)), backend="tiled")
        r._react_overflow = True
        r._rebuild_frame_fn()

        img0 = np.asarray(r.render())          # starved frame
        assert (img0 != ref).any(), "expected dropped blend geometry"

        before = r.config.blend_pair_budget
        for _ in range(10):
            img = np.asarray(r.render())
            if (img == ref).all():
                break
        np.testing.assert_array_equal(img, ref)
        assert r.config.blend_pair_budget > before
        assert all(b > 2 for b in r.config.blend_layer_tile_budgets)

    def test_observed_coverage_retunes_and_shrinks(self):
        w, h = 256, 192    # enough shade tiles for a visible shrink
        sc = _banner_scene(w, h)
        refr = FrameRenderer(sc, _cfg(w, h), backend="reference")
        ref_front = np.asarray(refr.render())
        ref_away = np.asarray(refr.render(_away_view(sc)))

        r = FrameRenderer(sc, _cfg(w, h), backend="tiled")
        r._react_overflow = True
        r.blend_shrink_after = 3
        r.blend_tile_floor = 4
        r._rebuild_frame_fn()

        # front view: the first observation must set per-layer budgets
        for _ in range(4):
            img = np.asarray(r.render())
        np.testing.assert_array_equal(img, ref_front)
        grown = r.config.blend_layer_tile_budgets
        assert grown, "observed coverage should install per-layer budgets"

        # away view: coverage falls to zero; after blend_shrink_after
        # consecutive low frames the budgets must shrink
        for _ in range(10):
            img = np.asarray(r.render(_away_view(sc)))
            if (r.config.blend_layer_tile_budgets
                    and r.config.blend_layer_tile_budgets < grown):
                break
        assert r.config.blend_layer_tile_budgets < grown
        np.testing.assert_array_equal(img, ref_away)

        # back to the front view: overflow (or growth) must recover the
        # full image again
        for _ in range(12):
            img = np.asarray(r.render())
            if (img == ref_front).all():
                break
        np.testing.assert_array_equal(img, ref_front)

    def test_overflow_floor_damps_oscillation(self):
        """An orbit-style front/away/front/away sequence must not re-jit
        every cycle: budgets an overflow proved too small are floored
        (ratchet), and the floor decays only geometrically — so the
        number of budget re-jits over many cycles is bounded, instead of
        one per transition (each re-jit is a pipeline-rebuild-class
        compile hitch on device)."""
        w, h = 256, 192
        sc = _banner_scene(w, h)
        r = FrameRenderer(sc, _cfg(
            w, h, blend_pair_budget=4096,
            blend_layer_tile_budgets=(2, 2)), backend="tiled")
        r._react_overflow = True
        r.blend_shrink_after = 2
        r.blend_tile_floor = 4
        r._rebuild_frame_fn()

        rebuilds = 0
        orig = r._rebuild_frame_fn

        def counting():
            nonlocal rebuilds
            rebuilds += 1
            orig()
        r._rebuild_frame_fn = counting

        # front view overflows the starved (2,2) budgets -> grow + floor
        for _ in range(6):
            np.asarray(r.render())
        assert r._blend_floor, "overflow growth must install the floor"
        floor0 = r._blend_floor

        # 6 front/away cycles; without the ratchet each away streak
        # shrinks and each front frame re-grows (2 re-jits per cycle = 12+)
        for _ in range(6):
            for _ in range(3):
                np.asarray(r.render(_away_view(sc)))
            for _ in range(3):
                np.asarray(r.render())
        assert rebuilds <= 8, f"controller oscillates: {rebuilds} re-jits"
        # any shrink that did happen respected (a decayed) floor
        if r.config.blend_layer_tile_budgets:
            assert all(b >= f for b, f in zip(
                r.config.blend_layer_tile_budgets,
                tuple(f // (2 ** 6) for f in floor0)))
