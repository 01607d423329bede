"""Spot and point-light shadow maps — BEYOND the reference, whose live
pipeline renders only the directional map (``Assets/Shaders/shadow.glsl:27``,
``ShadowSystem.cpp``): a spot light gets a perspective-fitted depth map
(``shading/fitting.py::compute_spot_shadow_transform``) and a point light
six cube-face maps (``compute_point_shadow_transforms``; per-fragment
dominant-axis face select in ``shadow.py``) through the same cached shadow
pass, packed PCF lookup, and static per-light gating."""

import numpy as np

from renderengine_tpu.core import math3d
from renderengine_tpu.core.aabb import AABB
from renderengine_tpu.core.config import RenderConfig
from renderengine_tpu.graph.frame import FrameRenderer
from renderengine_tpu.scene.camera import Camera
from renderengine_tpu.scene.lights import Light, LightType
from renderengine_tpu.scene.materials import MaterialInstanceInfo, MaterialProperties
from renderengine_tpu.scene.procedural import make_box, make_plane
from renderengine_tpu.scene.scene import Scene


def _scene():
    """Floor + floating closed box, lit by an off-axis spot at
    (-4, 10, 0) aimed at the origin. The box (|x|,|z| <= 1 at y=2)
    projects to floor x in [-0.25, 2.25], z in [-1.25, 1.25]."""
    sc = Scene()
    mat = sc.materials.create_material_instance(
        MaterialInstanceInfo(MaterialProperties(
            base_color=np.array([1, 1, 1, 1], np.float32),
            perceptual_roughness=1.0)))

    node = sc.tree.create_node(math3d.scale([8, 1, 8]),
                               AABB.from_points([[-4, 0, -4], [4, 0, 4]]))
    p, n, u, i = make_plane(0.5)
    base = sc.meshes.add_vertices(p, n, u)
    sc.meshes.add_mesh(i + base, mat, node)

    node = sc.tree.create_node(
        math3d.translate([0, 2, 0]) @ math3d.scale([2, 0.2, 2]),
        AABB.from_points([[-1, -0.1, -1], [1, 0.1, 1]]))
    bp, bn, bu, bi = make_box(0.5)
    base = sc.meshes.add_vertices(bp, bn, bu)
    sc.meshes.add_mesh(bi + base, mat, node)

    pos = np.array([-4, 10, 0], np.float32)
    lid = sc.lights.add_light(Light(
        type=LightType.SPOT,
        position=pos,
        direction=np.asarray(math3d.normalize([4.0, -10.0, 0.0]),
                             np.float32),
        intensity=600.0, falloff_radius=50.0,
        cos_inner=0.75, cos_outer=0.7))
    sc.create_shadow_map(lid)
    sc.camera = Camera(eye=np.array([0, 8, 0.001], np.float32),
                       look_at=np.zeros(3, np.float32),
                       up=np.array([0, 0, -1], np.float32),
                       fov_degrees=60.0, near=0.1, far=50.0,
                       width=64, height=64)
    return sc


CFG = RenderConfig(width=64, height=64, shadow_extent=128,
                   skybox=False, translucency=False)


class TestSpotShadow:
    def test_blocker_shadows_projected_footprint(self):
        img = np.asarray(FrameRenderer(_scene(), CFG, backend="tiled")
                         .render()).astype(np.float32)[..., :3].mean(-1)
        h = w = 64
        half = 8 * np.tan(np.radians(30.0))

        def px(wx, wz):
            col = int((wx / half * 0.5 + 0.5) * w)
            row = int((wz / half * 0.5 + 0.5) * h)
            return img[np.clip(row, 0, h - 1), np.clip(col, 0, w - 1)]

        # inside the projected footprint but outside the box silhouette
        shadowed = [px(1.8, 0.0), px(1.8, 0.6), px(1.8, -0.6)]
        # lit floor: behind the light side / beside the footprint
        lit = [px(-2.5, 0.0), px(0.0, 2.8), px(0.0, -2.8), px(3.2, 0.0)]
        assert max(shadowed) < 0.55 * min(lit), (
            f"spot shadow {shadowed} should be darker than lit {lit}")

    def test_backends_agree(self):
        sc = _scene()
        a = np.asarray(FrameRenderer(sc, CFG, backend="tiled").render())
        b = np.asarray(FrameRenderer(_scene(), CFG,
                                     backend="reference").render())
        d = np.abs(a.astype(int) - b.astype(int))
        assert (d <= 1).mean() > 0.999 and d.max() <= 4

    def test_no_map_no_shadow(self):
        """Same scene without create_shadow_map: the static gate skips the
        PCF entirely and the footprint region stays lit."""
        sc = _scene()
        sc.lights.lights[0].shadow_index = -1
        sc.n_shadow_maps = 0
        img = np.asarray(FrameRenderer(sc, CFG, backend="tiled")
                         .render()).astype(np.float32)[..., :3].mean(-1)
        half = 8 * np.tan(np.radians(30.0))
        col = int((1.8 / half * 0.5 + 0.5) * 64)
        row = 32
        ref = img[row, int((-2.5 / half * 0.5 + 0.5) * 64)]
        assert img[row, col] > 0.7 * ref


def _point_scene():
    """Floor + two floating blockers around a central point light at
    (0, 3, 0): one at (2, 1.5, 0) shadowing floor around x = 4 (+X cube
    face) and one at (0, 1.5, -2) shadowing around z = -4 (-Z face).
    Directly below the light (-Y face) stays lit."""
    sc = Scene()
    mat = sc.materials.create_material_instance(
        MaterialInstanceInfo(MaterialProperties(
            base_color=np.array([1, 1, 1, 1], np.float32),
            perceptual_roughness=1.0)))

    node = sc.tree.create_node(math3d.scale([8, 1, 8]),
                               AABB.from_points([[-4, 0, -4], [4, 0, 4]]))
    p, n, u, i = make_plane(0.5)
    base = sc.meshes.add_vertices(p, n, u)
    sc.meshes.add_mesh(i + base, mat, node)

    for cx, cz in ((2.0, 0.0), (0.0, -2.0)):
        node = sc.tree.create_node(
            math3d.translate([cx, 1.5, cz]) @ math3d.scale([1, 0.2, 1]),
            AABB.from_points([[-0.5, -0.1, -0.5], [0.5, 0.1, 0.5]]))
        bp, bn, bu, bi = make_box(0.5)
        base = sc.meshes.add_vertices(bp, bn, bu)
        sc.meshes.add_mesh(bi + base, mat, node)

    lid = sc.lights.add_light(Light(
        type=LightType.POINT,
        position=np.array([0, 3, 0], np.float32),
        intensity=200.0, falloff_radius=50.0))
    sc.create_shadow_map(lid)
    sc.camera = Camera(eye=np.array([0, 8, 0.001], np.float32),
                       look_at=np.zeros(3, np.float32),
                       up=np.array([0, 0, -1], np.float32),
                       fov_degrees=60.0, near=0.1, far=50.0,
                       width=64, height=64)
    return sc


class TestPointShadow:
    def test_six_face_allocation(self):
        sc = _point_scene()
        assert sc.n_shadow_maps == 6
        assert sc.lights.lights[0].shadow_index == 0

    def test_blockers_shadow_their_faces(self):
        img = np.asarray(FrameRenderer(_point_scene(), CFG,
                                       backend="tiled")
                         .render()).astype(np.float32)[..., :3].mean(-1)
        h = w = 64
        half = 8 * np.tan(np.radians(30.0))

        def px(wx, wz):
            col = int((wx / half * 0.5 + 0.5) * w)
            row = int((wz / half * 0.5 + 0.5) * h)
            return img[np.clip(row, 0, h - 1), np.clip(col, 0, w - 1)]

        # projected footprints: blocker at (2, 1.5) spans x in [1.5, 2.5]
        # -> floor x in [3, 5] (visible to 4); same for z
        shadow_x = [px(3.6, 0.0), px(3.6, 0.3)]       # +X face
        shadow_z = [px(0.0, -3.6), px(0.3, -3.6)]     # -Z face
        lit = [px(0.0, 0.8), px(-3.0, 0.0), px(0.0, 3.0), px(-2.0, -2.0)]
        assert max(shadow_x) < 0.55 * min(lit), (shadow_x, lit)
        assert max(shadow_z) < 0.55 * min(lit), (shadow_z, lit)

    def test_backends_agree(self):
        a = np.asarray(FrameRenderer(_point_scene(), CFG,
                                     backend="tiled").render())
        b = np.asarray(FrameRenderer(_point_scene(), CFG,
                                     backend="reference").render())
        d = np.abs(a.astype(int) - b.astype(int))
        assert (d <= 1).mean() > 0.999 and d.max() <= 4