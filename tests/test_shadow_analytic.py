"""Analytic shadow correctness: a floating box over a floor must shadow
exactly its projected footprint (golden-image test per pass, SURVEY 4a).

Note: the shadow pass front-culls (reference ShadowSystem.cpp:50), so
single-sided planes lit from the front cast NO shadows — faithful to the
reference; blockers must be closed meshes (hence a box here)."""

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
    sc = Scene()
    mat = sc.materials.create_material_instance(
        MaterialInstanceInfo(MaterialProperties(
            base_color=np.array([1, 1, 1, 1], np.float32),
            perceptual_roughness=1.0)))

    def add_plane(transform, pts):
        node = sc.tree.create_node(transform, AABB.from_points(pts))
        p, n, u, i = make_plane(0.5)
        base = sc.meshes.add_vertices(p, n, u)
        sc.meshes.add_mesh(i + base, mat, node)

    # floor 8x8 at y=0; small 2x2x0.2 closed blocker at y=2 centered
    add_plane(math3d.scale([8, 1, 8]), [[-4, 0, -4], [4, 0, 4]])
    node = sc.tree.create_node(
        math3d.translate([0, 2, 0]) @ math3d.scale([2, 0.2, 2]),
        AABB.from_points([[-1, -0.1, -1], [1, 0.1, 1]]))
    bp, bn, bu, bi = make_box(0.5)
    base = sc.meshes.add_vertices(bp, bn, bu)
    sc.meshes.add_mesh(bi + base, mat, node)
    lid = sc.lights.add_light(Light(
        type=LightType.DIRECTIONAL,
        direction=np.array([0, -1, 0], np.float32),  # straight down
        position=np.array([0, 10, 0], np.float32),
        intensity=5.0))
    sc.create_shadow_map(lid)
    # top-down camera so floor pixels map linearly to world x/z
    sc.camera = Camera(eye=np.array([0, 8, 0.001], np.float32),
                       look_at=np.zeros(3, np.float32),
                       up=np.array([0, 0, -1], np.float32),
                       fov_degrees=60.0, near=0.1, far=50.0,
                       width=64, height=64)
    return sc


class TestAnalyticShadow:
    def test_blocker_shadows_exactly_its_footprint(self):
        sc = _scene()
        cfg = RenderConfig(width=64, height=64, shadow_extent=128,
                           skybox=False, translucency=False)
        r = FrameRenderer(sc, cfg, backend="tiled")
        img = np.asarray(r.render()).astype(np.float32)[..., :3].mean(-1)

        # The blocker itself occupies the center of the frame (it is lit
        # from above). Sample floor points inside vs outside the shadow
        # footprint but away from the blocker edges and penumbra.
        # Top-down: world x in [-a, a] maps across the image; floor
        # visible around the blocker. Blocker spans |x|,|z| <= 1 (world).
        h = w = 64
        # world extent seen by the camera at the floor (y=0, eye_y=8,
        # fov 60): half-extent = 8 * tan(30deg) ~ 4.62
        half = 8 * np.tan(np.radians(30.0))

        def px(wx, wz):
            # camera looks -y with up=-z: +z world maps to -row direction
            col = int((wx / half * 0.5 + 0.5) * w)
            row = int((wz / half * 0.5 + 0.5) * h)
            return img[np.clip(row, 0, h - 1), np.clip(col, 0, w - 1)]

        lit = [px(3.0, 0.0), px(-3.0, 0.0), px(0.0, 3.0), px(0.0, -3.0)]
        # points under the blocker are occluded BY the blocker visually —
        # instead check floor points just outside the blocker silhouette
        # but inside where shadow WOULD be if the fit were wrong (none), so
        # check the blocker's own top is lit and floor near it is lit:
        assert min(lit) > 40, f"floor should be lit, got {lit}"

        # verify the shadow is present where the floor is visible right at
        # the blocker boundary shadowed region: with a straight-down light
        # the shadow exactly underlies the blocker, which hides it. So
        # tilt: re-light at an angle and check the offset footprint.
        sc2 = _scene()
        sc2.lights.lights[0].direction = np.asarray(
            math3d.normalize([1.0, -1.0, 0.0]), np.float32)
        r2 = FrameRenderer(sc2, cfg, backend="tiled")
        img2 = np.asarray(r2.render()).astype(np.float32)[..., :3].mean(-1)

        def px2(wx, wz):
            col = int((wx / half * 0.5 + 0.5) * w)
            row = int((wz / half * 0.5 + 0.5) * h)
            return img2[np.clip(row, 0, h - 1), np.clip(col, 0, w - 1)]

        # light from (-x) direction pointing (+x, -y): blocker at y=2
        # casts its shadow displaced by +2 in x: footprint x in [1, 3]
        shadowed = [px2(2.5, 0.0), px2(2.5, 0.5), px2(2.5, -0.5)]
        lit2 = [px2(-2.5, 0.0), px2(0.0, 3.5), px2(0.0, -3.5)]
        assert max(shadowed) < min(lit2), (
            f"shadow region {shadowed} should be darker than lit {lit2}")
