"""Translucent pass: depth-peeled back-to-front src-alpha blending."""

import numpy as np

from renderengine_tpu.core import math3d
from renderengine_tpu.core.aabb import AABB
from renderengine_tpu.core.config import RenderConfig
from renderengine_tpu.graph.frame import FrameRenderer
from renderengine_tpu.scene.camera import Camera
from renderengine_tpu.scene.lights import Light, LightType
from renderengine_tpu.scene.materials import (AlphaMode, MaterialInstanceInfo,
                                              MaterialProperties)
from renderengine_tpu.scene.procedural import make_plane
from renderengine_tpu.scene.scene import Scene


def _layered_scene():
    """Opaque white floor seen through a red then a green translucent pane
    (camera looks straight down -y)."""
    sc = Scene()

    def add_plane(y, mat):
        node = sc.tree.create_node(
            math3d.translate([0, y, 0]) @ math3d.scale([4, 1, 4]),
            AABB.from_points([[-0.5, 0, -0.5], [0.5, 0, 0.5]]))
        p, n, u, i = make_plane(0.5)
        base = sc.meshes.add_vertices(p, n, u)
        sc.meshes.add_mesh(i + base, mat, node)

    def mat(rgba, mode):
        return sc.materials.create_material_instance(
            MaterialInstanceInfo(
                MaterialProperties(base_color=np.array(rgba, np.float32),
                                   emissive=np.array([*rgba[:3], 1.0], np.float32),
                                   perceptual_roughness=1.0),
                alpha_mode=mode))

    add_plane(0.0, mat([1, 1, 1, 1], AlphaMode.OPAQUE))
    add_plane(1.0, mat([1, 0, 0, 0.5], AlphaMode.BLEND))   # red pane (lower)
    add_plane(2.0, mat([0, 1, 0, 0.5], AlphaMode.BLEND))   # green pane (upper)
    sc.lights.add_light(Light(type=LightType.DIRECTIONAL, intensity=0.0,
                              direction=np.array([0, -1, 0], np.float32)))
    sc.camera = Camera(eye=np.array([0, 6, 0.001], np.float32),
                       look_at=np.zeros(3, np.float32),
                       up=np.array([0, 0, -1], np.float32),
                       fov_degrees=60.0, near=0.1, far=50.0,
                       width=32, height=32)
    return sc


class TestTranslucency:
    def test_two_layer_blend_order(self):
        sc = _layered_scene()
        cfg = RenderConfig(width=32, height=32, shadows=False, skybox=False,
                           translucency=True, translucency_layers=2,
                           translucency_tile_fraction=1.0)  # full-screen panes
        r = FrameRenderer(sc, cfg, backend="reference")
        img = np.asarray(r.render()).astype(np.float32) / 255.0
        from renderengine_tpu.shading.srgb import srgb_to_linear
        import jax.numpy as jnp
        center = np.asarray(srgb_to_linear(jnp.asarray(img[16, 16, :3])))
        # analytic: emissive-only materials (light intensity 0, exposure 1):
        # layer colors are emissive + 0.03*baseColor ambient.
        def shade(rgb):
            return np.array(rgb) + 0.03 * np.array(rgb)
        white = shade([1, 1, 1])
        red = shade([1, 0, 0])
        green = shade([0, 1, 0])
        expect = white
        expect = expect * 0.5 + red * 0.5      # red pane (nearer to floor) first
        expect = expect * 0.5 + green * 0.5    # then green on top
        assert np.allclose(center, expect, atol=0.02), (center, expect)

    def test_layers_off_matches_opaque_only(self):
        sc = _layered_scene()
        cfg = RenderConfig(width=32, height=32, shadows=False, skybox=False,
                           translucency=False)
        r = FrameRenderer(sc, cfg, backend="reference")
        img = np.asarray(r.render()).astype(np.float32) / 255.0
        # only the white floor visible
        assert abs(img[16, 16, 0] - img[16, 16, 1]) < 0.02
        assert abs(img[16, 16, 1] - img[16, 16, 2]) < 0.02
