"""End-to-end frame tests: cube scene through the full graph
(vertex -> shadow pass -> raster -> PBR -> skybox -> sRGB encode)."""

import numpy as np
import pytest

from renderengine_tpu.core.config import DebugInput, RenderConfig
from renderengine_tpu.graph.frame import FrameRenderer
from renderengine_tpu.scene import procedural
from renderengine_tpu.scene.camera import ViewProperties


@pytest.fixture(scope="module")
def cube_renderer():
    sc = procedural.cube_scene(width=96, height=72)
    cfg = RenderConfig(width=96, height=72, shadow_extent=64)
    return FrameRenderer(sc, cfg)


class TestCubeFrame:
    def test_frame_structure(self, cube_renderer):
        img = np.asarray(cube_renderer.render())
        assert img.shape == (72, 96, 4) and img.dtype == np.uint8
        # corners are sky (gradient cubemap: never pure black, alpha 255)
        assert img[0, 0, :3].astype(int).sum() > 30
        assert (img[..., 3] == 255).all()
        # center is the lit checkered cube: strong local contrast
        center = img[20:52, 32:64, :3].astype(np.float32)
        assert center.std() > 20, "checker texture should produce contrast"

    def test_debug_normals_view(self, cube_renderer):
        cam = cube_renderer.scene_host.camera
        vp = ViewProperties.from_camera(cam, debug_input=DebugInput.NORMALS)
        img = np.asarray(cube_renderer.render(vp))
        # normals view sRGB-encodes the world normal; cube faces are axis
        # aligned so channels take few distinct values per face region
        mid = img[36, 48, :3]
        assert mid.max() > 100  # some +1 component

    def test_top_face_brighter_than_shadowed_side(self, cube_renderer):
        # light comes from above (-y direction => top face max NoL)
        img = np.asarray(cube_renderer.render()).astype(np.float32)
        # the cube occupies the center; top face pixels are in the upper
        # middle, a side face lower-left or lower-right
        top = img[24:30, 44:52, :3].mean()
        side = img[48:58, 44:52, :3].mean()
        assert top > side, f"top {top} should outshine side {side}"
