"""Debug-view matrix (SURVEY §4c: the reference's runtime debug switches
become a test matrix) + backend frame equivalence."""

import numpy as np
import pytest

from renderengine_tpu.core.config import (DebugEquation, DebugInput,
                                          RenderConfig, ShadingModel)
from renderengine_tpu.graph.frame import FrameRenderer
from renderengine_tpu.scene import procedural
from renderengine_tpu.scene.camera import ViewProperties


@pytest.fixture(scope="module")
def small_renderer():
    sc = procedural.cube_scene(width=64, height=48)
    cfg = RenderConfig(width=64, height=48, shadow_extent=32)
    return FrameRenderer(sc, cfg, backend="reference")


class TestDebugViews:
    def test_all_debug_inputs_render_and_differ(self, small_renderer):
        r = small_renderer
        cam = r.scene_host.camera
        base = np.asarray(r.render(ViewProperties.from_camera(cam)))
        for di in (DebugInput.BASE_COLOR, DebugInput.DIFFUSE_COLOR,
                   DebugInput.NORMALS, DebugInput.OCCLUSION,
                   DebugInput.METALLIC, DebugInput.ROUGHNESS):
            img = np.asarray(r.render(ViewProperties.from_camera(cam, debug_input=di)))
            assert img.shape == base.shape
            assert (img != base).any(), f"{di} identical to the lit frame"
        # pairwise-distinct for modes that must differ on this material
        # (DIFFUSE_COLOR == BASE_COLOR when metallic == 0, as in GLSL)
        seen = set()
        for di in (DebugInput.BASE_COLOR, DebugInput.NORMALS,
                   DebugInput.ROUGHNESS):
            img = np.asarray(r.render(ViewProperties.from_camera(cam, debug_input=di)))
            assert img.tobytes() not in seen, f"{di} identical to a previous mode"
            seen.add(img.tobytes())

    def test_debug_equations_render(self, small_renderer):
        r = small_renderer
        cam = r.scene_host.camera
        base = np.asarray(r.render(ViewProperties.from_camera(cam)))
        for de in (DebugEquation.DIFFUSE, DebugEquation.FRESNEL,
                   DebugEquation.DISTRIBUTION, DebugEquation.SPECULAR):
            img = np.asarray(r.render(ViewProperties.from_camera(cam, debug_equation=de)))
            assert (img != base).any(), f"{de} identical to the lit frame"


class TestBackendEquivalence:
    def test_reference_vs_tiled_frames_match(self):
        """The jnp tiled raster and the brute-force raster must produce the
        SAME final frame (same G-buffer semantics => same shading)."""
        sc = procedural.cube_scene(width=64, height=48)
        cfg = RenderConfig(width=64, height=48, shadow_extent=32)
        a = np.asarray(FrameRenderer(sc, cfg, backend="reference").render())
        b = np.asarray(FrameRenderer(sc, cfg, backend="tiled").render())
        np.testing.assert_array_equal(a, b)


class TestPhongModel:
    def test_phong_differs_from_pbr_but_lit(self):
        sc = procedural.cube_scene(width=48, height=32)
        pbr_img = np.asarray(FrameRenderer(
            sc, RenderConfig(width=48, height=32, shadow_extent=32)).render())
        ph_img = np.asarray(FrameRenderer(
            sc, RenderConfig(width=48, height=32, shadow_extent=32,
                             shading=ShadingModel.PHONG)).render())
        assert (ph_img != pbr_img).any()
        assert ph_img[..., :3].mean() > 10  # actually lit


class TestSSAA:
    def test_supersampled_frame_shape_and_smoothing(self):
        sc = procedural.cube_scene(width=48, height=32)
        base = np.asarray(FrameRenderer(
            sc, RenderConfig(width=48, height=32, shadow_extent=32,
                             translucency=False)).render())
        ss = np.asarray(FrameRenderer(
            sc, RenderConfig(width=48, height=32, ssaa=2, shadow_extent=32,
                             translucency=False)).render())
        assert ss.shape == base.shape
        # supersampling must produce intermediate edge values somewhere
        assert (ss != base).any()
