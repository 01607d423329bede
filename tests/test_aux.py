"""Auxiliary subsystems: EXR io, IBL env capture, grid, textured quad,
phong model, uniforms roundtrip."""

import numpy as np
import jax.numpy as jnp
import pytest

from renderengine_tpu.utils.exr import read_exr, write_exr
from renderengine_tpu.shading import ibl
from renderengine_tpu.shading.textured_quad import draw_textured_quad
from renderengine_tpu.graph import uniforms


class TestExr:
    def test_roundtrip_float(self, tmp_path, rng):
        img = rng.random((17, 23, 3)).astype(np.float32) * 10.0
        write_exr(str(tmp_path / "t.exr"), img)
        back = read_exr(str(tmp_path / "t.exr"))
        np.testing.assert_allclose(back, img, rtol=1e-6)

    def test_rejects_non_exr(self, tmp_path):
        (tmp_path / "junk.exr").write_bytes(b"not an exr at all")
        with pytest.raises(ValueError):
            read_exr(str(tmp_path / "junk.exr"))


class TestIbl:
    def test_env_capture_directions(self, tmp_path):
        # equirect with distinct colors per hemisphere: +y white, -y black.
        # uv_y = asin(y)*invAtan+0.5, so +y maps to v~1 = the BOTTOM rows.
        h, w = 32, 64
        v = np.linspace(-1, 1, h)[:, None, None]
        eq = np.broadcast_to(np.clip(v, 0, 1), (h, w, 1)).repeat(4, -1).astype(np.float32).copy()
        cube = np.asarray(ibl.render_environment_map(eq, size=8))
        # +y face mostly bright, -y face mostly dark
        assert cube[2, ..., 0].mean() > 0.55  # corners dilute toward ~0.42
        assert cube[3, ..., 0].mean() < 0.05
        u8 = ibl.environment_to_skybox_u8(jnp.asarray(cube))
        assert u8.dtype == np.uint8 and u8.shape == (6, 8, 8, 4)

    def test_hdri_loader(self, tmp_path, rng):
        img = rng.random((8, 16, 3)).astype(np.float32)
        write_exr(str(tmp_path / "env.exr"), img)
        loaded = ibl.load_hdri(str(tmp_path / "env.exr"))
        assert loaded.shape == (8, 16, 4)
        np.testing.assert_allclose(loaded[..., :3], img, rtol=1e-6)


class TestTexturedQuad:
    def test_grayscale_overlay(self):
        rgb = jnp.zeros((40, 40, 3), jnp.float32)
        depth = jnp.full((8, 8), 0.75, jnp.float32)
        out = np.asarray(draw_textured_quad(rgb, depth, center=(-0.5, -0.5),
                                            size=(0.25, 0.25)))
        # the quad rect is non-zero and gray
        assert (out > 0).any()
        ys, xs = np.nonzero(out[..., 0])
        assert out[ys[0], xs[0], 0] == out[ys[0], xs[0], 1] == out[ys[0], xs[0], 2]
        assert out[ys[0], xs[0], 0] == pytest.approx(0.75)


class TestUniforms:
    def test_pack_unpack_roundtrip(self):
        params = {
            "view": np.arange(16, dtype=np.float32).reshape(4, 4),
            "proj": np.arange(16, 32, dtype=np.float32).reshape(4, 4),
            "view_pos": np.array([1, 2, 3], np.float32),
            "exposure": 1.5,
            "debug_input": 3,
            "debug_equation": 2,
            "inv_vp_rot": np.eye(4, dtype=np.float32) * 2,
            "inv_vp": np.eye(4, dtype=np.float32) * 3,
            "shadow_viewproj": np.stack([np.eye(4, dtype=np.float32) * 4] * 2),
        }
        u = uniforms.pack_params(params, 2)
        back = uniforms.unpack_params(jnp.asarray(u), 2)
        np.testing.assert_array_equal(np.asarray(back["view"]), params["view"])
        np.testing.assert_array_equal(np.asarray(back["proj"]), params["proj"])
        assert float(back["exposure"]) == 1.5
        assert int(back["debug_input"]) == 3
        np.testing.assert_array_equal(np.asarray(back["shadow_viewproj"]),
                                      params["shadow_viewproj"])
