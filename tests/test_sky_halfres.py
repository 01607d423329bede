"""Half-grid skybox sampling (``RenderConfig.sky_halfres``): even pixels
are exact, odd pixels bilinear — and the end-to-end frame stays within a
tight bound of the per-pixel reference (the sky is magnified many screen
pixels per cube texel, so the upsample error is curvature-bounded)."""

import numpy as np
import jax.numpy as jnp

from renderengine_tpu.shading import skybox


def _pack_cube_blocks(cube_u8: np.ndarray) -> jnp.ndarray:
    """[6,S,S,4] u8 -> [6,S,S,4] u32 2x2 clamp-to-edge blocks — the
    layout ``scene.textures.TextureCache.build_atlas`` ships."""
    cube = cube_u8
    cx = np.concatenate([cube[:, :, 1:], cube[:, :, -1:]], axis=2)
    cy = np.concatenate([cube[:, 1:], cube[:, -1:]], axis=1)
    cxy = np.concatenate([cx[:, 1:], cx[:, -1:]], axis=1)
    blk = np.concatenate([cube, cx, cy, cxy], axis=-1)       # [6,S,S,16]
    return jnp.asarray(np.ascontiguousarray(blk).view(np.uint32))


def _smooth_cube(size=16):
    """Seam-continuous cube: each texel's value is a LINEAR function of
    its direction (inverting the sampler's GL face conventions), so the
    field is smooth across faces — like any real sky."""
    t = (np.arange(size, dtype=np.float32) + 0.5) / size * 2.0 - 1.0
    sc, tc = np.meshgrid(t, t, indexing="xy")                # [S,S]
    sc, tc = sc.astype(np.float32), tc.astype(np.float32)
    one = np.ones_like(sc)
    dirs = np.stack([
        np.stack([one, -tc, -sc], -1),       # +x
        np.stack([-one, -tc, sc], -1),       # -x
        np.stack([sc, one, tc], -1),         # +y
        np.stack([sc, -one, -tc], -1),       # -y
        np.stack([sc, -tc, one], -1),        # +z
        np.stack([-sc, -tc, -one], -1),      # -z
    ])                                       # [6,S,S,3]
    d = dirs / np.linalg.norm(dirs, axis=-1, keepdims=True)
    gs = np.array([[0.5, 0.2, -0.3], [-0.4, 0.3, 0.2],
                   [0.1, -0.5, 0.2], [0.3, 0.3, 0.3]], np.float32)
    vals = 0.5 + 0.45 * np.einsum("fijc,kc->fijk", d, gs)
    return np.clip(vals * 255.0 + 0.5, 0, 255).astype(np.uint8)


def _ray_matrix():
    from renderengine_tpu.scene.camera import Camera
    cam = Camera(width=64, height=48)
    return jnp.asarray(skybox.skybox_ray_matrix(cam.view, cam.proj))


class TestSkyHalfres:
    def test_even_pixels_exact(self):
        cube, m = _pack_cube_blocks(_smooth_cube()), _ray_matrix()
        h, w = 48, 64
        full = np.asarray(skybox.render_skybox(cube, m, h, w))
        half = np.asarray(skybox.render_skybox_halfres(cube, m, h, w))
        np.testing.assert_array_equal(half[::2, ::2], full[::2, ::2])

    def test_odd_pixels_close(self):
        """Bilinear upsample of a smooth sky: everywhere within a couple
        of 8-bit steps of the exact per-pixel sample."""
        cube, m = _pack_cube_blocks(_smooth_cube()), _ray_matrix()
        h, w = 47, 63          # odd extents: edge-clamp rows/cols exercise
        full = np.asarray(skybox.render_skybox(cube, m, h, w))
        half = np.asarray(skybox.render_skybox_halfres(cube, m, h, w))
        assert half.shape == full.shape
        err = np.abs(half - full)
        # 16^2 cube on a 63px screen is ~6 px/texel magnification — far
        # harsher than the bench (64^2 at 1920 ~= 30 px/texel); the bound
        # scales with curvature, so a few 8-bit steps here is plenty
        assert err.max() < 5.0 / 255.0, err.max()
        assert (err <= 2.0 / 255.0).mean() > 0.98

    def test_frame_e2e_parity(self):
        """Full frame with sky_halfres on vs off: uncovered (sky) pixels
        within 1/255 for the procedural scene's smooth cubemap."""
        from renderengine_tpu.core.config import RenderConfig
        from renderengine_tpu.graph.frame import FrameRenderer
        from renderengine_tpu.scene import procedural
        import dataclasses

        scene = procedural.sponza_scene(width=96, height=64, n_textures=4,
                                        target_tris=600)
        cfg = RenderConfig(width=96, height=64, shadow_extent=64,
                           debug_views=False)
        a = np.asarray(FrameRenderer(scene, cfg, backend="tiled")
                       .render()).astype(np.int32)
        cfg2 = dataclasses.replace(cfg, sky_halfres=True)
        b = np.asarray(FrameRenderer(scene, cfg2, backend="tiled")
                       .render()).astype(np.int32)
        diff = np.abs(a - b).max(axis=-1)
        assert float((diff <= 1).mean()) > 0.995, float((diff <= 1).mean())
        assert diff.max() <= 6, diff.max()
