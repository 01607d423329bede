"""IBL diffuse irradiance (beyond the reference's pbr.glsl:442 todo):
the cosine-convolved environment term must integrate exactly for a
constant environment and must actually light the scene when enabled."""

import numpy as np
import jax.numpy as jnp

from renderengine_tpu.core.config import RenderConfig
from renderengine_tpu.graph.frame import FrameRenderer
from renderengine_tpu.scene import procedural
from renderengine_tpu.scene.procedural_env import cosine_convolve_cube
from renderengine_tpu.shading import sampling


class TestIrradiance:
    def test_constant_env_integrates_to_itself(self):
        """irradiance(n) of a constant radiance C is C for every normal
        (the cosine lobe integrates to pi)."""
        c = np.array([0.25, 0.5, 0.75], np.float32)
        cube = np.broadcast_to(np.append(c, 1.0), (6, 32, 32, 4)).copy()
        irr = cosine_convolve_cube(cube, out_size=8)
        np.testing.assert_allclose(irr[..., :3], np.broadcast_to(c, irr[..., :3].shape),
                                   rtol=2e-3)

    def test_sampler_matches_table(self):
        """The block-f32 cube sampler returns the texel value at texel
        centers."""
        rng = np.random.default_rng(1)
        irr = rng.uniform(0, 1, (6, 4, 4, 4)).astype(np.float32)
        cx = np.concatenate([irr[:, :, 1:], irr[:, :, -1:]], axis=2)
        cy = np.concatenate([irr[:, 1:], irr[:, -1:]], axis=1)
        cxy = np.concatenate([cx[:, 1:], cx[:, -1:]], axis=1)
        blocks = jnp.asarray(np.concatenate([irr, cx, cy, cxy], axis=-1))
        # +x face center texel (1,2): sc = (2.5/4)*2-1 = 0.25, tc = (1.5/4)*2-1 = -0.25
        # dir on +x face: x=1, z=-sc, y=-tc
        d = jnp.asarray([[1.0, 0.25, -0.25]])
        out = np.asarray(sampling.sample_cubemap_f32(blocks, d))
        np.testing.assert_allclose(out[0], irr[0, 1, 2], rtol=1e-5)

    def test_frame_ibl_brightens_sky_side(self):
        w, h = 96, 72
        sc = procedural.sponza_scene(width=w, height=h, n_textures=8,
                                     target_tris=1_500)
        cfg = RenderConfig(width=w, height=h, shadows=False,
                           translucency=False, skybox=False)
        off = np.asarray(FrameRenderer(sc, cfg, backend="tiled").render())
        sc2 = procedural.sponza_scene(width=w, height=h, n_textures=8,
                                      target_tris=1_500)
        on = np.asarray(FrameRenderer(sc2, cfg.replace(ibl_diffuse=True),
                                      backend="tiled").render())
        assert (on != off).any(), "IBL term should change the image"
        # the gradient sky is bright; its irradiance should exceed the
        # flat 0.03 ambient on average
        assert float(on.astype(np.int64).sum()) != float(off.astype(np.int64).sum())
