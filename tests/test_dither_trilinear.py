"""Dithered trilinear (``RenderConfig.dither_trilinear``): one block
gather per texture tap via 4x4 Bayer mip rounding (sampling._dither_level).
Exactness at integer lods, mean convergence to the trilinear blend over
each 4x4 block, and end-to-end closeness on a full frame."""

import numpy as np
import jax.numpy as jnp

from renderengine_tpu.scene.textures import TextureCache
from renderengine_tpu.shading import sampling


def _tex_setup(size=64, shape=(16, 16)):
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (size, size, 4), np.uint8)
    img[..., 3] = 255
    tc = TextureCache()
    tc.add_texture(img, mips=True)
    dev = tc.build_atlas()
    row = dev["tex_table"][0]
    full = lambda v: jnp.full(shape, v)
    tex = {"page": full(row[0]), "x": full(row[1]), "y": full(row[2]),
           "w": full(row[3]), "h": full(row[4])}
    return dev, tex, jnp.full(shape, row[5])


class TestDitherTrilinear:
    def test_integer_lod_exact(self):
        """At integral lod the dither threshold never fires: dithered ==
        plain trilinear == bilinear at that level."""
        dev, tex, n_mips = _tex_setup()
        rng = np.random.default_rng(1)
        uv = jnp.asarray(rng.uniform(0, 1, (16, 16, 2)), jnp.float32)
        for lod in (0.0, 1.0, 2.0):
            l = jnp.full((16, 16), lod)
            a = sampling.sample_texture_rows(dev["atlas"], dev["mip_y"],
                                             dev["mip_x"], tex, n_mips, uv, l)
            b = sampling.sample_texture_rows(dev["atlas"], dev["mip_y"],
                                             dev["mip_x"], tex, n_mips, uv, l,
                                             dither=True)
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-6)

    def test_block_mean_matches_trilinear(self):
        """Constant uv + fractional lod over a 4x4 block: the dither duty
        cycle makes the block MEAN approach the trilinear blend (within
        one 1/16 duty step of level contrast)."""
        dev, tex, n_mips = _tex_setup()
        uv = jnp.broadcast_to(jnp.asarray([0.37, 0.61], jnp.float32),
                              (16, 16, 2))
        for frac in (0.25, 0.5, 0.75):
            l = jnp.full((16, 16), 1.0 + frac)
            tri = sampling.sample_texture_rows(
                dev["atlas"], dev["mip_y"], dev["mip_x"], tex, n_mips, uv, l)
            dit = sampling.sample_texture_rows(
                dev["atlas"], dev["mip_y"], dev["mip_x"], tex, n_mips, uv, l,
                dither=True)
            c1 = sampling.sample_texture_rows(
                dev["atlas"], dev["mip_y"], dev["mip_x"], tex, n_mips, uv,
                jnp.full((16, 16), 1.0))
            c2 = sampling.sample_texture_rows(
                dev["atlas"], dev["mip_y"], dev["mip_x"], tex, n_mips, uv,
                jnp.full((16, 16), 2.0))
            contrast = float(np.abs(np.asarray(c1) - np.asarray(c2)).max())
            err = np.abs(np.asarray(dit).mean((0, 1))
                         - np.asarray(tri).mean((0, 1))).max()
            assert err <= contrast / 16 + 1e-5, (frac, err, contrast)
            # every dithered texel is one of the two levels' bilinear taps
            d = np.asarray(dit)
            is1 = np.abs(d - np.asarray(c1)).max(-1) < 1e-6
            is2 = np.abs(d - np.asarray(c2)).max(-1) < 1e-6
            assert (is1 | is2).all()

    def test_full_frame_close(self):
        """End-to-end: dithered frame stays near the trilinear frame
        (error bounded by inter-mip contrast, localized to mip
        gradients)."""
        from renderengine_tpu.core.config import RenderConfig
        from renderengine_tpu.graph.frame import FrameRenderer
        from renderengine_tpu.scene import procedural

        sc = procedural.sponza_scene(width=128, height=80, n_textures=6,
                                     target_tris=900)
        # max_anisotropy=1 on BOTH sides: this test isolates the dithered
        # MIP rounding; the default-16 aniso forms differ between the two
        # paths (tiered exact taps vs Bayer-distributed taps) and would
        # pollute the comparison (round-4 regression: the aniso default
        # flip silently changed only side `a`)
        cfg = RenderConfig(width=128, height=80, shadow_extent=128,
                           translucency=True, debug_views=False,
                           max_anisotropy=1)
        a = np.asarray(FrameRenderer(sc, cfg, backend="tiled")
                       .render()).astype(int)
        b = np.asarray(FrameRenderer(sc, cfg.replace(dither_trilinear=True),
                                     backend="tiled").render()).astype(int)
        d = np.abs(a - b).max(-1)
        assert d.mean() < 3.0, d.mean()
        assert (d <= 24).mean() > 0.97, (d <= 24).mean()
