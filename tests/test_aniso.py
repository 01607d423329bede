"""Anisotropic filtering (reference sampler requests 16x,
TextureCache.cpp:185-186): at a grazing footprint — wide in u, narrow in
v — aniso taps pick the LOD from the minor axis, keeping detail that
plain trilinear (LOD from the major axis) blurs away."""

import numpy as np
import jax.numpy as jnp

from renderengine_tpu.scene.textures import TextureCache
from renderengine_tpu.shading import sampling


def _stripes(size=128):
    """Horizontal stripes: varies along v only (minor axis)."""
    img = np.zeros((size, size, 4), np.uint8)
    img[(np.arange(size) // 4) % 2 == 0, :, :3] = 255
    img[..., 3] = 255
    return img


class TestAnisotropic:
    def test_grazing_contrast_beats_trilinear(self):
        tc = TextureCache()
        tc.add_texture(_stripes(), mips=True)
        dev = tc.build_atlas()
        atlas = jnp.asarray(dev["atlas"])
        table = jnp.asarray(dev["tex_table"])
        mip_y = jnp.asarray(dev["mip_y"])
        mip_x = jnp.asarray(dev["mip_x"])

        n = 64
        vs = (jnp.arange(n, dtype=jnp.float32) + 0.5) / n * 0.5
        uv = jnp.stack([jnp.full_like(vs, 0.25), vs], -1)[None]  # [1,n,2]
        # footprint: 16 texels wide in u, 1 texel in v (grazing floor view)
        duv_dx = jnp.broadcast_to(jnp.asarray([16.0 / 128, 0.0]), (1, n, 2))
        duv_dy = jnp.broadcast_to(jnp.asarray([0.0, 1.0 / 128]), (1, n, 2))

        row = table[0]
        tex = {"page": jnp.full((1, n), row[0]), "x": jnp.full((1, n), row[1]),
               "y": jnp.full((1, n), row[2]), "w": jnp.full((1, n), row[3]),
               "h": jnp.full((1, n), row[4])}
        n_mips = jnp.full((1, n), row[5])

        aniso = sampling.sample_texture_aniso(
            atlas, mip_y, mip_x, tex, n_mips, uv, duv_dx, duv_dy, 16)

        # trilinear picks lod = log2(16) = 4: stripes of period 8 are gone
        tri = sampling.sample_texture_rows(
            atlas, mip_y, mip_x, tex, n_mips, uv,
            jnp.full((1, n), 4.0))

        a = np.asarray(aniso)[0, :, 0]
        t = np.asarray(tri)[0, :, 0]
        # contrast along v: aniso must retain most of the stripe swing,
        # trilinear must have washed it out
        assert a.max() - a.min() > 0.8
        assert t.max() - t.min() < 0.3
        # and the aniso result must still be band-limited in u (it averaged
        # 16 taps across u): all taps hit the same stripe row => exact
        stripe = ((np.floor(vs * 128).astype(int) // 4) % 2 == 0)
        np.testing.assert_allclose(a > 0.5, stripe)

    def test_partial_ratio_unbiased(self):
        """Ratio-2 footprint with max_aniso=16 must equal the max_aniso=2
        result: collapsed taps get zero weight and the sum normalizes by
        the per-pixel N (weighting them 1/max_aniso each shifted the
        centroid ~0.9 texels on a ramp)."""
        size = 128
        ramp = np.zeros((size, size, 4), np.uint8)
        ramp[..., :3] = np.linspace(0, 255, size, dtype=np.uint8)[None, :, None]
        ramp[..., 3] = 255
        tc = TextureCache()
        tc.add_texture(ramp, mips=True)
        dev = tc.build_atlas()
        atlas = jnp.asarray(dev["atlas"])
        table = jnp.asarray(dev["tex_table"])
        mip_y = jnp.asarray(dev["mip_y"])
        mip_x = jnp.asarray(dev["mip_x"])

        n = 32
        us = (jnp.arange(n, dtype=jnp.float32) + 0.5) / n * 0.4 + 0.2
        uv = jnp.stack([us, jnp.full_like(us, 0.5)], -1)[None]
        duv_dx = jnp.broadcast_to(jnp.asarray([2.0 / size, 0.0]), (1, n, 2))
        duv_dy = jnp.broadcast_to(jnp.asarray([0.0, 1.0 / size]), (1, n, 2))
        row = table[0]
        tex = {"page": jnp.full((1, n), row[0]), "x": jnp.full((1, n), row[1]),
               "y": jnp.full((1, n), row[2]), "w": jnp.full((1, n), row[3]),
               "h": jnp.full((1, n), row[4])}
        n_mips = jnp.full((1, n), row[5])

        a16 = np.asarray(sampling.sample_texture_aniso(
            atlas, mip_y, mip_x, tex, n_mips, uv, duv_dx, duv_dy, 16))
        a2 = np.asarray(sampling.sample_texture_aniso(
            atlas, mip_y, mip_x, tex, n_mips, uv, duv_dx, duv_dy, 2))
        np.testing.assert_allclose(a16, a2, atol=1e-5)
