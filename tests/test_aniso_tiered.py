"""Footprint-adaptive anisotropic sampling (the default-on form of the
reference's 16x sampler request, TextureCache.cpp:185-186).

Two affordable forms of the dense N-tap spec:
- tiered tile compaction (exact taps inside budgeted tiles, isotropic
  fallback past budget) — sampling.sample_texture_aniso_tiered
- Bayer-distributed single taps for dithered paths (the footprint
  integral spreads over the 4x4 dither block) — sample_texture_aniso
  with dither=True
"""

import numpy as np
import jax.numpy as jnp

from renderengine_tpu.scene.textures import TextureCache
from renderengine_tpu.shading import sampling
from renderengine_tpu.shading.sampling import AnisoSpec


def _ramp(size=128):
    img = np.zeros((size, size, 4), np.uint8)
    img[..., :3] = np.linspace(0, 255, size, dtype=np.uint8)[None, :, None]
    img[..., 3] = 255
    return img


def _atlas(img):
    tc = TextureCache()
    tc.add_texture(img, mips=True)
    dev = tc.build_atlas()
    return (jnp.asarray(dev["atlas"]), jnp.asarray(dev["tex_table"]),
            jnp.asarray(dev["mip_y"]), jnp.asarray(dev["mip_x"]))


def _grazing_inputs(h=16, w=256, ratio=8.0, size=128):
    """Screen-shaped uv field with a uniform ratio-``ratio`` footprint."""
    ys, xs = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                          jnp.arange(w, dtype=jnp.float32), indexing="ij")
    uv = jnp.stack([0.2 + xs / w * 0.6, 0.2 + ys / h * 0.1], -1)
    duv_dx = jnp.broadcast_to(jnp.asarray([ratio / size, 0.0]), (h, w, 2))
    duv_dy = jnp.broadcast_to(jnp.asarray([0.0, 1.0 / size]), (h, w, 2))
    return uv, duv_dx, duv_dy


def _tex_planes(table, shape):
    row = table[0]
    tex = {k: jnp.full(shape, row[i]) for i, k in
           enumerate(("page", "x", "y", "w", "h"))}
    return tex, jnp.full(shape, row[5])


class TestTieredAniso:
    def test_full_budget_matches_dense_exact(self):
        atlas, table, mip_y, mip_x = _atlas(_ramp())
        uv, dx, dy = _grazing_inputs()
        tex, n_mips = _tex_planes(table, uv.shape[:2])
        dense = sampling.sample_texture_aniso(
            atlas, mip_y, mip_x, tex, n_mips, uv, dx, dy, 16)
        tiered = sampling.sample_texture_aniso_tiered(
            atlas, mip_y, mip_x, tex, n_mips, uv, dx, dy,
            AnisoSpec(16, (1.0, 1.0, 1.0)))
        np.testing.assert_allclose(np.asarray(tiered), np.asarray(dense),
                                   atol=1e-5)

    def test_past_budget_falls_back_to_isotropic(self):
        """With a 1-tile budget, unselected tiles must equal plain
        trilinear at the MAJOR-axis LOD (standard no-aniso behavior) —
        never garbage or zeros. Texture varies along the MINOR axis
        (stripes), where aniso keeps detail that isotropic washes out,
        so the two candidate values are far apart."""
        size = 128
        stripes = np.zeros((size, size, 4), np.uint8)
        stripes[(np.arange(size) // 4) % 2 == 0, :, :3] = 255
        stripes[..., 3] = 255
        atlas, table, mip_y, mip_x = _atlas(stripes)
        uv, dx, dy = _grazing_inputs(h=32, w=256)   # 8 tiles of 8x128
        tex, n_mips = _tex_planes(table, uv.shape[:2])
        tiered = np.asarray(sampling.sample_texture_aniso_tiered(
            atlas, mip_y, mip_x, tex, n_mips, uv, dx, dy,
            AnisoSpec(16, (0.01, 0.01, 0.01))))
        iso = np.asarray(sampling.sample_texture_rows(
            atlas, mip_y, mip_x, tex, n_mips, uv,
            jnp.full(uv.shape[:2], 3.0)))          # log2(8) = 3
        dense = np.asarray(sampling.sample_texture_aniso(
            atlas, mip_y, mip_x, tex, n_mips, uv, dx, dy, 16))
        # every pixel is either the exact dense result (selected tile)
        # or the isotropic fallback
        d_exact = np.abs(tiered - dense).max(-1)
        d_iso = np.abs(tiered - iso).max(-1)
        assert (np.minimum(d_exact, d_iso) < 1e-5).all()
        # at least one tile fell back (budget was 1 of 8 tiles) and at
        # least one got the exact taps
        crisp = np.abs(dense - iso).max(-1) > 0.1   # where they differ
        assert (d_exact[crisp] > 0.1).any()
        assert (d_iso[crisp] > 0.1).any()

    def test_isotropic_pixels_bypass_taps(self):
        """Ratio-1 footprints take the base trilinear path bit-exactly."""
        atlas, table, mip_y, mip_x = _atlas(_ramp())
        uv, _, _ = _grazing_inputs()
        h, w = uv.shape[:2]
        dx = jnp.broadcast_to(jnp.asarray([1.0 / 128, 0.0]), (h, w, 2))
        dy = jnp.broadcast_to(jnp.asarray([0.0, 1.0 / 128]), (h, w, 2))
        tex, n_mips = _tex_planes(table, (h, w))
        tiered = np.asarray(sampling.sample_texture_aniso_tiered(
            atlas, mip_y, mip_x, tex, n_mips, uv, dx, dy,
            AnisoSpec(16, (0.5, 0.5, 0.5))))
        tri = np.asarray(sampling.sample_texture_rows(
            atlas, mip_y, mip_x, tex, n_mips, uv,
            jnp.zeros((h, w))))
        np.testing.assert_allclose(tiered, tri, atol=1e-5)


class TestBayerAniso:
    def test_block_mean_tracks_dense(self):
        """Per-4x4-block mean of the Bayer-distributed taps approximates
        the dense 16-tap footprint average on a smooth ramp."""
        atlas, table, mip_y, mip_x = _atlas(_ramp())
        uv, dx, dy = _grazing_inputs(h=16, w=256, ratio=16.0)
        tex, n_mips = _tex_planes(table, uv.shape[:2])
        dense = np.asarray(sampling.sample_texture_aniso(
            atlas, mip_y, mip_x, tex, n_mips, uv, dx, dy, 16))
        bayer = np.asarray(sampling.sample_texture_aniso(
            atlas, mip_y, mip_x, tex, n_mips, uv, dx, dy, 16,
            dither=True))
        db = (dense[..., 0].reshape(4, 4, 64, 4).mean((1, 3)))
        bb = (bayer[..., 0].reshape(4, 4, 64, 4).mean((1, 3)))
        assert np.abs(db - bb).max() < 0.06

    def test_isotropic_equals_dithered_trilinear(self):
        """Ratio-1 pixels reduce to one dithered-trilinear tap exactly."""
        atlas, table, mip_y, mip_x = _atlas(_ramp())
        uv, _, _ = _grazing_inputs()
        h, w = uv.shape[:2]
        dx = jnp.broadcast_to(jnp.asarray([1.5 / 128, 0.0]), (h, w, 2))
        dy = jnp.broadcast_to(jnp.asarray([0.0, 1.5 / 128]), (h, w, 2))
        tex, n_mips = _tex_planes(table, (h, w))
        bayer = np.asarray(sampling.sample_texture_aniso(
            atlas, mip_y, mip_x, tex, n_mips, uv, dx, dy, 16, dither=True))
        tri = np.asarray(sampling.sample_texture_rows(
            atlas, mip_y, mip_x, tex, n_mips, uv,
            jnp.full((h, w), float(np.log2(1.5))), dither=True))
        np.testing.assert_allclose(bayer, tri, atol=1e-5)
