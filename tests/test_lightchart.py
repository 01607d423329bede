"""Light-chart (texture-space) shading: layout invariants + image parity
against the per-pixel reference path (``shading/lightchart.py``).

Parity tolerance is looser than the golden harness: lighting is
resampled at chart resolution by design, so a small fraction of pixels
(silhouettes, shadow penumbrae) legitimately moves by more than the
golden 1/255. The mode is config-gated (default off)."""

import numpy as np
import sys
import os

sys.path.insert(0, os.path.dirname(__file__))

from renderengine_tpu.graph.frame import FrameRenderer
from renderengine_tpu.scene import procedural
from renderengine_tpu.scene.camera import ViewProperties
from renderengine_tpu.shading import lightchart as lc


def _layout(w=192, h=144, tris=12_000, density=0.5, budget=2_000_000):
    sc = procedural.sponza_scene(width=w, height=h, n_textures=16,
                                 target_tris=tris)
    dev = sc.upload()
    vp = ViewProperties.from_camera(sc.camera)
    vpj = np.asarray(vp.proj) @ np.asarray(vp.view)
    valid = np.arange(len(dev["tri_vidx"])) < int(dev["n_tris"])
    lay = lc.build_layout(dev["tri_vidx"], dev["tri_material"],
                          dev["world_pos"], vpj, w, h, density, budget,
                          valid)
    return sc, dev, lay


class TestLayout:
    def test_bary_uv_roundtrip_exact(self):
        """corner_uv and texel_bary are exact inverses: mapping a texel's
        bary through its owner's corners lands on the texel."""
        _, dev, lay = _layout()
        iy, ix = np.nonzero(lay.texel_tri >= 0)
        sel = np.random.default_rng(0).choice(len(iy), 4000, replace=False)
        iy, ix = iy[sel], ix[sel]
        own = lay.texel_tri[iy, ix]
        tb = lay.texel_bary[iy, ix]
        cu = lay.corner_uv[own]
        uv = ((1 - tb[:, :1] - tb[:, 1:]) * cu[:, 0] + tb[:, :1] * cu[:, 1]
              + tb[:, 1:] * cu[:, 2])
        np.testing.assert_allclose(uv, np.stack([ix, iy], -1), atol=1e-3)

    def test_quad_mates_share_seamless_diagonal(self):
        """A texel owned by a tri's quad mate evaluates to the same world
        position through either triangle's plane — bilinear filtering
        across the shared diagonal is one surface."""
        _, dev, lay = _layout()
        tv, wp = dev["tri_vidx"], dev["world_pos"]
        rng = np.random.default_rng(1)
        tt = rng.integers(0, int(dev["n_tris"]), 3000)
        b1 = rng.uniform(0.05, 0.6, 3000)
        b2 = rng.uniform(0.05, 0.3, 3000)
        cu = lay.corner_uv[tt]
        uv = ((1 - b1 - b2)[:, None] * cu[:, 0] + b1[:, None] * cu[:, 1]
              + b2[:, None] * cu[:, 2])
        ix = np.clip(np.round(uv[:, 0]).astype(int), 0, lc.ATLAS_W - 1)
        iy = np.clip(np.round(uv[:, 1]).astype(int), 0, lay.height - 1)
        own = lay.texel_tri[iy, ix]
        m = (own >= 0) & (own != tt) & (np.ptp(cu, axis=(1, 2)) > 0)
        if not m.any():
            return
        tb = lay.texel_bary[iy[m], ix[m]]
        wo = wp[tv[own[m]]]
        w_owner = ((1 - tb[:, :1] - tb[:, 1:]) * wo[:, 0]
                   + tb[:, :1] * wo[:, 1] + tb[:, 1:] * wo[:, 2])
        cu2 = lay.corner_uv[tt[m]]
        d1 = cu2[:, 1] - cu2[:, 0]
        d2 = cu2[:, 2] - cu2[:, 0]
        det = d1[:, 0] * d2[:, 1] - d1[:, 1] * d2[:, 0]
        p = np.stack([ix[m], iy[m]], -1) - cu2[:, 0]
        bb1 = (p[:, 0] * d2[:, 1] - p[:, 1] * d2[:, 0]) / det
        bb2 = (p[:, 1] * d1[:, 0] - p[:, 0] * d1[:, 1]) / det
        wm = wp[tv[tt[m]]]
        w_mine = ((1 - bb1 - bb2)[:, None] * wm[:, 0]
                  + bb1[:, None] * wm[:, 1] + bb2[:, None] * wm[:, 2])
        assert np.abs(w_owner - w_mine).max() < 1e-4

    def test_budget_respected(self):
        _, _, lay = _layout(budget=300_000)
        assert lay.n_texels <= 300_000

    def test_density_scales_texels(self):
        _, _, hi = _layout(density=1.0)
        _, _, lo = _layout(density=0.25)
        assert lo.n_texels < hi.n_texels


class TestRgb9e5:
    def test_roundtrip_error_bound(self):
        """Shared-exponent packing: error <= 2^-9 of the max channel."""
        import jax.numpy as jnp
        rng = np.random.default_rng(0)
        x = rng.uniform(0, 1, (2048, 3)).astype(np.float32) ** 2
        x *= rng.choice([1e-3, 0.1, 1.0, 40.0], (2048, 1)).astype(np.float32)
        dec = np.asarray(lc.rgb9e5_decode(lc.rgb9e5_encode(jnp.asarray(x))))
        rel = np.abs(dec - x) / np.maximum(x.max(-1, keepdims=True), 1e-6)
        assert rel.max() <= 2.0 ** -9 + 1e-4

    def test_block_sample_matches_direct_bilinear(self):
        import jax.numpy as jnp
        rng = np.random.default_rng(1)
        atlas = rng.uniform(0, 4, (24, 48, 3)).astype(np.float32)
        # pack_rgbe_blocks takes the PLANAR [3,Ah,Aw] convention
        blocks = lc.pack_rgbe_blocks(jnp.moveaxis(jnp.asarray(atlas), -1, 0))
        uv = np.stack([rng.uniform(0, 47, 400),
                       rng.uniform(0, 23, 400)], -1).astype(np.float32)
        out = np.asarray(lc.sample_rgbe_blocks(blocks, jnp.asarray(uv),
                                               24, 48))
        ix = np.floor(uv[:, 0]).astype(int)
        iy = np.floor(uv[:, 1]).astype(int)
        fx = (uv[:, 0] - ix)[:, None]
        fy = (uv[:, 1] - iy)[:, None]
        x1 = np.minimum(ix + 1, 47)
        y1 = np.minimum(iy + 1, 23)
        ref = ((atlas[iy, ix] * (1 - fx) + atlas[iy, x1] * fx) * (1 - fy)
               + (atlas[y1, ix] * (1 - fx) + atlas[y1, x1] * fx) * fy)
        assert np.abs(out - ref).max() < 0.01 * max(1.0, ref.max())


_RENDER_MEMO: dict = {}


def _memo_render(factory, cfg):
    """Cache renders by config across TestParity cases: several tests
    share the same non-TSS base render, and each FrameRenderer build +
    CPU render costs ~10-20 s on the 1-core suite box."""
    key = repr(cfg)
    if key not in _RENDER_MEMO:
        _RENDER_MEMO[key] = np.asarray(
            FrameRenderer(factory(), cfg, backend="tiled").render())
    return _RENDER_MEMO[key]


class TestParity:
    def _pair(self, cfg_extra=None, density=1.0, base_density=None,
              base_tss=False, base_extra=None):
        import golden_configs
        cases = {n: (f, c) for n, f, c in golden_configs.golden_cases()}
        factory, cfg = cases["shadows_pcf"]
        # max_anisotropy=1 on BOTH sides: these tests measure the TSS
        # machinery vs the per-pixel path; the default-16 aniso forms
        # differ between the paths (tiered exact taps vs Bayer taps) and
        # would pollute the parity bound (round-4 regression: the aniso
        # default flip changed only the per-pixel side)
        cfg = cfg.replace(debug_views=False, max_anisotropy=1,
                          **(cfg_extra or {}))
        # TSS-only flags must not reach the non-TSS base render
        base = cfg.replace(tss_preshaded=False, tss_preshaded_blend=False)
        if base_tss:
            base = cfg.replace(texture_space=True,
                               chart_density=base_density or density,
                               **(base_extra or {}))
        a = _memo_render(factory, base)
        b = _memo_render(factory, cfg.replace(texture_space=True,
                                              chart_density=density))
        return a.astype(np.int32), b.astype(np.int32)

    def test_matches_per_pixel_path(self):
        """Factored TSS at density 1.0 vs the per-pixel path. Bounds are
        the DECLARED approximation quality (PARITY.md "TSS parity bounds"
        table): lighting resamples at chart resolution, so silhouettes,
        PCF penumbrae, and normal-mapped speculars legitimately move by a
        texel — measured on the honest normal/ORM scene: mean 4.08,
        73.8% within 4/255, 95.6% within 16/255."""
        a, b = self._pair()
        d = np.abs(a - b).max(-1)
        assert d.mean() < 4.5, d.mean()
        assert (d <= 4).mean() > 0.70, (d <= 4).mean()
        assert (d <= 16).mean() > 0.94, (d <= 16).mean()

    def test_halfres_light_parity(self):
        """density <= 0.5 switches the dense pass to half-res light
        sampling (chart-uv-guided upsample). Measured against the
        per-pixel-gather TSS path at the SAME density — the charts are
        coarse by configuration at 0.5 (TSS-vs-reference there is ~93%
        within 16/255 with either sampler); the half-res upsample itself
        must be near-lossless on top of that."""
        # same density both sides (identical geometry + charts); the
        # tss_halfres_light override isolates the sampler under test.
        # The bound tolerates the honest post-subdivision light field:
        # the point-light hotspot is crisp at ~2 px scale, so 2 px light
        # samples lose a little of it (that IS the approximation sold)
        perpix, half = self._pair({"tss_halfres_light": 1}, density=0.5,
                                  base_density=0.5, base_tss=True,
                                  base_extra={"tss_halfres_light": 0})
        d = np.abs(perpix - half).max(-1)
        # measured 1.62 mean / 98.3% within 16 on the honest scene (the
        # point-light hotspot is crisp at ~2 px scale at density 0.5)
        assert d.mean() < 1.8, d.mean()
        assert (d <= 16).mean() > 0.97, (d <= 16).mean()
        # and an absolute floor vs the non-TSS reference path
        ref, _ = self._pair(density=0.5)
        d = np.abs(ref - half).max(-1)
        assert d.mean() < 5.0, d.mean()
        assert (d <= 16).mean() > 0.90, (d <= 16).mean()

    def test_translucency_parity(self):
        a, b = self._pair({"translucency": True, "skybox": True})
        d = np.abs(a - b).max(-1)
        assert d.mean() < 4.0, d.mean()
        assert (d <= 16).mean() > 0.97, (d <= 16).mean()

    def test_preshaded_parity(self):
        """Pre-shaded charts (albedo baked at chart res, rgb composed in
        chart space, ONE block gather per pixel) at density 1.0 must stay
        close to the per-pixel path: texture detail is chart-resolution
        by design, so the tolerance matches the factored-TSS one."""
        a, b = self._pair({"tss_preshaded": True, "translucency": True,
                           "skybox": True})
        d = np.abs(a - b).max(-1)
        # measured 5.49 mean / 91.9% within 16 (PARITY.md table): albedo
        # AND lighting both live at chart res in this mode
        assert d.mean() < 6.0, d.mean()
        assert (d <= 16).mean() > 0.90, (d <= 16).mean()

    def test_preshaded_blend_parity(self):
        """Mixed mode (tss_preshaded_blend): only the translucent peels
        go pre-shaded — the opaque pass keeps the factored full-res
        albedo tap, so overall parity must sit between factored TSS and
        full preshaded (blend pixels are a minority and alpha-blended)."""
        a, b = self._pair({"tss_preshaded_blend": True,
                           "translucency": True, "skybox": True})
        d = np.abs(a - b).max(-1)
        assert d.mean() < 4.5, d.mean()
        assert (d <= 16).mean() > 0.96, (d <= 16).mean()

    def test_backend_parity_tss(self):
        """tiled and reference backends agree bit-for-bit (same light
        atlas, same taps) — the raster backend doesn't change TSS."""
        import golden_configs
        cases = {n: (f, c) for n, f, c in golden_configs.golden_cases()}
        factory, cfg = cases["shadows_pcf"]
        cfg = cfg.replace(debug_views=False, texture_space=True)
        a = np.asarray(FrameRenderer(factory(), cfg, backend="tiled").render())
        b = np.asarray(FrameRenderer(factory(), cfg,
                                     backend="reference").render())
        d = np.abs(a.astype(np.int32) - b.astype(np.int32))
        assert (d <= 1).mean() > 0.995


class TestChartSubdivision:
    """scene._chart_subdivide: huge-footprint triangles split so charts
    fit MAX_R / adapt texel density to perspective (scene/scene.py)."""

    def _scene(self):
        return procedural.sponza_scene(width=640, height=360,
                                       n_textures=8, target_tris=2000)

    def _pair_dev(self, density=1.0):
        sc = self._scene()
        vp = ViewProperties.from_camera(sc.camera)
        vpj = np.asarray(vp.proj) @ np.asarray(vp.view)
        d0 = sc.upload()
        d1 = sc.upload(chart_subdiv=dict(viewproj=vpj, width=640,
                                         height=360, density=density))
        return d0, d1, vpj

    def test_splits_floor_and_bounds_charts(self):
        d0, d1, vpj = self._pair_dev()
        assert int(d1["n_tris"]) > int(d0["n_tris"])
        # after subdivision no live triangle wants more than MAX_R texels
        valid = np.arange(len(d1["tri_vidx"])) < int(d1["n_tris"])
        area = lc._footprint_px(d1["world_pos"][d1["tri_vidx"]], vpj,
                                640, 360)
        r = 1.0 * np.sqrt(2.0 * np.maximum(area, 1.0))
        assert (r[valid] <= lc.MAX_R + 1e-3).all(), r[valid].max()

    def test_no_cracks_and_winding(self):
        """Subdivided surfaces: every sub-edge vertex lies exactly on the
        parent surface (bitwise-equal shared edges by construction), and
        total signed screen area is preserved per alpha-mode segment —
        winding never flips."""
        d0, d1, vpj = self._pair_dev()

        def signed_area_sum(dev):
            w = dev["world_pos"][dev["tri_vidx"]]   # [T,3,3]
            n = int(dev["n_tris"])
            cr = np.cross(w[:n, 1] - w[:n, 0], w[:n, 2] - w[:n, 0])
            return cr.sum(0)   # vector area: additive under subdivision
        np.testing.assert_allclose(signed_area_sum(d0), signed_area_sum(d1),
                                   rtol=1e-4, atol=1e-4)

    def test_mates_stay_paired(self):
        """Sub-triangle up/down pairs land at even/odd adjacent slots so
        the chart packer mates them (seamless cell diagonals)."""
        _, d1, _ = self._pair_dev()
        n = int(d1["n_tris"])
        partner = lc._quad_mates(d1["tri_vidx"][:n], d1["tri_material"][:n])
        # the bulk of live tris should be paired (procedural scene is
        # quads + sphere strips; subdivision must not break this)
        assert (partner >= 0).mean() > 0.6, (partner >= 0).mean()

    def test_footprint_nearclip(self):
        """A triangle with one corner behind the camera measures its
        clipped on-screen area, not a tiny constant."""
        # projection-like matrix: w = z (identity would put w = 1
        # everywhere and nothing could be 'behind')
        vpj = np.array([[1, 0, 0, 0], [0, 1, 0, 0],
                        [0, 0, 1, 0], [0, 0, 1, 0]], np.float32)
        # corner 2 sits behind (w = z <= 0), the rest near the viewport
        tri = np.array([[[-0.5, -0.5, 1.0], [0.5, -0.5, 1.0],
                         [0.0, 0.0, -1.0]]], np.float32)
        a = lc._footprint_px(tri, vpj, 100, 100)
        assert a[0] > 500.0, a      # clipped quad covers real screen area
        behind = np.array([[[0, 0, -1.0], [1, 0, -1.0], [0, 1, -1.0]]],
                          np.float32)
        assert lc._footprint_px(behind, vpj, 100, 100)[0] == 64.0


class TestPreshadedHalfres:
    def test_preshaded_halfres_parity(self):
        """The dense pre-shaded half-grid gather + chart-uv-guided
        upsample (tss_shade_pre_halfres — the headline's dense-peel path
        at density <= 0.5) must be near-lossless vs the full-res
        pre-shaded gather at the SAME density."""
        import golden_configs
        cases = {n: (f, c) for n, f, c in golden_configs.golden_cases()}
        factory, cfg = cases["shadows_pcf"]
        cfg = cfg.replace(debug_views=False, texture_space=True,
                          tss_preshaded_blend=True, translucency=True,
                          skybox=True, chart_density=0.5)
        full = _memo_render(factory, cfg.replace(tss_halfres_light=0))
        half = _memo_render(factory, cfg.replace(tss_halfres_light=1))
        d = np.abs(full.astype(np.int32) - half.astype(np.int32)).max(-1)
        assert d.mean() < 2.0, d.mean()
        assert (d <= 16).mean() > 0.97, (d <= 16).mean()
