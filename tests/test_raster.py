"""Rasterizer semantics tests (brute-force golden model).

These pin down the conventions everything else must match: viewport
mapping, winding/culling, the top-left tie rule, LessOrEqual depth with
lowest-id ties, and clipless near-plane behavior.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from renderengine_tpu.core.config import CullMode
from renderengine_tpu.raster.setup import triangle_setup, vertex_transform
from renderengine_tpu.raster.reference_raster import rasterize_reference, barycentrics_at
from renderengine_tpu.core import math3d
from renderengine_tpu.scene import procedural


def setup_from_ndc(tris_ndc, w, h, cull=CullMode.BACK, depth=None):
    """tris_ndc: [T,3,2] ndc xy; depth: [T] ndc z (default 0.5)."""
    tris = np.asarray(tris_ndc, np.float32)
    t = len(tris)
    z = np.full(t, 0.5, np.float32) if depth is None else np.asarray(depth, np.float32)
    clip = np.zeros((t * 3, 4), np.float32)
    clip[:, 0] = tris[:, :, 0].reshape(-1)
    clip[:, 1] = tris[:, :, 1].reshape(-1)
    clip[:, 2] = np.repeat(z, 3)
    clip[:, 3] = 1.0
    vidx = np.arange(t * 3, dtype=np.int32).reshape(t, 3)
    return triangle_setup(jnp.asarray(clip), jnp.asarray(vidx), jnp.int32(t), w, h, cull)


# In NDC with y down (Vulkan), "visually CCW" on screen means CCW with y
# flipped. Helper: a right triangle covering the top-left of the screen.
# NDC (-1,-1) is the TOP-left corner in Vulkan.
TL_TRI = [[[-1, -1], [-1, 1], [1, -1]]]  # visually: top-left, bottom-left, top-right


class TestCoverage:
    def test_fullscreen_quad_covers_every_pixel_once(self):
        # two triangles splitting the NDC square along the diagonal; both
        # wound visually-CCW => front-facing
        tris = [
            [[-1, -1], [-1, 1], [1, -1]],
            [[1, -1], [-1, 1], [1, 1]],
        ]
        s = setup_from_ndc(tris, 16, 16)
        assert np.array(s.valid).all(), "both quad halves must be front-facing"
        g = rasterize_reference(s, 16, 16)
        assert (np.array(g.tri_id) >= 0).all(), "no gaps"
        # each triangle covers ~half: shared diagonal must not double-draw;
        # with lowest-id tie-break doubles would all go to tri 0
        counts = np.bincount(np.array(g.tri_id).ravel(), minlength=2)
        assert counts[0] + counts[1] == 256
        # the 16 shared-diagonal centers belong to exactly one side (the
        # triangle for which the diagonal is a left edge => tri 1)
        assert counts[0] == 120 and counts[1] == 136

    def test_winding_cull(self):
        s = setup_from_ndc(TL_TRI, 8, 8, CullMode.BACK)
        assert bool(np.array(s.valid)[0])
        flipped = [[TL_TRI[0][0], TL_TRI[0][2], TL_TRI[0][1]]]
        s2 = setup_from_ndc(flipped, 8, 8, CullMode.BACK)
        assert not bool(np.array(s2.valid)[0])
        s3 = setup_from_ndc(flipped, 8, 8, CullMode.NONE)
        assert bool(np.array(s3.valid)[0])
        g3 = rasterize_reference(s3, 8, 8)
        assert (np.array(g3.tri_id) >= 0).any()
        s4 = setup_from_ndc(flipped, 8, 8, CullMode.FRONT)
        assert bool(np.array(s4.valid)[0])
        s5 = setup_from_ndc(TL_TRI, 8, 8, CullMode.FRONT)
        assert not bool(np.array(s5.valid)[0])

    def test_halfscreen_triangle_pixel_count(self):
        # TL_TRI covers pixels strictly above the anti-diagonal: on an 8x8
        # grid with centers at +0.5 the diagonal passes exactly through
        # pixel centers; the tie rule must give a consistent half.
        s = setup_from_ndc(TL_TRI, 8, 8)
        g = rasterize_reference(s, 8, 8)
        covered = (np.array(g.tri_id) >= 0)
        # upper-left half including the diagonal centers = 36, excluding = 28
        assert covered.sum() in (28, 36)
        assert covered[0, 0] and not covered[7, 7]

    def test_depth_order_and_tie(self):
        # two fullscreen tris at different depths: nearer wins
        tris = [TL_TRI[0], TL_TRI[0]]
        s = setup_from_ndc(tris, 8, 8, depth=[0.7, 0.3])
        g = rasterize_reference(s, 8, 8)
        ids = np.array(g.tri_id)
        assert (ids[ids >= 0] == 1).all()
        d = np.array(g.depth)
        assert np.allclose(d[ids >= 0], 0.3, atol=1e-6)
        # equal depth: lowest id wins
        s2 = setup_from_ndc(tris, 8, 8, depth=[0.5, 0.5])
        g2 = rasterize_reference(s2, 8, 8)
        ids2 = np.array(g2.tri_id)
        assert (ids2[ids2 >= 0] == 0).all()

    def test_empty_pixels_are_cleared(self):
        s = setup_from_ndc([[[-1, -1], [-1, -0.9], [-0.9, -1]]], 8, 8)
        g = rasterize_reference(s, 8, 8)
        ids = np.array(g.tri_id)
        assert (np.array(g.depth)[ids < 0] == 1.0).all()


class TestClipless:
    def test_near_plane_crossing(self):
        # a triangle with one vertex behind the eye must still raster its
        # visible part and never produce w<=0 fragments
        clip = np.array(
            [
                [0.0, -0.5, 0.25, 0.5],   # in front
                [-0.5, 0.5, 0.25, 0.5],
                [0.5, 0.5, -0.25, -0.5],  # behind the eye (w < 0)
            ],
            np.float32,
        )
        vidx = np.array([[0, 1, 2]], np.int32)
        for cull in (CullMode.NONE,):
            s = triangle_setup(jnp.asarray(clip), jnp.asarray(vidx), jnp.int32(1), 32, 32, cull)
            g = rasterize_reference(s, 32, 32)
            ids = np.array(g.tri_id)
            assert (ids >= 0).any(), "visible part must raster"
            d = np.array(g.depth)[ids >= 0]
            assert (d >= 0).all() and (d <= 1).all()

    def test_fully_behind_rejected(self):
        clip = np.array(
            [[0, 0, -0.5, -1.0], [0.5, 0, -0.5, -1.0], [0, 0.5, -0.5, -1.0]], np.float32
        )
        s = triangle_setup(jnp.asarray(clip), jnp.asarray(np.array([[0, 1, 2]], np.int32)),
                           jnp.int32(1), 16, 16, CullMode.NONE)
        g = rasterize_reference(s, 16, 16)
        assert (np.array(g.tri_id) < 0).all()


class TestBarycentrics:
    def test_perspective_correct_interpolation(self):
        # a "floor" quad receding in depth: uv interpolation must be
        # perspective correct (compare against analytic ray/plane hit)
        view = math3d.look_at([0, 1, 3], [0, 0, 0], [0, 1, 0])
        proj = math3d.perspective_vk(np.radians(60), 1.0, 0.1, 50.0)
        pts = np.array([[-5, 0, 5], [5, 0, 5], [5, 0, -5], [-5, 0, -5]], np.float32)
        uvs = np.array([[0, 0], [1, 0], [1, 1], [0, 1]], np.float32)
        clip = np.c_[pts, np.ones(4)] @ (proj @ view).T
        vidx = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
        h = w = 64
        s = triangle_setup(jnp.asarray(clip.astype(np.float32)), jnp.asarray(vidx),
                           jnp.int32(2), w, h, CullMode.NONE)
        g = rasterize_reference(s, h, w)
        bary, _ = barycentrics_at(s.coef, g.tri_id, h, w)
        ids = np.array(g.tri_id)
        bary = np.array(bary)
        # interpolate world position and uv; verify world hit lies on y=0
        # and uv matches the linear world->uv map (u=(x+5)/10, v=(5-z)/10)
        corners = pts[np.array(vidx)[np.maximum(ids, 0)]]     # [H,W,3,3]
        cuv = uvs[np.array(vidx)[np.maximum(ids, 0)]]         # [H,W,3,2]
        wp = (bary[..., None] * corners).sum(-2)
        wuv = (bary[..., None] * cuv).sum(-2)
        m = ids >= 0
        assert m.any()
        assert np.allclose(wp[m][:, 1], 0.0, atol=1e-3)
        assert np.allclose(wuv[m][:, 0], (wp[m][:, 0] + 5) / 10, atol=2e-3)
        assert np.allclose(wuv[m][:, 1], (5 - wp[m][:, 2]) / 10, atol=2e-3)


class TestCubeScene:
    def test_cube_renders_sane(self):
        sc = procedural.cube_scene(width=64, height=64)
        dev = sc.upload()
        dev = {k: jnp.asarray(v) if isinstance(v, np.ndarray) else v for k, v in dev.items()}
        vo = vertex_transform(dev, jnp.asarray(sc.camera.view), jnp.asarray(sc.camera.proj))
        s = triangle_setup(vo.clip, dev["tri_vidx"], dev["n_tris"], 64, 64, CullMode.BACK)
        # exactly half the cube faces are front-facing (6 of 12 tris, plus
        # padding tris all invalid)
        assert int(np.array(s.valid).sum()) == 6
        g = rasterize_reference(s, 64, 64)
        ids = np.array(g.tri_id)
        frac = (ids >= 0).mean()
        assert 0.15 < frac < 0.85, f"cube should cover a sane fraction, got {frac}"
        d = np.array(g.depth)[ids >= 0]
        # depth must be in the reference's quirky [0.5, 1] band
        assert d.min() > 0.5 and d.max() < 1.0
