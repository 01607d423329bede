"""Dense-grid binning (binning.py::_bin_dense): same tile segments as
the scatter+cummax path MINUS pairs removed by the exact-coverage corner
test — which must be conservative (never culls a (tri, tile) whose tile
contains a pixel the kernel's own coverage predicate would accept)."""

import numpy as np
import jax.numpy as jnp
import pytest

from renderengine_tpu.raster.binning import bin_triangles
from renderengine_tpu.raster.setup import TriSetup

W, H, TH, TW = 640, 360, 8, 32
NTX, NTY = -(-W // TW), -(-H // TH)
N_TILES = NTX * NTY


def _tri_setup(n, seed=0, big_frac=0.05):
    """Real edge planes from random screen-space triangles, in the
    kernel's centered pixel coordinates (px = ix + 0.5 - W/2)."""
    rng = np.random.default_rng(seed)
    cx = rng.uniform(0, W, n)
    cy = rng.uniform(0, H, n)
    sz = rng.uniform(2, 24, n)
    big = rng.random(n) < big_frac
    sz = np.where(big, rng.uniform(100, 400, n), sz)
    ang = rng.uniform(0, 2 * np.pi, (n, 3))
    r = rng.uniform(0.3, 1.0, (n, 3)) * sz[:, None]
    vx = cx[:, None] + r * np.cos(ang)
    vy = cy[:, None] + r * np.sin(ang)
    # CCW order so edge functions are positive inside
    area2 = ((vx[:, 1] - vx[:, 0]) * (vy[:, 2] - vy[:, 0])
             - (vx[:, 2] - vx[:, 0]) * (vy[:, 1] - vy[:, 0]))
    flip = area2 < 0
    vx[:, 1][flip], vx[:, 2][flip] = vx[:, 2][flip], vx[:, 1][flip].copy()
    vy[:, 1][flip], vy[:, 2][flip] = vy[:, 2][flip], vy[:, 1][flip].copy()
    # centered coords
    ux = vx - W * 0.5
    uy = vy - H * 0.5
    coef = np.zeros((n, 5, 3), np.float32)
    for e in range(3):
        x0, y0 = ux[:, e], uy[:, e]
        x1, y1 = ux[:, (e + 1) % 3], uy[:, (e + 1) % 3]
        coef[:, e, 0] = y1 - y0
        coef[:, e, 1] = x0 - x1
        coef[:, e, 2] = x1 * y0 - x0 * y1
    bbox = np.stack([np.clip(np.floor(vx.min(1)), 0, W - 1),
                     np.clip(np.floor(vy.min(1)), 0, H - 1),
                     np.clip(np.ceil(vx.max(1)), 0, W - 1),
                     np.clip(np.ceil(vy.max(1)), 0, H - 1)],
                    axis=1).astype(np.int32)
    valid = np.abs(area2) > 1e-3
    return TriSetup(coef=jnp.asarray(coef), bbox=jnp.asarray(bbox),
                    valid=jnp.asarray(valid),
                    tie=jnp.zeros((n, 3), bool),
                    packed=jnp.zeros((n, 24), jnp.float32)), coef


def _as_sets(bins):
    starts = np.asarray(bins.starts)
    counts = np.asarray(bins.counts)
    tri = np.asarray(bins.pair_tri)
    valid = np.asarray(bins.pair_valid)
    out = {}
    for t in range(N_TILES):
        s, c = starts[t], counts[t]
        seg = tri[s:s + c][valid[s:s + c]]
        if len(seg):
            out[t] = list(seg)
    return out


def _covered_pixels(coef_t, tile):
    """Pixels of `tile` strictly inside all 3 edges (the kernel's
    cover test sans depth), evaluated in centered coords."""
    ty, tx = divmod(tile, NTX)
    ix = np.arange(tx * TW, min((tx + 1) * TW, W))
    iy = np.arange(ty * TH, min((ty + 1) * TH, H))
    px = ix + 0.5 - W * 0.5
    py = iy + 0.5 - H * 0.5
    pxg, pyg = np.meshgrid(px, py)
    ok = np.ones_like(pxg, bool)
    for e in range(3):
        a, b, c = coef_t[e]
        ok &= (a * pxg + b * pyg + c) > 0
    return ok.any()


@pytest.mark.parametrize("seed", [0, 1])
def test_dense_is_conservative_subset(seed):
    setup, coef = _tri_setup(3000, seed=seed)
    budget = 300_000
    a = bin_triangles(setup, H, W, TH, TW, budget)
    b = bin_triangles(setup, H, W, TH, TW, budget, dense_k=4)
    assert int(a.n_overflow) == 0 and int(b.n_overflow) == 0
    sa, sb = _as_sets(a), _as_sets(b)
    culled = []
    for t, seg in sa.items():
        segb = sb.get(t, [])
        # dense <= bbox, ascending ids preserved
        assert set(segb) <= set(seg)
        assert segb == sorted(segb)
        culled.extend((tri, t) for tri in set(seg) - set(segb))
    # the cull must pay for itself on this scene
    na = sum(len(v) for v in sa.values())
    nb = sum(len(v) for v in sb.values())
    assert nb < na, (nb, na)
    # and be EXACT: no culled (tri, tile) contains a covered pixel
    rng = np.random.default_rng(seed)
    sample = [culled[i] for i in
              rng.choice(len(culled), min(400, len(culled)), replace=False)]
    for tri, tile in sample:
        assert not _covered_pixels(coef[tri], tile), (tri, tile)
    # nothing covered may be culled, checked exhaustively per kept tile
    for t, seg in sa.items():
        for tri in seg:
            if _covered_pixels(coef[tri], t):
                assert tri in sb.get(t, []), (tri, t)


def test_dense_overflow_accounting():
    setup, _ = _tri_setup(3000, seed=2)
    ample = bin_triangles(setup, H, W, TH, TW, 300_000, dense_k=4)
    live = int(np.asarray(ample.pair_valid).sum())
    assert int(ample.n_overflow) == 0
    tight = live // 2
    b = bin_triangles(setup, H, W, TH, TW, tight, dense_k=4)
    assert int(b.n_overflow) == live - tight
    assert int(np.asarray(b.pair_valid).sum()) == tight
