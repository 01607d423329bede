"""Dense-grid binning (binning.py::_bin_dense) must produce the same
tile segments as the scatter+cummax path — it is a pure execution-
strategy swap (the camera pass's two head-scatters dominate binning cost
on chip; the dense [T,k] grid replaces them with vector math)."""

import numpy as np
import jax.numpy as jnp
import pytest

from renderengine_tpu.raster.binning import bin_triangles
from renderengine_tpu.raster.setup import TriSetup


def _random_setup(n, w, h, seed=0, big_frac=0.05):
    rng = np.random.default_rng(seed)
    cx = rng.uniform(0, w, n).astype(np.float32)
    cy = rng.uniform(0, h, n).astype(np.float32)
    sz = rng.uniform(2, 24, n).astype(np.float32)
    big = rng.random(n) < big_frac
    sz = np.where(big, rng.uniform(100, 500, n), sz).astype(np.float32)
    x0 = np.clip(cx - sz, 0, w - 1)
    x1 = np.clip(cx + sz, 0, w - 1)
    y0 = np.clip(cy - sz, 0, h - 1)
    y1 = np.clip(cy + sz, 0, h - 1)
    bbox = np.stack([x0, y0, x1, y1], axis=1).astype(np.int32)
    valid = rng.random(n) < 0.9
    coef = np.zeros((n, 5, 3), np.float32)
    return TriSetup(coef=jnp.asarray(coef), bbox=jnp.asarray(bbox),
                    valid=jnp.asarray(valid),
                    tie=jnp.zeros((n, 3), bool),
                    packed=jnp.zeros((n, 24), jnp.float32))


def _as_sets(bins, n_tiles):
    starts = np.asarray(bins.starts)
    counts = np.asarray(bins.counts)
    tri = np.asarray(bins.pair_tri)
    valid = np.asarray(bins.pair_valid)
    out = {}
    for t in range(n_tiles):
        s, c = starts[t], counts[t]
        seg = tri[s:s + c][valid[s:s + c]]
        if len(seg):
            out[t] = list(seg)
    return out


@pytest.mark.parametrize("seed", [0, 1])
def test_dense_matches_fill_path(seed):
    w, h, th, tw = 640, 360, 8, 32
    n_tiles = (-(-w // tw)) * (-(-h // th))
    setup = _random_setup(4000, w, h, seed=seed)
    budget = 200_000  # ample: no drops either path
    a = bin_triangles(setup, h, w, th, tw, budget)
    b = bin_triangles(setup, h, w, th, tw, budget, dense_k=4)
    assert int(a.n_overflow) == 0 and int(b.n_overflow) == 0
    sa, sb = _as_sets(a, n_tiles), _as_sets(b, n_tiles)
    assert sa == sb
    # within-tile order (the raster tie rule): ascending triangle ids
    for seg in sb.values():
        assert seg == sorted(seg)


def test_dense_overflow_counts_match():
    w, h, th, tw = 640, 360, 8, 32
    setup = _random_setup(4000, w, h, seed=2)
    full = bin_triangles(setup, h, w, th, tw, 200_000)
    live = int(np.asarray(full.pair_valid).sum())
    tight = live // 2
    a = bin_triangles(setup, h, w, th, tw, tight)
    b = bin_triangles(setup, h, w, th, tw, tight, dense_k=4)
    assert int(a.n_overflow) == live - tight
    assert int(b.n_overflow) == live - tight
    # the kept pairs are the budget-truncated sorted prefix in both
    assert np.asarray(a.pair_valid).sum() == np.asarray(b.pair_valid).sum()


def test_dense_no_big_tail():
    """k large enough that the dense grid covers everything: the big-tri
    stream must stay silent (all-invalid keys)."""
    w, h, th, tw = 320, 240, 8, 32
    n_tiles = (-(-w // tw)) * (-(-h // th))
    setup = _random_setup(500, w, h, seed=3, big_frac=0.0)
    a = bin_triangles(setup, h, w, th, tw, 50_000)
    b = bin_triangles(setup, h, w, th, tw, 50_000, dense_k=16)
    assert _as_sets(a, n_tiles) == _as_sets(b, n_tiles)
