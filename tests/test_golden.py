"""Golden-frame pixel-parity harness (BASELINE.md: "pixel-matching the
Vulkan reference"; SURVEY §7 hard part 3).

The frozen PNGs under ``tests/goldens/`` are the five BASELINE milestone
configs rendered by the brute-force ``reference`` backend (the semantic
golden model — regenerate with ``python tools/make_goldens.py`` after an
intentional change and review the diff).

Tolerance, stated: the production backend must match each golden within
**1/255 per channel on >= 99.9% of pixels, and 4/255 everywhere**. The
reference backend itself must match bit-exactly (catches any drift in the
shading/compositing chain, since raster exactness across backends is
covered by tests/test_tiled.py + tests/test_pallas_raster.py).
"""

import os

import numpy as np
import pytest

from renderengine_tpu.graph.frame import FrameRenderer
from renderengine_tpu.utils.png import read_png

from golden_configs import golden_cases

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "goldens")
CASES = golden_cases()


def _golden(name):
    path = os.path.join(GOLDEN_DIR, f"{name}.png")
    if not os.path.exists(path):
        pytest.fail(f"missing golden {path}; run tools/make_goldens.py")
    return read_png(path)


@pytest.mark.parametrize("name,factory,cfg", CASES,
                         ids=[c[0] for c in CASES])
def test_reference_backend_matches_golden_exactly(name, factory, cfg):
    r = FrameRenderer(factory(), cfg, backend="reference")
    img = np.asarray(r.render())
    np.testing.assert_array_equal(img, _golden(name))


@pytest.mark.parametrize("name,factory,cfg", CASES,
                         ids=[c[0] for c in CASES])
def test_production_backend_matches_golden(name, factory, cfg):
    """Tiled backend (the CPU stand-in for the TPU production path; the
    pallas kernel is exactness-tested against tiled/reference at the
    raster level) within the documented tolerance."""
    r = FrameRenderer(factory(), cfg, backend="tiled")
    img = np.asarray(r.render()).astype(np.int32)
    gold = _golden(name).astype(np.int32)
    diff = np.abs(img - gold).max(axis=-1)
    frac_within_1 = float((diff <= 1).mean())
    assert frac_within_1 >= 0.999, (
        f"{name}: only {frac_within_1:.4%} of pixels within 1/255")
    assert diff.max() <= 4, f"{name}: max channel diff {diff.max()} > 4"
