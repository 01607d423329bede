#!/usr/bin/env python
"""Regenerate the frozen golden frames under tests/goldens/.

Renders each BASELINE milestone config (tests/golden_configs.py) with the
brute-force ``reference`` raster backend — the semantic golden model the
tiled and Pallas backends are exactness-tested against — on the CPU
platform, and writes the sRGB8 PNGs.

Run after an INTENTIONAL shading/pipeline change, eyeball the diffs, and
commit the new goldens. tests/test_golden.py fails on any drift.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))

import jax  # noqa: E402

# env-var pinning is ignored here (sitecustomize pre-registers the axon
# TPU plugin into the jax_platforms config); only config.update works
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

from renderengine_tpu.graph.frame import FrameRenderer  # noqa: E402
from renderengine_tpu.utils.png import write_png  # noqa: E402
from golden_configs import golden_cases  # noqa: E402


def main():
    out_dir = os.path.join(os.path.dirname(__file__), "..", "tests", "goldens")
    os.makedirs(out_dir, exist_ok=True)
    for name, factory, cfg in golden_cases():
        r = FrameRenderer(factory(), cfg, backend="reference")
        img = np.asarray(r.render())
        path = os.path.join(out_dir, f"{name}.png")
        write_png(path, img)
        print(f"{name}: {img.shape} -> {path}")


if __name__ == "__main__":
    main()
