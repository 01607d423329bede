#!/usr/bin/env python
"""Regenerate the frozen golden frames under tests/goldens/.

Renders each BASELINE milestone config (tests/golden_configs.py) with the
brute-force ``reference`` raster backend — the semantic golden model the
tiled and Pallas backends are exactness-tested against — on the CPU
platform, and writes the sRGB8 PNGs.

Run after an INTENTIONAL shading/pipeline change, eyeball the diffs, and
commit the new goldens. tests/test_golden.py fails on any drift.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tpu", action="store_true",
                    help="render the goldens ON THE TPU (reference "
                    "backend) into tests/goldens_tpu/. Goldens are frozen "
                    "PER PLATFORM because CPU and TPU f32 edge-function "
                    "evaluation differs by ulps, flipping the winner on "
                    "~0.3%% of shared-edge pixels (one pixel per row along "
                    "a quad diagonal — measured round 5); hardware "
                    "rasterizers avoid this with fixed-point subpixel "
                    "snapping, we document it and gate each platform "
                    "against its own render of the SAME reference model.")
    args = ap.parse_args()

    import jax

    if not args.tpu:
        # env-var pinning is ignored here (sitecustomize pre-registers the
        # axon TPU plugin into jax_platforms); only config.update works
        jax.config.update("jax_platforms", "cpu")

    import numpy as np

    from renderengine_tpu.core import engine
    from renderengine_tpu.graph.frame import FrameRenderer
    from renderengine_tpu.utils.png import write_png
    from golden_configs import golden_cases

    if args.tpu:
        engine.init()
        assert jax.default_backend() != "cpu", \
            "--tpu requires the TPU device (axon platform)"

    sub = "goldens_tpu" if args.tpu else "goldens"
    out_dir = os.path.join(os.path.dirname(__file__), "..", "tests", sub)
    os.makedirs(out_dir, exist_ok=True)
    for name, factory, cfg in golden_cases():
        r = FrameRenderer(factory(), cfg, backend="reference")
        img = np.asarray(r.render())
        path = os.path.join(out_dir, f"{name}.png")
        write_png(path, img)
        print(f"{name}: {img.shape} -> {path}", flush=True)


if __name__ == "__main__":
    main()
