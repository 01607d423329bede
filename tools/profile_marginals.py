#!/usr/bin/env python
"""Marginal per-feature frame costs via config differencing — the fused,
in-context numbers the stage-isolated breakdown overestimates.

Run on chip: python tools/profile_marginals.py
"""

import argparse
import sys

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=6)
    ap.add_argument("--shadow-extent", type=int, default=4096)
    args = ap.parse_args()

    import jax
    import numpy as np

    from renderengine_tpu.core import engine
    engine.init()
    from renderengine_tpu.core.config import RenderConfig
    from renderengine_tpu.graph.frame import FrameRenderer
    from renderengine_tpu.scene import procedural
    from renderengine_tpu.utils.profiling import time_jitted

    w, h = 1920, 1080
    scene = procedural.sponza_scene(width=w, height=h, n_textures=200,
                                    target_tris=260_000)

    def frame_time(tag, **kw):
        cfg = RenderConfig(width=w, height=h,
                           shadow_extent=args.shadow_extent, **kw)
        r = FrameRenderer(scene, cfg, backend="pallas")
        u = jax.device_put(np.asarray(r.uniform_for_camera()))
        sm = None
        if r.n_shadows > 0:
            sm_t = r._shadow_fn(r.scene_dev, u)
            sm = sm_t[0] if isinstance(sm_t, tuple) else sm_t
        t = time_jitted(lambda: r._fn(r.scene_dev, u, sm), reps=args.reps)
        print(f"{tag:46s} {t['min']*1e3:8.2f} ms (med {t['median']*1e3:.2f})",
              file=sys.stderr)
        return t["min"] * 1e3

    full = frame_time("full (shadows+translucency+debug)")
    nodbg = frame_time("debug selects off", debug_views=False)
    nosh = frame_time("shadows off", shadows=False, debug_views=False)
    notr = frame_time("translucency off", translucency=False,
                      debug_views=False)
    nost = frame_time("shadows+translucency off", shadows=False,
                      translucency=False, debug_views=False)
    print(f"# marginals: debug={full-nodbg:.1f} shadows(PCFx3)="
          f"{nodbg-nosh:.1f} translucency(2 peels)={nodbg-notr:.1f} "
          f"base(opaque only)={nost:.1f}", file=sys.stderr)


if __name__ == "__main__":
    main()
