#!/usr/bin/env python
"""Device-trace breakdown of the steady-state headline frame: capture a
``jax.profiler`` trace of a few frames and aggregate per-op device time
(the chrome-trace JSON the TensorBoard plugin writes), printing the top
rows grouped by fusion name. Ground truth for PERF.md — stage-isolated
jits overcount by dispatch latency and lost fusion.

Run on chip: python tools/trace_frame.py [--texture-space]
"""

import argparse
import glob
import gzip
import json
import os
import shutil
import sys
from collections import defaultdict

import numpy as np

sys.path.insert(0, ".")


def aggregate(trace_dir: str) -> dict:
    paths = glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"),
                      recursive=True)
    if not paths:
        raise SystemExit(f"no trace.json.gz under {trace_dir}")
    with gzip.open(sorted(paths)[-1], "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    # device lanes: pid whose process_name mentions TPU/device; XLA ops are
    # "X" phase events with dur in us
    pid_name = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_name[e.get("pid")] = e.get("args", {}).get("name", "")
    dev_pids = {p for p, n in pid_name.items()
                if "TPU" in n or "/device" in n.lower() or "Chip" in n}
    agg = defaultdict(float)
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in dev_pids:
            continue
        name = e.get("name", "?")
        dur = float(e.get("dur", 0.0)) / 1e3   # us -> ms
        agg[name] += dur
        total += dur
    return {"per_op": dict(agg), "total_ms": total}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--texture-space", action="store_true")
    ap.add_argument("--density", type=float, default=0.5)
    ap.add_argument("--frames", type=int, default=3)
    ap.add_argument("--warm-frames", type=int, default=40)
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--shadow-extent", type=int, default=4096)
    args = ap.parse_args()

    import jax
    from renderengine_tpu.core import engine
    engine.init()
    from renderengine_tpu.core.config import RenderConfig
    from renderengine_tpu.graph.frame import FrameRenderer
    from renderengine_tpu.scene import procedural
    from renderengine_tpu.scene.camera import ViewProperties

    w, h = 1920, 1080
    scene = procedural.sponza_scene(width=w, height=h, n_textures=200,
                                    target_tris=260_000)
    cfg = RenderConfig(width=w, height=h, shadow_extent=args.shadow_extent,
                       debug_views=False, texture_space=args.texture_space,
                       chart_density=args.density)
    r = FrameRenderer(scene, cfg, backend="pallas")

    cam = scene.camera
    eye0 = np.asarray(cam.eye, np.float32).copy()

    def orbit_vp(i):
        ang = 0.02 * i
        cam.set_camera_view(
            np.array([eye0[0] * np.cos(ang) - eye0[2] * np.sin(ang), eye0[1],
                      eye0[0] * np.sin(ang) + eye0[2] * np.cos(ang)],
                     np.float32),
            cam.look_at, np.array([0, 1, 0], np.float32))
        return ViewProperties.from_camera(cam)

    # settle the budget controllers (same as bench warm orbit)
    for _ in range(4):
        fn0 = r._fn
        last = None
        for i in range(args.warm_frames):
            last = r.render(orbit_vp(i))
        np.asarray(last)
        if r._fn is fn0:
            break

    trace_dir = "/tmp/renderengine_trace_frame"
    shutil.rmtree(trace_dir, ignore_errors=True)
    jax.profiler.start_trace(trace_dir)
    last = None
    for i in range(args.frames):
        last = r.render(orbit_vp(i))
    np.asarray(last)
    jax.profiler.stop_trace()

    res = aggregate(trace_dir)
    per_frame = res["total_ms"] / args.frames
    print(f"# device total {res['total_ms']:.1f} ms over {args.frames} "
          f"frames = {per_frame:.1f} ms/frame", file=sys.stderr)
    rows = sorted(res["per_op"].items(), key=lambda kv: -kv[1])
    for name, ms in rows[:args.top]:
        print(f"{ms/args.frames:9.2f} ms  {name[:110]}", file=sys.stderr)


if __name__ == "__main__":
    main()
