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
    """Aggregate the device's "XLA Ops" lane (the leaf per-op events —
    module-level lanes would double count) by op name AND by the op's
    source attribution (args.source = file:line of the jnp call)."""
    paths = glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"),
                      recursive=True)
    if not paths:
        raise SystemExit(f"no trace.json.gz under {trace_dir}")
    with gzip.open(sorted(paths)[-1], "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    pid_name, tid_name = {}, {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_name[e.get("pid")] = e.get("args", {}).get("name", "")
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tid_name[(e.get("pid"), e.get("tid"))] = \
                e.get("args", {}).get("name", "")
    dev = {(p, t) for (p, t), n in tid_name.items()
           if n == "XLA Ops" and ("TPU" in pid_name.get(p, "")
                                  or "device" in pid_name.get(p, "").lower())}
    agg = defaultdict(float)
    src = defaultdict(float)
    per_file = defaultdict(float)
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or (e.get("pid"), e.get("tid")) not in dev:
            continue
        dur = float(e.get("dur", 0.0)) / 1e3   # us -> ms
        agg[e.get("name", "?")] += dur
        s = e.get("args", {}).get("source", "(no-src)")
        src[s] += dur
        per_file[s.rsplit(":", 1)[0].rsplit("/", 1)[-1]] += dur
        total += dur
    return {"per_op": dict(agg), "per_source": dict(src),
            "per_file": dict(per_file), "total_ms": total}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--texture-space", action="store_true")
    ap.add_argument("--preshaded", action="store_true")
    ap.add_argument("--preshaded-blend", action="store_true",
                    help="the headline default: pre-shaded translucent "
                    "peels, full-res opaque albedo")
    ap.add_argument("--dither", action="store_true",
                    help="dithered trilinear (one gather per texture tap)")
    ap.add_argument("--density", type=float, default=0.5)
    ap.add_argument("--chart-budget", type=int, default=2_000_000)
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
    tss = (args.texture_space or args.preshaded or args.preshaded_blend)
    cfg = RenderConfig(width=w, height=h, shadow_extent=args.shadow_extent,
                       debug_views=False,
                       texture_space=tss,
                       tss_preshaded=args.preshaded,
                       tss_preshaded_blend=args.preshaded_blend,
                       dither_trilinear=args.dither,
                       sky_halfres=tss,     # match the bench headline
                       chart_density=args.density,
                       chart_budget=args.chart_budget)
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
    print("# --- by source line ---", file=sys.stderr)
    rows = sorted(res["per_source"].items(), key=lambda kv: -kv[1])
    for name, ms in rows[:args.top]:
        print(f"{ms/args.frames:9.2f} ms  {name[:110]}", file=sys.stderr)
    print("# --- by file ---", file=sys.stderr)
    rows = sorted(res["per_file"].items(), key=lambda kv: -kv[1])
    for name, ms in rows:
        print(f"{ms/args.frames:9.2f} ms  {name}", file=sys.stderr)
    print("# --- by op ---", file=sys.stderr)
    rows = sorted(res["per_op"].items(), key=lambda kv: -kv[1])
    for name, ms in rows[:args.top]:
        print(f"{ms/args.frames:9.2f} ms  {name[:110]}", file=sys.stderr)


if __name__ == "__main__":
    main()
