#!/bin/bash
# Round-3 on-chip A/B matrix: run every headline shading-mode candidate
# at the honest config (1080p / 260k tris / 200 textures / 4096^2
# shadows / translucency on) and print one JSON line per mode.
# Usage: bash tools/bench_matrix.sh [extra bench args...]
# Each run is bounded; the shared dev chip shows ~40% tenant noise, so
# compare best-of runs (bench.py already takes best of 2 rounds).
set -u
cd "$(dirname "$0")/.."
for mode in \
    "--per-pixel" \
    "--texture-space" \
    "" \
    "--preshaded" \
    "--preshaded --chart-density 1.0 --chart-budget 4000000" \
    "--dither" \
    "--per-pixel --dither" \
; do
    echo "### bench.py $mode" >&2
    timeout 900 python bench.py $mode "$@" 2>/tmp/bench_matrix_err.log
    rc=$?
    if [ $rc -ne 0 ]; then
        echo "{\"mode\": \"$mode\", \"error\": $rc}"
        tail -3 /tmp/bench_matrix_err.log >&2
    fi
done
