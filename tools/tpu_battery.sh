#!/bin/bash
# One-shot measurement battery for tunnel recovery (round 3).
# Runs everything that needs the real chip and records outputs under
# /tmp/tpu_battery/. Each step is independently time-bounded so one hang
# cannot eat the window.
set -u
cd "$(dirname "$0")/.."
OUT=/tmp/tpu_battery
mkdir -p "$OUT"
log() { echo "=== $* ($(date +%H:%M:%S))"; }

log "bench.py (headline + extras)"
BENCH_DEADLINE_S=1500 timeout 1600 python bench.py 2>&1 | tee "$OUT/bench.txt"

log "dslice fold A/B (out vs pallas conv3d kernel)"
timeout 900 python tools/bench_dslice_fold.py 2>&1 | tee "$OUT/dslice_fold.txt"

log "FULL-MODEL dslice-fold A/B (headline only, warm cache from step 1)"
BENCH_FAST=1 BENCH_DEADLINE_S=900 DPFACE_DSLICE_FOLD=pallas timeout 1000 \
  python bench.py 2>&1 | tee "$OUT/bench_dslice_pallas.txt"

log "deform kernel v5 standalone"
timeout 900 python tools/bench_deform_conv.py 2>&1 | tee "$OUT/deform_v5.txt"

log "eval_at_scale on TPU (serving fast paths)"
timeout 900 python tools/eval_at_scale.py --samples 4 \
  --deform_impl pallas --fused_regression 2>&1 | tee "$OUT/eval_at_scale.txt"

log "train-step profile"
timeout 900 python tools/bench_anm_stage.py 2>&1 | tee "$OUT/anm_stage.txt" || true

log "battery done"
