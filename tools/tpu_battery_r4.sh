#!/bin/bash
# Round-4 measurement battery. ONE TPU client at a time, sequential, each
# step bounded WELL above its worst case — never kill a live client midway
# (an uncleanly killed client wedges the tunnel chip claim for ~10 min and
# can chain, docs/PERFORMANCE.md round 4).
#
# Usage: tools/tpu_battery_r4.sh [phase]
#   phase ab    — kernel A/Bs only (dslice folds, deform tsrc)
#   phase bench — bench.py + profile
#   phase train — deform_window_ab long train + train profile
#   (no arg = ab then bench)
set -u
cd "$(dirname "$0")/.."
OUT=/tmp/tpu_battery_r4
mkdir -p "$OUT"
export JAX_COMPILATION_CACHE_DIR="$PWD/.jax_cache"
log() { echo "=== $* ($(date +%H:%M:%S))"; }
PHASE="${1:-abbench}"

if [[ "$PHASE" == *ab* ]]; then
  log "fast-attention layout A/B: list (new default) vs stacked"
  BENCH_FAST=1 BENCH_DEADLINE_S=1200 timeout 1300 python -u bench.py \
    2>&1 | tee "$OUT/bench_attn_list.txt"
  DPFACE_ATTN_LAYOUT=stacked BENCH_FAST=1 BENCH_DEADLINE_S=1200 timeout 1300 \
    python -u bench.py 2>&1 | tee "$OUT/bench_attn_stacked.txt"

  log "batch-8 throughput probe (serving batching headroom)"
  BENCH_BATCH=8 BENCH_FAST=1 BENCH_DEADLINE_S=1200 timeout 1300 \
    python -u bench.py 2>&1 | tee "$OUT/bench_b8.txt"

  log "dslice per-site folds: out vs pallas2 (full serving chain)"
  timeout 3000 python -u tools/bench_dslice_fold.py \
    --folds out,pallas2 --module convbn 2>&1 | tee "$OUT/dslice_r4.txt"

  log "deform kernel tsrc slice vs concat"
  DPFACE_DEFORM_TSRC=slice timeout 1200 python -u tools/bench_deform_kernel.py \
    2>&1 | tee "$OUT/deform_tsrc_slice.txt"
  DPFACE_DEFORM_TSRC=concat timeout 1200 python -u tools/bench_deform_kernel.py \
    2>&1 | tee "$OUT/deform_tsrc_concat.txt"
fi

if [[ "$PHASE" == *bench* ]]; then
  log "bench.py headline + extras"
  BENCH_DEADLINE_S=1500 timeout 1600 python bench.py 2>&1 | tee "$OUT/bench.txt"

  log "profile_forward (top HLO ops)"
  PYTHONPATH="$PWD:${PYTHONPATH:-}" timeout 1500 python -u tools/profile_forward.py \
    2>&1 | tee "$OUT/profile_forward.txt"
fi

if [[ "$PHASE" == *train* ]]; then
  log "profile_train (top HLO ops of the train step)"
  PYTHONPATH="$PWD:${PYTHONPATH:-}" timeout 1800 python -u tools/profile_train.py \
    2>&1 | tee "$OUT/profile_train.txt"

  log "deform_window_ab long train (VERDICT r3 item 5)"
  timeout 3600 python -u tools/deform_window_ab.py --steps 600 --hw 192 \
    2>&1 | tee "$OUT/deform_window_ab.txt"
fi

log "battery phase '$PHASE' done"
