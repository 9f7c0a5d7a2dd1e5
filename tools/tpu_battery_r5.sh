#!/usr/bin/env bash
# Round-5 measurement battery. ONE TPU client at a time, strictly
# sequential, every job bounded ABOVE its worst case so clients exit
# cleanly (an uncleanly killed client wedges the tunnel chip claim ~10 min
# — docs/PERFORMANCE.md round-4 tunnel discipline).
#
# Usage: tools/tpu_battery_r5.sh <phase> [outdir]
#   phase 'fwd'   : forward baseline + resident-dpack A/B
#   phase 'train' : train-step baseline + dpack + PReLU A/Bs
#   phase 'stages': per-stage ablation (aggregation ms, item 3 criterion)
set -u
cd "$(dirname "$0")/.."
PHASE="${1:-fwd}"
OUT="${2:-/tmp/battery_r5}"
mkdir -p "$OUT"
log() { echo "[battery $(date +%H:%M:%S)] $*"; }

if [[ "$PHASE" == *fwd* ]]; then
  log "forward baseline (serving config, probe anchored)"
  BENCH_FAST=1 BENCH_DEADLINE_S=1200 timeout 1300 python -u bench.py \
    2>&1 | tee "$OUT/fwd_base.txt"
  log "forward A/B: resident D-packed dres chain"
  DPFACE_AGG_DPACK=1 BENCH_FAST=1 BENCH_DEADLINE_S=1200 timeout 1300 \
    python -u bench.py 2>&1 | tee "$OUT/fwd_dpack.txt"
fi

if [[ "$PHASE" == *train* ]]; then
  log "train-step baseline"
  timeout 1800 python -u bench.py --extra train 2>&1 | tee "$OUT/train_base.txt"
  log "train A/B: resident D-packed dres chain"
  DPFACE_AGG_DPACK=1 timeout 1800 python -u bench.py --extra train \
    2>&1 | tee "$OUT/train_dpack.txt"
  log "train A/B: PReLU maxmin formulation (select_n copy bucket)"
  DPFACE_PRELU=maxmin timeout 1800 python -u bench.py --extra train \
    2>&1 | tee "$OUT/train_prelu.txt"
fi

if [[ "$PHASE" == *full* ]]; then
  log "forward A/B: FULL resident-packed aggregation"
  DPFACE_AGG_DPACK=full BENCH_FAST=1 BENCH_DEADLINE_S=1200 timeout 1300 \
    python -u bench.py 2>&1 | tee "$OUT/fwd_dpack_full.txt"
  log "train A/B: FULL resident-packed aggregation"
  DPFACE_AGG_DPACK=full timeout 1800 python -u bench.py --extra train \
    2>&1 | tee "$OUT/train_dpack_full.txt"
fi

if [[ "$PHASE" == *t2* ]]; then
  log "train A/B: packed ASM mask-head convs (exact attention path)"
  DPFACE_ASM_HEAD_S2D=1 timeout 1800 python -u bench.py --extra train \
    2>&1 | tee "$OUT/train_heads2d.txt"
  log "train A/B: PReLU maxmin on top of agg_dpack=full"
  DPFACE_PRELU=maxmin timeout 1800 python -u bench.py --extra train \
    2>&1 | tee "$OUT/train_prelu2.txt"
fi

if [[ "$PHASE" == *stages* ]]; then
  log "per-stage forward ablation (aggregation ms)"
  PYTHONPATH="$PWD:${PYTHONPATH:-}" STAGES_ONLY=1 timeout 1800 \
    python -u tools/ablate_forward.py 2>&1 | tee "$OUT/stages_base.txt"
fi

log "battery phase '$PHASE' done"
