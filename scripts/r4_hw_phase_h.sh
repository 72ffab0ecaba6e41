#!/bin/bash
# Round-4 phase H: decide the bf16x3 size class on full evidence —
# 10k-step drift at 4096^2 (does the 15x 10-step f64 cost surface in
# conserved quantities?) and the perf cost of mxu=highest at 4096^2.
set -u
cd "$(dirname "$0")/.."
LOG=results/r4_hw_log.txt
ts() { date "+%F %T"; }
run() { echo "[$(ts)] START $*" | tee -a "$LOG"; "$@" 2>&1 | tee -a "$LOG"; echo "[$(ts)] END $*" | tee -a "$LOG"; }

echo "[$(ts)] ===== phase H @ $(git rev-parse --short HEAD) =====" | tee -a "$LOG"

run timeout 3600 python scripts/accuracy_drift.py --M 4096 --steps 10000 --chunk 500 \
    --impls xla pallas-bf16x3
cp -f results/accuracy_4096_10000.json results/accuracy_4096_10000_r4.json 2>/dev/null || true

run timeout 2400 python bench.py --mode pallas-hi --M 4096 --P 4096

echo "[$(ts)] ===== phase H done =====" | tee -a "$LOG"
