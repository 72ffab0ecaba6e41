#!/bin/bash
# Round-4 phase L: 10k-step drift at 8192^2 for the default route (the f64
# check covers 10 steps; this covers long-horizon stability at BASELINE
# config 5's resolution).
set -u
cd "$(dirname "$0")/.."
LOG=results/r4_hw_log.txt
ts() { date "+%F %T"; }
run() { echo "[$(ts)] START $*" | tee -a "$LOG"; "$@" 2>&1 | tee -a "$LOG"; echo "[$(ts)] END $*" | tee -a "$LOG"; }

echo "[$(ts)] ===== phase L @ $(git rev-parse --short HEAD) =====" | tee -a "$LOG"

run timeout 5400 python scripts/accuracy_drift.py --M 8192 --steps 10000 --chunk 1000 \
    --impls xla pallas-hi
cp -f results/accuracy_8192_10000.json results/accuracy_8192_10000_r4.json 2>/dev/null || true

echo "[$(ts)] ===== phase L done =====" | tee -a "$LOG"
