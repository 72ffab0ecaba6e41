#!/bin/bash
# Round-4 phase I: 1x1-mesh fused rates after the nx=1 self-ppermute
# elimination, at the AMORTIZED protocol (500-step chunks — the earlier
# 93% figure compared two 50-step-chunk numbers, both inflated), plus the
# honest amortized 8192^2 single-chip headline (mxu=highest route).
set -u
cd "$(dirname "$0")/.."
LOG=results/r4_hw_log.txt
ts() { date "+%F %T"; }
run() { echo "[$(ts)] START $*" | tee -a "$LOG"; "$@" 2>&1 | tee -a "$LOG"; echo "[$(ts)] END $*" | tee -a "$LOG"; }

echo "[$(ts)] ===== phase I @ $(git rev-parse --short HEAD) =====" | tee -a "$LOG"

run timeout 2400 python benchmarks/scaling.py strong --grid 2048 --steps 500 \
    --impl fused --out results/scaling_1chip_fused.csv

run timeout 3600 python bench.py --mode pallas --M 8192 --P 8192

run timeout 3600 python benchmarks/scaling.py strong --grid 8192 --steps 100 \
    --impl fused --out results/scaling_1chip_fused_8192.csv

echo "[$(ts)] ===== phase I done =====" | tee -a "$LOG"
