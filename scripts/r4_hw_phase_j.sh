#!/bin/bash
# Round-4 phase J: validate + measure the single-chip streaming pair form
# (3-pass inversion at 4096^2/8192^2, replacing the 4-pass route) — f64
# adjudication with the new route engaged, then amortized benches.
set -u
cd "$(dirname "$0")/.."
LOG=results/r4_hw_log.txt
ts() { date "+%F %T"; }
run() { echo "[$(ts)] START $*" | tee -a "$LOG"; "$@" 2>&1 | tee -a "$LOG"; echo "[$(ts)] END $*" | tee -a "$LOG"; }

echo "[$(ts)] ===== phase J @ $(git rev-parse --short HEAD) =====" | tee -a "$LOG"

run timeout 2400 python scripts/step_f64_check.py --M 4096 --variant pallas-hi
run timeout 2400 python scripts/step_f64_check.py --M 4096 --variant pallas-bf16x3
run timeout 600 python scripts/step_f64_check.py --M 4096 --compare
run timeout 2400 python scripts/step_f64_check.py --M 8192 --variant pallas-hi
run timeout 600 python scripts/step_f64_check.py --M 8192 --compare

run timeout 2400 python bench.py --mode pallas --M 4096 --P 4096
run timeout 3600 python bench.py --mode pallas --M 8192 --P 8192

echo "[$(ts)] ===== phase J done =====" | tee -a "$LOG"
