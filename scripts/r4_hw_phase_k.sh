#!/bin/bash
# Round-4 phase K: refresh the reference-protocol artifacts on the final
# round-4 code (the committed CSVs date from round 3 and carry the
# per-chunk measurement artifact).
set -u
cd "$(dirname "$0")/.."
LOG=results/r4_hw_log.txt
ts() { date "+%F %T"; }
run() { echo "[$(ts)] START $*" | tee -a "$LOG"; "$@" 2>&1 | tee -a "$LOG"; echo "[$(ts)] END $*" | tee -a "$LOG"; }

echo "[$(ts)] ===== phase K @ $(git rev-parse --short HEAD) =====" | tee -a "$LOG"

run timeout 3600 python benchmarks/sweep.py full --out results/bench_full_tpu.csv
run timeout 2400 python scripts/bench_presets.py

echo "[$(ts)] ===== phase K done =====" | tee -a "$LOG"
