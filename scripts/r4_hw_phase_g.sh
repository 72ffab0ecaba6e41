#!/bin/bash
# Round-4 hardware phase G: ground the size-classed bf16x3 gate — step-level
# f64 adjudication at 2048^2 and 4096^2 for plain / pallas-hi /
# pallas-bf16x3 (the 8192^2 row showed pallas-hi BEATS the f32 oracle while
# bf16x3 is 13x worse; decide where bf16x3 stays the default on evidence).
# Requires the CPU f64 oracles (step_zeta_f64_{2048,4096}.npy) to exist.
set -u
cd "$(dirname "$0")/.."
LOG=results/r4_hw_log.txt
ts() { date "+%F %T"; }
run() { echo "[$(ts)] START $*" | tee -a "$LOG"; "$@" 2>&1 | tee -a "$LOG"; echo "[$(ts)] END $*" | tee -a "$LOG"; }

echo "[$(ts)] ===== phase G @ $(git rev-parse --short HEAD) =====" | tee -a "$LOG"

for M in 2048 4096; do
  for V in plain pallas-hi pallas-bf16x3; do
    run timeout 2400 python scripts/step_f64_check.py --M $M --variant $V
  done
  run timeout 600 python scripts/step_f64_check.py --M $M --compare
done

echo "[$(ts)] ===== phase G done =====" | tee -a "$LOG"
