#!/bin/bash
# Round-4 hardware phase C: accuracy evidence — isolate the bf16x3
# contribution in the 8192^2 step-level f64 adjudication (ADVICE round 3),
# and 10k-step drift for the one-launch step kernel.
set -u
cd "$(dirname "$0")/.."
LOG=results/r4_hw_log.txt
ts() { date "+%F %T"; }
run() { echo "[$(ts)] START $*" | tee -a "$LOG"; "$@" 2>&1 | tee -a "$LOG"; echo "[$(ts)] END $*" | tee -a "$LOG"; }

echo "[$(ts)] ===== phase C @ $(git rev-parse --short HEAD) =====" | tee -a "$LOG"

# C1: 8192^2 step vs the float64 oracle with the HIGHEST-precision Pallas
# variant — round 3 routed 8192^2 to bf16x3 citing an adjudication that
# actually failed its own criterion (pallas-bf16x3 1.8e-5 vs plain 1.4e-6);
# this isolates whether the 13x is the bf16x3 stage or the kernel algorithm.
run timeout 3600 python scripts/step_f64_check.py --M 8192 --variant pallas-hi
run timeout 600 python scripts/step_f64_check.py --M 8192 --compare

# C2: 10k-step energy/enstrophy drift for the one-launch step kernel
# (evidence for flipping _FULLSTEP_IN_AUTO).
run timeout 4800 python scripts/accuracy_drift.py --steps 10000 --chunk 500 \
    --impls xla fullstep-bf16x3
cp -f results/accuracy_2048_10000.json results/accuracy_2048_10000_fullstep.json

echo "[$(ts)] ===== phase C done =====" | tee -a "$LOG"
