#!/bin/bash
# Round-4 hardware phase F: validate the ALIGNED stencil body as the
# production default (smoke vs same-rev oracle), record the round-4
# headline under the amortized protocol, adjudicate 8192^2 vs float64 with
# the highest-precision Pallas variant (ADVICE round-3 isolation), and the
# 10k-step drift for the new default.
# NOTE: do not commit while the smoke runs (rev-keyed oracle).
set -u
cd "$(dirname "$0")/.."
LOG=results/r4_hw_log.txt
ts() { date "+%F %T"; }
run() { echo "[$(ts)] START $*" | tee -a "$LOG"; "$@" 2>&1 | tee -a "$LOG"; echo "[$(ts)] END $*" | tee -a "$LOG"; }

echo "[$(ts)] ===== phase F @ $(git rev-parse --short HEAD) =====" | tee -a "$LOG"

# F1: smoke with the aligned body (fresh oracle at this rev).
run timeout 7200 python scripts/tpu_smoke.py --variants plain pallas pairx-bf16x3

# F2: headline bench, amortized protocol (auto tier ladder + explicit tiers).
run timeout 3600 python bench.py
run timeout 2400 python bench.py --mode pairx-bf16x3
run timeout 2400 python bench.py --mode pallas --M 4096 --P 4096

# F3: 8192^2 step vs float64, highest-precision Pallas (isolates bf16x3;
# the f64 + plain trajectories are body-independent and already on disk).
run timeout 3600 python scripts/step_f64_check.py --M 8192 --variant pallas-hi
run timeout 3600 python scripts/step_f64_check.py --M 8192 --variant pallas-bf16x3
run timeout 600 python scripts/step_f64_check.py --M 8192 --compare

# F4: 10k-step energy/enstrophy drift for the new default body.
run timeout 4800 python scripts/accuracy_drift.py --steps 10000 --chunk 500 \
    --impls xla pairx-bf16x3
cp -f results/accuracy_2048_10000.json results/accuracy_2048_10000_r4.json

echo "[$(ts)] ===== phase F done =====" | tee -a "$LOG"
