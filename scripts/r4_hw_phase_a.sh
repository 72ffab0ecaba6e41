#!/bin/bash
# Round-4 hardware phase A: real-mono evidence + single-protocol
# decomposition + dispatch-regime back-to-back + v4 tile sweep.
# Sequential (remote compiles must never overlap); every step timestamped.
set -u
cd "$(dirname "$0")/.."
LOG=results/r4_hw_log.txt
ts() { date "+%F %T"; }
run() { echo "[$(ts)] START $*" | tee -a "$LOG"; "$@" 2>&1 | tee -a "$LOG"; echo "[$(ts)] END $*" | tee -a "$LOG"; }

echo "[$(ts)] ===== phase A @ $(git rev-parse --short HEAD) =====" | tee -a "$LOG"

# A1: smoke — oracle at this rev + the mono kernel's FIRST genuine run at
# 2048^2 (fits-gate fixed this round; 'engaged' recorded in the JSON).
run timeout 2400 python scripts/tpu_smoke.py --variants plain mono-bf16x3 pairx-bf16x3

# A2: one-protocol decomposition at the headline size (50-step chunks).
run timeout 5400 python scripts/decomp_r4.py --M 2048 --chunk 50 \
    --jobs full-pairx,kernel,inv-pairx,full-mono,inv-mono

# A3: dispatch-bound regime, back to back in ONE session (10-step chunks).
run timeout 3600 python scripts/decomp_r4.py --M 2048 --chunk 10 \
    --jobs full-mono,full-pairx

# A4: v4 kernel tile sweep (the 2048-vs-4096 per-point gap diagnosis).
run timeout 3600 python scripts/decomp_r4.py --M 2048 --chunk 50 \
    --jobs kernel@64,kernel@256

echo "[$(ts)] ===== phase A done =====" | tee -a "$LOG"
