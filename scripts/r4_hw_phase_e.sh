#!/bin/bash
# Round-4 hardware phase E: protocol-overhead resolution. The addone floor
# probe showed ~21-30 ms of FIXED per-measurement overhead (tunnel RPC +
# sync latency) inside every 50-step-chunk number — ~0.45 ms/step of pure
# measurement artifact at 2048^2. Re-measure the contenders at 500-step
# chunks (overhead amortized 10x) to get honest per-step costs.
set -u
cd "$(dirname "$0")/.."
LOG=results/r4_hw_log.txt
ts() { date "+%F %T"; }
run() { echo "[$(ts)] START $*" | tee -a "$LOG"; "$@" 2>&1 | tee -a "$LOG"; echo "[$(ts)] END $*" | tee -a "$LOG"; }

echo "[$(ts)] ===== phase E @ $(git rev-parse --short HEAD) =====" | tee -a "$LOG"

run timeout 5400 python scripts/decomp_r4.py --M 2048 --chunk 500 --reps 3 \
    --jobs addone,full-pairx,kernel,inv-pairx,full-mono,full-fullstep

# The same amortized protocol one size up (the round-3 "4096 faster per
# point than 2048" puzzle should disappear).
run timeout 3600 python scripts/decomp_r4.py --M 4096 --chunk 125 --reps 3 \
    --jobs full-pallas,addone

# base-vs-aligned stencil body at the amortized protocol (the c50 delta of
# 3% is inside tunnel noise; adopt aligned only if it wins here).
run timeout 3600 python scripts/stencil_lab.py --chunk 500 --reps 3 \
    --variants base,aligned

echo "[$(ts)] ===== phase E done =====" | tee -a "$LOG"
