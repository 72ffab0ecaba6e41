#!/bin/bash
# Round-4 hardware phase D: stencil-kernel ablation (where does the v4
# kernel's 0.7 ms over-roofline go?) + scan-iteration floor probes.
set -u
cd "$(dirname "$0")/.."
LOG=results/r4_hw_log.txt
ts() { date "+%F %T"; }
run() { echo "[$(ts)] START $*" | tee -a "$LOG"; "$@" 2>&1 | tee -a "$LOG"; echo "[$(ts)] END $*" | tee -a "$LOG"; }

echo "[$(ts)] ===== phase D @ $(git rev-parse --short HEAD) =====" | tee -a "$LOG"

# D1: per-iteration floor probes (one y-kernel pass / one elementwise op).
run timeout 2400 python scripts/decomp_r4.py --M 2048 --chunk 50 --jobs ypass,addone

# D2: the ablation — base/aligned (correct) and norot/noslice/nojac
# (timing-only) under the same protocol as the decomp 'kernel' row.
run timeout 5400 python scripts/stencil_lab.py --variants base,aligned,norot,noslice,nojac

echo "[$(ts)] ===== phase D done =====" | tee -a "$LOG"
