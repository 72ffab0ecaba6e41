#!/bin/bash
# Round-4 hardware phase B: the one-launch whole-step kernel (v6) on the
# real chip — correctness smoke vs the same-rev oracle, then the
# same-protocol decomposition entry, then the 8192^2 sharded 1x1 check.
# Sequential; run only after phase A is done.
set -u
cd "$(dirname "$0")/.."
LOG=results/r4_hw_log.txt
ts() { date "+%F %T"; }
run() { echo "[$(ts)] START $*" | tee -a "$LOG"; "$@" 2>&1 | tee -a "$LOG"; echo "[$(ts)] END $*" | tee -a "$LOG"; }

echo "[$(ts)] ===== phase B @ $(git rev-parse --short HEAD) =====" | tee -a "$LOG"

# B1: fullstep smoke at 2048^2 (fresh oracle at this rev; engaged
# recorded) + the mono/pairx oracle comparisons phase A lost to a
# mid-session commit (the oracle cache is rev-keyed by design).
# NOTE: do not commit while this runs — it would invalidate the oracle.
run timeout 7200 python scripts/tpu_smoke.py --variants plain fullstep-bf16x3 mono-bf16x3 pairx-bf16x3

# B2: fullstep in the one-protocol decomposition table (accumulates into
# the same JSON as phase A's jobs).
run timeout 3600 python scripts/decomp_r4.py --M 2048 --chunk 50 --jobs full-fullstep

# B3: fullstep in the dispatch-bound regime table.
run timeout 2400 python scripts/decomp_r4.py --M 2048 --chunk 10 --jobs full-fullstep

# B4: 1x1-mesh fused overhead at 2048^2 (VERDICT round-3 item 4 'Done'
# criterion: >= 95% of the unsharded default after the nx=1 specialization).
run timeout 2400 python benchmarks/scaling.py strong --grid 2048 --steps 50 \
    --impl fused --out results/scaling_1chip_fused.csv

# B5: 1x1-mesh fused at 8192^2 (VERDICT round-3 item 2 'Done' criterion:
# within ~15% of the unsharded 2.63e9 — the streaming x-stage's first
# hardware run).
run timeout 3600 python benchmarks/scaling.py strong --grid 8192 --steps 20 \
    --impl fused --out results/scaling_1chip_fused_8192.csv

echo "[$(ts)] ===== phase B done =====" | tee -a "$LOG"
