#!/bin/bash
# Round-3 hardware evidence, phase D: (1) monolithic single-pass inversion
# kernel at 2048^2 (accuracy smoke + 50-step bench), (2) confirmation that
# bench.py auto now routes to the gated-in pairx-bf16x3 default, (3) 8192^2
# step-level smoke for the pallas path (adjudicated vs f64 separately).
set -u
cd /root/repo
LOG=results/r3_hw_log.txt
echo "=== phase D start $(date -u +%H:%M:%S) rev=$(git rev-parse --short HEAD) ===" >> "$LOG"

python scripts/tpu_smoke.py --variants plain mono mono-bf16x3 \
  --timeout 2700 >> "$LOG" 2>&1

for MODE in mono-bf16x3 mono; do
  echo "--- bench --mode $MODE $(date -u +%H:%M:%S) ---" >> "$LOG"
  timeout -k 30 2700 python bench.py --mode "$MODE" >> "$LOG" 2>&1
  echo "--- rc=$? $(date -u +%H:%M:%S) ---" >> "$LOG"
done

echo "--- bench auto (headline confirmation) $(date -u +%H:%M:%S) ---" >> "$LOG"
timeout -k 30 3600 python bench.py >> "$LOG" 2>&1
echo "--- rc=$? $(date -u +%H:%M:%S) ---" >> "$LOG"

python scripts/tpu_smoke.py --M 8192 --P 8192 \
  --variants plain pallas-bf16x3 --timeout 2700 >> "$LOG" 2>&1
echo "=== phase D done $(date -u +%H:%M:%S) ===" >> "$LOG"
