#!/bin/bash
# Round-3 hardware evidence, phase C: 8192^2 diagnosis (VERDICT round-2 item
# 3). (1) inversion-only transform error + per-inversion cost per backend —
# separates intrinsic transform error from chaotic 5-step amplification;
# (2) 50-step step rates per backend at 8192^2.
set -u
cd /root/repo
LOG=results/r3_hw_log.txt
echo "=== phase C start $(date -u +%H:%M:%S) rev=$(git rev-parse --short HEAD) ===" >> "$LOG"

for MODE in pallas matmul; do
  echo "--- bench 4096 --mode $MODE $(date -u +%H:%M:%S) ---" >> "$LOG"
  timeout -k 30 2700 python bench.py --mode "$MODE" --M 4096 --P 4096 >> "$LOG" 2>&1
  echo "--- rc=$? $(date -u +%H:%M:%S) ---" >> "$LOG"
done

python scripts/tpu_smoke.py --M 8192 --P 8192 --inversion-only \
  --variants plain matmul pallas pallas-bf16x3 --timeout 2700 >> "$LOG" 2>&1

for MODE in matmul pallas-bf16x3 xla; do
  echo "--- bench 8192 --mode $MODE $(date -u +%H:%M:%S) ---" >> "$LOG"
  timeout -k 30 2700 python bench.py --mode "$MODE" --M 8192 --P 8192 >> "$LOG" 2>&1
  echo "--- rc=$? $(date -u +%H:%M:%S) ---" >> "$LOG"
done
echo "=== phase C done $(date -u +%H:%M:%S) ===" >> "$LOG"
