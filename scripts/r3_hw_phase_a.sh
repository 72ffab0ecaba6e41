#!/bin/bash
# Round-3 hardware evidence, phase A: 2048^2 accuracy smoke for the gate
# candidates, then 50-step bench-protocol rates. Sequential — never two TPU
# compiles at once. Logs to results/r3_hw_log.txt incrementally.
set -u
cd /root/repo
LOG=results/r3_hw_log.txt
echo "=== phase A start $(date -u +%H:%M:%S) rev=$(git rev-parse --short HEAD) ===" >> "$LOG"

# Accuracy smoke (10-step trajectory vs plain oracle, per-variant subprocess
# timeboxed inside tpu_smoke itself).
python scripts/tpu_smoke.py --variants plain pairx pairx-bf16x3 chain-pairx-bf16x3 \
  --timeout 2700 >> "$LOG" 2>&1

echo "=== smoke done $(date -u +%H:%M:%S), bench runs ===" >> "$LOG"
for MODE in pallas pairx-bf16x3 chain-pairx-bf16x3; do
  echo "--- bench --mode $MODE $(date -u +%H:%M:%S) ---" >> "$LOG"
  timeout -k 30 2700 python bench.py --mode "$MODE" >> "$LOG" 2>&1
  echo "--- rc=$? $(date -u +%H:%M:%S) ---" >> "$LOG"
done
echo "=== phase A done $(date -u +%H:%M:%S) ===" >> "$LOG"
