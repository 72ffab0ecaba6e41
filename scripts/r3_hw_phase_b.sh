#!/bin/bash
# Round-3 hardware evidence, phase B: (1) repeat 50-step bench runs to
# separate the two gate candidates within tunnel noise, (2) 10k-step drift
# for the winner candidate, (3) 4096^2 smoke (VERDICT round-2 item 6).
set -u
cd /root/repo
LOG=results/r3_hw_log.txt
echo "=== phase B start $(date -u +%H:%M:%S) rev=$(git rev-parse --short HEAD) ===" >> "$LOG"

for REP in 1 2 3; do
  for MODE in pairx-bf16x3 chain-pairx-bf16x3; do
    echo "--- bench rep$REP --mode $MODE $(date -u +%H:%M:%S) ---" >> "$LOG"
    timeout -k 30 1800 python bench.py --mode "$MODE" >> "$LOG" 2>&1
  done
done

echo "--- accuracy_drift pairx-bf16x3 $(date -u +%H:%M:%S) ---" >> "$LOG"
timeout -k 30 3600 python scripts/accuracy_drift.py --steps 10000 --chunk 500 \
  --impls xla pairx-bf16x3 >> "$LOG" 2>&1
echo "--- rc=$? ---" >> "$LOG"

echo "--- smoke 4096 $(date -u +%H:%M:%S) ---" >> "$LOG"
python scripts/tpu_smoke.py --M 4096 --P 4096 \
  --variants plain matmul pallas pairx-bf16x3 --timeout 2700 >> "$LOG" 2>&1

echo "=== phase B done $(date -u +%H:%M:%S) ===" >> "$LOG"
