#!/bin/bash
# Round-3 hardware evidence, phase E: (1) repeat bench runs separating
# mono-bf16x3 from pairx-bf16x3 at the 50-step protocol, (2) v4 step-kernel-
# only decomposition (what dominates the remaining ~1.6 ms), (3) 10k-step
# drift for mono, (4) 8192^2 step-level f64 adjudication runs (TPU side).
set -u
cd /root/repo
LOG=results/r3_hw_log.txt
echo "=== phase E start $(date -u +%H:%M:%S) rev=$(git rev-parse --short HEAD) ===" >> "$LOG"

for REP in 1 2; do
  for MODE in mono-bf16x3 pairx-bf16x3; do
    echo "--- bench rep$REP --mode $MODE $(date -u +%H:%M:%S) ---" >> "$LOG"
    timeout -k 30 1800 python bench.py --mode "$MODE" >> "$LOG" 2>&1
  done
done

echo "--- kernel-only 2048 $(date -u +%H:%M:%S) ---" >> "$LOG"
timeout -k 30 1800 python scripts/bench_variants.py kernel-only >> "$LOG" 2>&1

echo "--- accuracy_drift mono-bf16x3 $(date -u +%H:%M:%S) ---" >> "$LOG"
timeout -k 30 3600 python scripts/accuracy_drift.py --steps 10000 --chunk 500 \
  --impls xla mono-bf16x3 >> "$LOG" 2>&1
echo "--- rc=$? ---" >> "$LOG"
mv results/accuracy_2048_10000.json results/accuracy_2048_10000_mono.json 2>> "$LOG"
mv plots/accuracy_drift_2048.png plots/accuracy_drift_2048_mono.png 2>> "$LOG"
git checkout -- results/accuracy_2048_10000.json plots/accuracy_drift_2048.png 2>> "$LOG"

for V in plain pallas-bf16x3; do
  echo "--- step_f64 8192 variant $V $(date -u +%H:%M:%S) ---" >> "$LOG"
  timeout -k 30 2700 python scripts/step_f64_check.py --M 8192 --variant "$V" >> "$LOG" 2>&1
  echo "--- rc=$? ---" >> "$LOG"
done
echo "--- scaling strong 2048 --impl fused (1x1 real-chip mesh) $(date -u +%H:%M:%S) ---" >> "$LOG"
timeout -k 30 2700 python benchmarks/scaling.py strong --grid 2048 --impl fused \
  --out results/scaling_1chip_fused.csv >> "$LOG" 2>&1
echo "--- rc=$? ---" >> "$LOG"

echo "=== phase E done $(date -u +%H:%M:%S) ===" >> "$LOG"
