#!/bin/bash
# Round-3 hardware evidence, phase F: reference-style sweep CSVs on the real
# chip (the round-2 working tree had these but they were never committed),
# and auto-route confirmations at 4096 (and 8192 if gated in by then).
set -u
cd /root/repo
LOG=results/r3_hw_log.txt
echo "=== phase F start $(date -u +%H:%M:%S) rev=$(git rev-parse --short HEAD) ===" >> "$LOG"

echo "--- sweep full $(date -u +%H:%M:%S) ---" >> "$LOG"
timeout -k 30 3000 python benchmarks/sweep.py full --out results/bench_full_tpu.csv >> "$LOG" 2>&1
echo "--- rc=$? ---" >> "$LOG"
echo "--- sweep parts $(date -u +%H:%M:%S) ---" >> "$LOG"
timeout -k 30 3000 python benchmarks/sweep.py parts --out results/bench_parts_tpu.csv >> "$LOG" 2>&1
echo "--- rc=$? ---" >> "$LOG"

echo "--- bench auto 4096 $(date -u +%H:%M:%S) ---" >> "$LOG"
timeout -k 30 2700 python bench.py --M 4096 --P 4096 >> "$LOG" 2>&1
echo "--- rc=$? ---" >> "$LOG"
echo "=== phase F done $(date -u +%H:%M:%S) ===" >> "$LOG"
