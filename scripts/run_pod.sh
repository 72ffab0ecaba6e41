#!/bin/sh
# Multi-host TPU pod-slice launcher — the counterpart of the reference's SGE
# batch job (reference: scripts/benchmarking_job.sh, which requested ONE CPU
# core on the Eddie cluster; here the "cluster" is a TPU pod slice).
#
# Run THIS SAME SCRIPT on every host of the slice (e.g. via
# `gcloud compute tpus tpu-vm ssh $TPU_NAME --worker=all --command=...`).
# jax.distributed auto-detects the TPU topology; tpu_qg shards the grid over
# the global ('x', 'y') mesh and the driver streams snapshots from host 0.
#
# Environment:
#   PRESET      config preset name            (default: pod-8192)
#   RUN_DIR     snapshot/checkpoint directory (default: runs/pod)
#   STEPS       step-count override           (optional)
set -eu

PRESET="${PRESET:-pod-8192}"
RUN_DIR="${RUN_DIR:-runs/pod}"
STEPS="${STEPS:-}"

cd "$(dirname "$0")/.."

exec python -m tpu_qg.run \
    --preset "$PRESET" \
    --run-dir "$RUN_DIR" \
    --distributed \
    ${STEPS:+--steps "$STEPS"} \
    --checkpoint-every 1000
