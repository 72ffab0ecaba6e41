"""Headline benchmark: grid-points/s per chip, two-layer QG at 2048^2.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The metric counts grid-point-steps per second (M * P * steps / elapsed) for the
full model step (fused tendencies + AB3 + spectral modal inversion, float32) on
one chip at the BASELINE config-4 resolution (2048^2).

vs_baseline: the reference has no GPU/TPU/parallel numbers; its best measured
throughput is the M=256 sweep point — 24 steps in 5.141 s on one CPU core
(BASELINE.md, julia_parts_graph.ipynb cell 3) = 3.06e5 grid-point-steps/s.
vs_baseline is the ratio of our per-chip throughput to that number.

Orchestration: compiling Pallas-containing programs through the remote TPU
tunnel can take ~10 minutes, so the driver-facing entry point runs the Pallas
variant in a timeboxed subprocess and falls back to the (faster-compiling)
pure-XLA variant if it doesn't finish in time. `python bench.py --mode
pallas|xla` runs a single variant inline.
"""

import argparse
import json
import subprocess
import sys
import time

# Reference: M=256, 1 model-day, dt=60 min => 24 steps in 5.141 s (1 CPU core).
_REF_GRIDPOINT_STEPS_PER_S = 256 * 256 * 24 / 5.141


def bench(use_pallas: bool, M=2048, P=2048, steps_per_chunk=50, reps=4):
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    import jax.numpy as jnp

    from tpu_qg.config import ModelConfig
    from tpu_qg.constants import KM
    from tpu_qg.models.core import QGModel, init_state

    cfg = ModelConfig(
        M=M, P=P, Lx=4000.0 * KM, Ly=4000.0 * KM,
        dt=60.0, T=3600.0, dtype="float32", use_pallas=use_pallas,
    )
    model = QGModel(cfg)
    state = init_state(cfg, key=jax.random.PRNGKey(0))

    def sync(s):
        # A host transfer of a reduction is the only reliable completion
        # barrier on the remote-tunnel backend (block_until_ready can return
        # before the computation has finished there).
        return float(jnp.sum(s.zeta))

    # Warm up: compile + one chunk.
    state = model.run(state, steps_per_chunk)
    sync(state)

    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        state = model.run(state, steps_per_chunk)
        sync(state)
        best = min(best, time.perf_counter() - t0)

    return M * P * steps_per_chunk / best


def result_line(gps: float) -> str:
    return json.dumps({
        "metric": "gridpoint-steps/s per chip, two-layer QG 2048^2 float32",
        "value": round(gps, 1),
        "unit": "gridpoint-steps/s",
        "vs_baseline": round(gps / _REF_GRIDPOINT_STEPS_PER_S, 2),
    })


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--mode", default="auto",
                        choices=["auto", "pallas", "xla"])
    parser.add_argument("--pallas-timeout", type=float, default=900.0)
    args = parser.parse_args()

    if args.mode in ("pallas", "xla"):
        print(result_line(bench(use_pallas=args.mode == "pallas")))
        return

    # auto: timeboxed Pallas attempt, XLA fallback.
    try:
        out = subprocess.run(
            [sys.executable, __file__, "--mode", "pallas"],
            capture_output=True, text=True, timeout=args.pallas_timeout,
        )
        for line in out.stdout.splitlines():
            if line.startswith("{"):
                print(line)
                return
    except subprocess.TimeoutExpired:
        pass
    print(result_line(bench(use_pallas=False)))


if __name__ == "__main__":
    main()
