"""Fused-vs-XLA step rates for the BASELINE leapfrog presets (VERDICT #6).

The round-1 fused kernels excluded time_scheme="leapfrog_ra" and wind
forcing, so BASELINE configs 1-2 (barotropic-128 vortex, two-layer-256
wind-driven double-gyre) ran the slow path on TPU. This measures both paths
for both presets on the real chip and records the ratio.

    python scripts/bench_presets.py   # writes results/preset_rates.json

Timing protocol: n-step jitted scan chunks, host-transfer sync, best of
--reps (one process, sequential — never two TPU compiles at once).
"""

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import jax.numpy as jnp  # noqa: E402

from tpu_qg.config import preset  # noqa: E402
from tpu_qg.models.core import QGModel, init_state  # noqa: E402


def rate(cfg, steps, reps):
    model = QGModel(cfg)
    state = init_state(cfg, key=jax.random.PRNGKey(0))
    state = model.run(state, steps)
    float(jnp.sum(state.zeta))  # compile + warm
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        state = model.run(state, steps)
        float(jnp.sum(state.zeta))
        best = min(best, time.perf_counter() - t0)
    assert bool(jnp.isfinite(state.zeta).all()), "non-finite state"
    return cfg.M * cfg.P * steps / best, best / steps * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=500)
    ap.add_argument("--reps", type=int, default=4)
    ap.add_argument("--presets", nargs="*",
                    default=["barotropic-128", "two-layer-256"])
    args = ap.parse_args()

    out = {}
    for name in args.presets:
        out[name] = {}
        for label, use_pallas in (("fused", True), ("xla", False)):
            cfg = preset(name).replace(use_pallas=use_pallas)
            gps, ms = rate(cfg, args.steps, args.reps)
            out[name][label] = {"gridpoint_steps_per_s": round(gps, 1),
                                "ms_per_step": round(ms, 4)}
            print(f"[presets] {name} {label}: {ms:.4f} ms/step "
                  f"({gps:.3e} gps)", flush=True)
        f, x = (out[name]["fused"]["gridpoint_steps_per_s"],
                out[name]["xla"]["gridpoint_steps_per_s"])
        out[name]["fused_speedup"] = round(f / x, 3)

    path = os.path.join(REPO, "results", "preset_rates.json")
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as fh:
        json.dump({"steps": args.steps, "reps": args.reps,
                   "platform": jax.devices()[0].platform,
                   "presets": out}, fh, indent=1)
    print(f"[presets] wrote {path}")


if __name__ == "__main__":
    main()
