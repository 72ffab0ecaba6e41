"""Transform-accuracy evidence at production scale (VERDICT.md round-2 #9).

Runs the SAME 2048^2 two-layer float32 trajectory (same seed) under each
transform backend — the jnp.fft oracle ("xla") and the fused Pallas
factored-DFT ("pallas", HIGH/bf16x3 small stages, HIGHEST MXU stage) — for
``--steps`` steps on the real chip, recording energy/enstrophy every chunk
and the final isotropic KE spectrum. Justifies (or demotes) the non-XLA
transform defaults: if the curves and spectra overlay to within the f32
noise floor of the chaotic dynamics, the faster transform is safe for
production.

    python scripts/accuracy_drift.py --steps 10000 --chunk 500

Writes results/accuracy_2048_<steps>.json and plots/accuracy_drift_2048.png.
Run ONE process at a time (remote compiles must not overlap).
"""

import argparse
import json
import os
import sys
import time

_SCRIPTS = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(_SCRIPTS)
for _p in (REPO, _SCRIPTS):   # _SCRIPTS: `from tpu_smoke import VARIANTS`
    if _p not in sys.path:    # must resolve from any cwd / -m invocation
        sys.path.insert(0, _p)

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from tpu_qg.config import ModelConfig  # noqa: E402
from tpu_qg.constants import KM  # noqa: E402
from tpu_qg.models.core import QGModel, init_state  # noqa: E402
from tpu_qg.utils.diagnostics import (energy, energy_spectrum,  # noqa: E402
                                      enstrophy)


def run_one(fft_impl: str, M: int, steps: int, chunk: int):
    # Plain fft_impl names, or any scripts/tpu_smoke.py variant name
    # (e.g. "pairx-bf16x3", "chain-pairx-bf16x3") for gate-flip evidence.
    from tpu_smoke import VARIANTS
    overrides = VARIANTS.get(fft_impl, dict(use_pallas=True,
                                            fft_impl=fft_impl))
    cfg = ModelConfig(M=M, P=M, Lx=4000.0 * KM, Ly=4000.0 * KM,
                      dt=60.0, T=float(steps * 60.0), dtype="float32",
                      **overrides)
    model = QGModel(cfg)
    state = init_state(cfg, key=jax.random.PRNGKey(0))

    diag = jax.jit(lambda s: (jnp.sum(energy(cfg, s.psi)),
                              jnp.sum(enstrophy(s.zeta))))
    series = {"step": [], "energy": [], "enstrophy": []}
    t0 = time.perf_counter()
    for k in range(steps // chunk):
        state = model.run(state, chunk)
        e, z = diag(state)
        series["step"].append((k + 1) * chunk)
        series["energy"].append(float(e))
        series["enstrophy"].append(float(z))
        if not np.isfinite(series["energy"][-1]):
            raise RuntimeError(f"{fft_impl}: non-finite energy at "
                               f"step {(k + 1) * chunk}")
    wall = time.perf_counter() - t0
    k_centers, spec = energy_spectrum(cfg, state.psi)
    return {
        "fft_impl": fft_impl, "M": M, "steps": steps, "chunk": chunk,
        "wall_s": round(wall, 1), "series": series,
        "spectrum_k": np.asarray(k_centers).tolist(),
        "spectrum": np.asarray(spec).tolist(),
        "final_zeta_absmax": float(jnp.max(jnp.abs(state.zeta))),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--M", type=int, default=2048)
    ap.add_argument("--steps", type=int, default=10000)
    ap.add_argument("--chunk", type=int, default=500)
    ap.add_argument("--impls", nargs="*", default=["xla", "pallas"])
    args = ap.parse_args()

    records = []
    out_json = os.path.join(REPO, "results",
                            f"accuracy_{args.M}_{args.steps}.json")
    for impl in args.impls:
        print(f"[accuracy] {impl} ...", flush=True)
        rec = run_one(impl, args.M, args.steps, args.chunk)
        print(f"[accuracy] {impl}: wall {rec['wall_s']}s  "
              f"E_final={rec['series']['energy'][-1]:.6e}  "
              f"Z_final={rec['series']['enstrophy'][-1]:.6e}", flush=True)
        records.append(rec)
        os.makedirs(os.path.dirname(out_json), exist_ok=True)
        with open(out_json, "w") as f:
            json.dump({"records": records}, f)

    if len(records) >= 2:
        ref, others = records[0], records[1:]
        summary = {}
        for rec in others:
            e0 = np.asarray(ref["series"]["energy"])
            e1 = np.asarray(rec["series"]["energy"])
            z0 = np.asarray(ref["series"]["enstrophy"])
            z1 = np.asarray(rec["series"]["enstrophy"])
            summary[rec["fft_impl"]] = {
                "max_rel_energy_diff": float(np.max(np.abs(e1 - e0) / e0)),
                "max_rel_enstrophy_diff": float(np.max(np.abs(z1 - z0) / z0)),
            }
        with open(out_json, "w") as f:
            json.dump({"records": records, "vs_" + ref["fft_impl"]: summary},
                      f)
        print(f"[accuracy] summary vs {ref['fft_impl']}: "
              + json.dumps(summary))

        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        fig, axes = plt.subplots(1, 3, figsize=(13, 3.6))
        for rec in records:
            s = rec["series"]
            axes[0].plot(s["step"], s["energy"], label=rec["fft_impl"])
            axes[1].plot(s["step"], s["enstrophy"], label=rec["fft_impl"])
            axes[2].loglog(rec["spectrum_k"],
                           np.asarray(rec["spectrum"]).sum(axis=0),
                           label=rec["fft_impl"])
        axes[0].set_xlabel("step"), axes[0].set_ylabel("total energy")
        axes[1].set_xlabel("step"), axes[1].set_ylabel("enstrophy")
        axes[2].set_xlabel("k"), axes[2].set_ylabel("KE spectrum (final)")
        for ax in axes:
            ax.legend(), ax.grid(alpha=0.3)
        fig.suptitle(f"{args.M}^2 f32, {args.steps} steps: transform-backend "
                     "drift (same seed)")
        out_png = os.path.join(REPO, "plots", f"accuracy_drift_{args.M}.png")
        fig.savefig(out_png, dpi=120, bbox_inches="tight")
        print(f"[accuracy] wrote {out_json} and {out_png}")


if __name__ == "__main__":
    main()
