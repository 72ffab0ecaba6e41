# %% [markdown]
# # Benchmark result plots
#
# Counterpart of the reference's `benchmarking_results.ipynb` and
# `julia_parts_graph.ipynb`: loads the CSVs written by `benchmarks/sweep.py`
# and plots tpu_qg against the reference's published single-core numbers
# (BASELINE.md).

# %%
import csv
import pathlib
import sys

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt

PLOTS = pathlib.Path(__file__).resolve().parent.parent / "plots"
PLOTS.mkdir(exist_ok=True)

# Reference numbers (BASELINE.md): julia_times2 / python_times2 per-M runtimes,
# 1 model-day benchmark protocol, 1 CPU core.
REF_M = [8, 16, 32, 64, 128, 256]
REF_JULIA = [6.553e-3, 14.737e-3, 66.247e-3, 247.989e-3, 1.070, 5.141]
REF_PYQG = [7.252e-3, 10.669e-3, 24.428e-3, 52.869e-3, 192.47e-3, 867.33e-3]


# %%
def load_csv(path):
    with open(path) as f:
        rows = list(csv.DictReader(f))
    return ([int(r["M"]) for r in rows],
            {k: [float(r[k]) for r in rows] for k in rows[0] if k != "M"})


def main(full_csv=None):
    if full_csv is None:
        # Default to the committed real-chip CSV; fall back to a local one.
        repo = pathlib.Path(__file__).resolve().parent.parent
        cand = repo / "results" / "bench_full_tpu.csv"
        full_csv = str(cand) if cand.exists() else "bench_full.csv"
    fig, ax = plt.subplots()
    ax.loglog(REF_M, REF_JULIA, "s--", label="reference (Julia FD, 1 CPU core)")
    ax.loglog(REF_M, REF_PYQG, "^--", label="pyqg (pseudospectral, 1 CPU core)")
    if pathlib.Path(full_csv).exists():
        Ms, cols = load_csv(full_csv)
        ax.loglog(Ms, cols["Time"], "o-", label="tpu_qg (1 TPU v5e chip)")
    else:
        print(f"{full_csv} not found — run benchmarks/sweep.py full first; "
              "plotting reference curves only")
    ax.set_xlabel("M (grid = M x M)")
    ax.set_ylabel("runtime for 1 model-day [s]")
    ax.legend()
    ax.grid(True, which="both", alpha=0.3)
    out = PLOTS / "benchmark_comparison.png"
    fig.savefig(out, dpi=120, bbox_inches="tight")
    print(f"wrote {out}")


# %% [markdown]
# ## Per-part scaling (julia_parts_graph analog)
#
# The reference's `julia_parts_graph.ipynb` cell 2 plots evolve_psi /
# evolve_zeta / Cholesky-setup runtimes against M with fitted log-log slopes.
# Same plot here from `benchmarks/sweep.py parts` output: tendency
# (evolve_zeta analog), the elliptic inversion pair (evolve_psi analog), the
# whole step, and solver setup.

# %%
def parts(parts_csv=None):
    if parts_csv is None:
        repo = pathlib.Path(__file__).resolve().parent.parent
        cand = repo / "results" / "bench_parts_tpu.csv"
        parts_csv = str(cand) if cand.exists() else "bench_parts.csv"
    import numpy as np

    if not pathlib.Path(parts_csv).exists():
        print(f"{parts_csv} not found — run benchmarks/sweep.py parts first")
        return
    Ms, cols = load_csv(parts_csv)
    fig, ax = plt.subplots()
    labels = {"tendency": "tendency (evolve_zeta analog)",
              "inversion_pair": "elliptic inversion (evolve_psi analog)",
              "step": "full step",
              "solver_setup": "solver setup (one-time)"}
    logM = np.log(np.asarray(Ms, float))
    for key, lbl in labels.items():
        if key not in cols:
            continue
        t = np.asarray(cols[key], float)
        # Fitted log-log slope over the large-M half (small M is
        # dispatch-latency dominated on the remote chip).
        half = len(Ms) // 2
        slope = np.polyfit(logM[half:], np.log(t[half:]), 1)[0] \
            if len(Ms) - half >= 2 else float("nan")
        ax.loglog(Ms, t, "o-", label=f"{lbl}  [slope {slope:.2f}]")
    ax.set_xlabel("M (grid = M x M)")
    ax.set_ylabel("runtime [s]")
    ax.legend(fontsize=8)
    ax.grid(True, which="both", alpha=0.3)
    out = PLOTS / "parts_scaling.png"
    fig.savefig(out, dpi=120, bbox_inches="tight")
    print(f"wrote {out}")


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "parts":
        parts(*sys.argv[2:])
    else:
        main(*sys.argv[1:])
