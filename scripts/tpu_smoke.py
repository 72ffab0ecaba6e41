"""Hardware smoke gate for step-path defaults (VERDICT.md round-1 process fix).

A config default (e.g. routing ``fft_impl="auto"`` through a new kernel) may
only change in a commit whose smoke JSON shows that path COMPILING and
MATCHING the XLA oracle on the real chip at the headline 2048^2 size. This
script is that gate:

    python scripts/tpu_smoke.py                   # all variants, sequential
    python scripts/tpu_smoke.py --variants pallas # one variant
    python scripts/tpu_smoke.py --inner plain     # (internal) one variant inline

Each variant runs in its own timeboxed subprocess (remote-tunnel compiles run
3-15 min; a kernel that fails to compile must not take the gate down with it)
and is compared against the ``plain`` oracle state (no Pallas anywhere,
jnp.fft inversion) after a fixed number of steps from a fixed seed. Results
accumulate in ``results/tpu_smoke_<gitrev>.json``.

Variants mirror bench.py's tier ladder:
    plain   use_pallas=False, fft_impl=xla   (oracle; always run first)
    xla     use_pallas=True,  fft_impl=xla
    matmul  use_pallas=True,  fft_impl=matmul
    pallas  use_pallas=True,  fft_impl=pallas

Reference counterpart: the reference's only correctness gate for its hot loop
is running it (src/run_model.jl:82-92); on a remote accelerator with a slow
compiler that is not enough — hence this explicit pre-flip gate.
"""

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:  # `python scripts/...` puts scripts/ first, not REPO
    sys.path.insert(0, REPO)
# The oracle cache is keyed by git revision as well as shape/steps so a
# variant-only smoke run can never compare against an oracle produced by an
# older commit's plain path (ADVICE.md round 2) — gate evidence requires the
# plain oracle from the SAME revision.
ORACLE_NPY = "/tmp/tpu_smoke_oracle_{rev}_{M}x{P}_s{steps}.npy"


def _git_rev() -> str:
    return subprocess.run(["git", "rev-parse", "--short", "HEAD"], cwd=REPO,
                          capture_output=True, text=True).stdout.strip()

# variant -> ModelConfig overrides
VARIANTS = {
    "plain": dict(use_pallas=False, fft_impl="xla"),
    "xla": dict(use_pallas=True, fft_impl="xla"),
    "matmul": dict(use_pallas=True, fft_impl="matmul"),
    "pallas": dict(use_pallas=True, fft_impl="pallas"),
    # bf16x3 MXU stage inside the Pallas DFT kernels (gate for
    # models/core._BF16X3_IN_AUTO).
    "pallas-bf16x3": dict(step_full="off", use_pallas=True, fft_impl="pallas",
                          fft_mxu="bf16x3"),
    # Highest-precision MXU stage pinned (isolates the bf16x3 contribution
    # in f64 adjudications — ADVICE.md round 3).
    "pallas-hi": dict(step_full="off", use_pallas=True, fft_impl="pallas",
                      fft_mxu="highest"),
    # y-fused three-kernel step chain (gate for models/core._YFUSED_IN_AUTO).
    "chain": dict(step_full="off", use_pallas=True, fft_impl="pallas", step_chain="on"),
    "chain-bf16x3": dict(step_full="off", use_pallas=True, fft_impl="pallas",
                         fft_mxu="bf16x3", step_chain="on"),
    # mirror-pair fused x-kernel (gate for models/core._PAIRX_IN_AUTO).
    "pairx": dict(step_full="off", use_pallas=True, fft_impl="pallas", fft_pairx="on"),
    "pairx-bf16x3": dict(step_full="off", use_pallas=True, fft_impl="pallas", fft_pairx="on",
                         fft_mxu="bf16x3"),
    "chain-pairx": dict(step_full="off", use_pallas=True, fft_impl="pallas",
                        step_chain="on", fft_pairx="on"),
    "chain-pairx-bf16x3": dict(step_full="off", use_pallas=True, fft_impl="pallas",
                               fft_mxu="bf16x3", step_chain="on",
                               fft_pairx="on"),
    # monolithic single-pass inversion kernel (gate for
    # models/core._MONO_IN_AUTO).
    "mono": dict(step_full="off", use_pallas=True, fft_impl="pallas", fft_mono="on",
                 fft_mxu="highest"),
    "mono-bf16x3": dict(step_full="off", use_pallas=True, fft_impl="pallas", fft_mono="on",
                        fft_mxu="bf16x3"),
    # one-launch whole-step kernel (gate for models/core._FULLSTEP_IN_AUTO).
    "fullstep": dict(use_pallas=True, fft_impl="pallas", step_full="on",
                     fft_mxu="highest"),
    "fullstep-bf16x3": dict(use_pallas=True, fft_impl="pallas",
                            step_full="on", fft_mxu="bf16x3"),
}
# Default run = bench.py's tier ladder; experimental variants are opt-in.
DEFAULT_VARIANTS = ["plain", "xla", "matmul", "pallas"]


def run_inner(variant: str, M: int, P: int, steps: int,
              inversion_only: bool = False) -> dict:
    """One variant inline: compile + run `steps` steps, compare vs oracle."""
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    import jax.numpy as jnp
    import numpy as np

    from tpu_qg.config import ModelConfig
    from tpu_qg.constants import KM
    from tpu_qg.models.core import QGModel, init_state

    overrides = VARIANTS[variant]
    cfg = ModelConfig(M=M, P=P, Lx=4000.0 * KM, Ly=4000.0 * KM,
                      dt=60.0, T=3600.0, dtype="float32", **overrides)
    rec = {"variant": variant, "M": M, "P": P, "steps": steps,
           **overrides, "platform": jax.devices()[0].platform}

    # Record which inversion form actually ENGAGED (ADVICE.md round 3: a
    # silent fits-gate fallback must never masquerade as kernel evidence —
    # round 3's "mono" smokes actually measured pairx because mono_fits
    # rejected 2048^2). The explicit-pin ValueError in
    # models.core._build_packed_inverter now also fails such runs loudly.
    from tpu_qg.models.core import _build_solvers
    try:
        _s = _build_solvers(cfg)
        rec["engaged"] = {
            "inverter": type(_s).__name__,
            "fuse": getattr(_s, "_fuse", None),
            "pair": getattr(_s, "_pair", None),
            "pair_stream": getattr(_s, "_pair_stream", None),
            "mono": getattr(_s, "_mono", None),
            "stream_x": getattr(getattr(_s, "_pfft", None), "_stream_x",
                                None),
        }
        from tpu_qg.models.core import (_resolve_fft_impl, _resolve_fullstep,
                                        _use_pallas)
        from tpu_qg.ops.pallas_fullstep import fullstep_supported
        rec["engaged"]["fullstep"] = bool(
            _use_pallas(cfg) and _resolve_fft_impl(cfg) == "pallas"
            and _resolve_fullstep(cfg)
            and fullstep_supported(cfg, jnp.dtype(cfg.dtype)))
    except ValueError as e:   # pinned form cannot engage: fail loudly
        rec["ok"] = False
        rec["error_tail"] = [str(e)]
        return rec

    if inversion_only:
        # Transform-level accuracy: ONE zeta -> psi inversion vs the plain
        # (jnp.fft packed) inverter on the same input. Separates the
        # kernels' intrinsic error from chaotic trajectory amplification
        # (the 5-step metric at 8192^2 conflates them — VERDICT round 2).
        from tpu_qg.models.core import _build_solvers
        rec["mode"] = "inversion"
        t0 = time.perf_counter()
        solvers = _build_solvers(cfg)
        state = init_state(cfg, key=jax.random.PRNGKey(0))
        inv = jax.jit(lambda z: solvers(z))
        psi = np.asarray(inv(state.zeta))
        rec["compile_and_run_s"] = round(time.perf_counter() - t0, 2)
        rec["finite"] = bool(np.isfinite(psi).all())
        oracle_path = ORACLE_NPY.format(rev=_git_rev(), M=M, P=P,
                                        steps="inv")
        if variant == "plain":
            np.save(oracle_path, psi)
            rec["max_rel_diff_vs_plain"] = 0.0
        elif os.path.exists(oracle_path):
            oracle = np.load(oracle_path)
            scale = float(np.max(np.abs(oracle)))
            rec["max_rel_diff_vs_plain"] = float(
                np.max(np.abs(psi - oracle)) / scale)
        else:
            rec["max_rel_diff_vs_plain"] = None
        t0 = time.perf_counter()
        for _ in range(10):
            out = inv(state.zeta)
        float(jnp.sum(out))
        rec["ms_per_inversion"] = round(
            (time.perf_counter() - t0) / 10 * 1e3, 3)
        rec["ok"] = bool(rec["finite"]
                         and (rec["max_rel_diff_vs_plain"] is None
                              or rec["max_rel_diff_vs_plain"] < 2e-5))
        return rec

    t0 = time.perf_counter()
    model = QGModel(cfg)
    if "chain" in variant:
        # A chain variant that silently fell back to the plain step path must
        # not masquerade as chain evidence.
        rec["chain_active"] = model._chain is not None
        if not rec["chain_active"]:
            rec["ok"] = False
            rec["error_tail"] = ["make_chain_fns returned None"]
            return rec
    state = init_state(cfg, key=jax.random.PRNGKey(0))
    state = model.run(state, steps)
    zeta = np.asarray(state.zeta)  # host transfer forces completion
    rec["compile_and_run_s"] = round(time.perf_counter() - t0, 2)

    rec["finite"] = bool(np.isfinite(zeta).all())
    oracle_path = ORACLE_NPY.format(rev=_git_rev(), M=M, P=P, steps=steps)
    if variant == "plain":
        np.save(oracle_path, zeta)
        rec["max_rel_diff_vs_plain"] = 0.0
    elif os.path.exists(oracle_path):
        oracle = np.load(oracle_path)
        scale = float(np.max(np.abs(oracle)))
        rec["max_rel_diff_vs_plain"] = float(
            np.max(np.abs(zeta - oracle)) / scale)
    else:
        rec["max_rel_diff_vs_plain"] = None  # oracle unavailable

    # One timed chunk for a rough rate (not the headline protocol).
    t0 = time.perf_counter()
    state = model.run(state, steps)
    float(jnp.sum(state.zeta))  # block_until_ready doesn't block on the tunnel
    dt = time.perf_counter() - t0
    rec["ms_per_step"] = round(dt / steps * 1e3, 3)
    rec["ok"] = bool(rec["finite"] and
                     (rec["max_rel_diff_vs_plain"] is None or
                      rec["max_rel_diff_vs_plain"] < 2e-4))
    return rec


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--variants", nargs="*", default=DEFAULT_VARIANTS,
                    choices=list(VARIANTS))
    ap.add_argument("--M", type=int, default=2048)
    ap.add_argument("--P", type=int, default=2048)
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--timeout", type=float, default=1800.0)
    ap.add_argument("--inversion-only", action="store_true",
                    help="measure ONE zeta->psi inversion vs the plain "
                         "inverter instead of a stepped trajectory")
    ap.add_argument("--inner", help="(internal) run one variant inline")
    args = ap.parse_args()

    if args.inner:
        print("SMOKE_JSON " + json.dumps(
            run_inner(args.inner, args.M, args.P, args.steps,
                      inversion_only=args.inversion_only)))
        return

    rev = _git_rev()
    size = "" if (args.M, args.P) == (2048, 2048) else f"_{args.M}x{args.P}"
    if args.inversion_only:
        size += "_inv"
    out_path = os.path.join(REPO, "results", f"tpu_smoke_{rev}{size}.json")
    records = []
    # plain (the oracle) always runs first so comparisons are meaningful.
    order = [v for v in VARIANTS if v in args.variants]
    if "plain" in order:
        order.remove("plain")
        order.insert(0, "plain")
    for variant in order:
        cmd = [sys.executable, __file__, "--inner", variant,
               "--M", str(args.M), "--P", str(args.P),
               "--steps", str(args.steps)]
        if args.inversion_only:
            cmd.append("--inversion-only")
        print(f"[smoke] {variant} ...", flush=True)
        try:
            r = subprocess.run(cmd, capture_output=True, text=True,
                               timeout=args.timeout, cwd=REPO)
            rec = None
            for line in r.stdout.splitlines():
                if line.startswith("SMOKE_JSON "):
                    rec = json.loads(line[len("SMOKE_JSON "):])
            if rec is None:
                tail = (r.stderr or r.stdout or "").strip().splitlines()[-6:]
                rec = {"variant": variant, "ok": False, "rc": r.returncode,
                       "error_tail": tail}
        except subprocess.TimeoutExpired:
            rec = {"variant": variant, "ok": False,
                   "error_tail": [f"timeout after {args.timeout}s"]}
        print(f"[smoke] {variant}: {json.dumps(rec)}", flush=True)
        records.append(rec)
        # Persist incrementally so a later hang never loses earlier evidence.
        os.makedirs(os.path.dirname(out_path), exist_ok=True)
        with open(out_path, "w") as f:
            json.dump({"rev": rev, "M": args.M, "P": args.P,
                       "steps": args.steps, "records": records}, f, indent=1)
    print(f"[smoke] wrote {out_path}")


if __name__ == "__main__":
    main()
