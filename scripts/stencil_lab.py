"""Run the stencil-kernel ablation lab on the real chip (see
tpu_qg/ops/_stencil_lab.py). Kernel-only, 50-step-chunk protocol, one
session — directly comparable to the `kernel` row of
results/decomp_r4_2048_c50.json.

    python scripts/stencil_lab.py --variants base,aligned,norot,noslice,nojac

Appends to results/stencil_lab_<M>.json. Run ONE instance at a time.
"""

import argparse
import json
import os
import sys
import time

_SCRIPTS = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(_SCRIPTS)
for _p in (REPO, _SCRIPTS):
    if _p not in sys.path:
        sys.path.insert(0, _p)

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import jax.numpy as jnp  # noqa: E402

from tpu_qg.config import ModelConfig  # noqa: E402
from tpu_qg.constants import KM  # noqa: E402
from tpu_qg.models import core  # noqa: E402
from tpu_qg.ops._stencil_lab import lab_step  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--M", type=int, default=2048)
    ap.add_argument("--chunk", type=int, default=50)
    ap.add_argument("--reps", type=int, default=4)
    ap.add_argument("--variants", default="base,aligned,norot,noslice,nojac")
    args = ap.parse_args()
    M = P = args.M

    cfg = ModelConfig(M=M, P=P, Lx=4000.0 * KM, Ly=4000.0 * KM,
                      dt=60.0, T=3600.0, dtype="float32", use_pallas=True,
                      fft_impl="pallas")
    state0 = core.init_state(cfg, key=jax.random.PRNGKey(0))

    out_path = os.path.join(REPO, "results", f"stencil_lab_{M}.json")
    rec = {"M": M, "chunk": args.chunk, "reps": args.reps,
           "platform": jax.devices()[0].platform, "jobs": {}}
    if os.path.exists(out_path):
        prev = json.load(open(out_path))
        if prev.get("M") == M and prev.get("chunk") == args.chunk:
            rec = prev

    def sync(x):
        return float(jnp.sum(x))

    for variant in args.variants.split(","):
        variant = variant.strip()
        try:
            @jax.jit
            def run(s, variant=variant):
                def body(c, _):
                    zn, tend = lab_step(cfg, c.zeta, c.psi, c.f1, c.f2,
                                        c.step, variant)
                    return core.State(zn, c.psi, tend, c.f1,
                                      c.step + 1), None
                out, _ = jax.lax.scan(body, s, None, length=args.chunk)
                return out

            t0 = time.perf_counter()
            st = run(state0)
            sync(st.zeta)
            compile_s = time.perf_counter() - t0
            best = float("inf")
            for _ in range(args.reps):
                t0 = time.perf_counter()
                st = run(st)
                sync(st.zeta)
                best = min(best, time.perf_counter() - t0)
            rec["jobs"][variant] = {
                "ms_per_iter": round(best / args.chunk * 1e3, 4),
                "compile_s": round(compile_s, 1)}
            print(f"[lab] {variant}: {rec['jobs'][variant]}", flush=True)
        except Exception as e:
            rec["jobs"][variant] = {"error": repr(e)[:300]}
            print(f"[lab] {variant} FAILED: {e}", flush=True)
        os.makedirs(os.path.dirname(out_path), exist_ok=True)
        with open(out_path, "w") as f:
            json.dump(rec, f, indent=1)
    print(f"[lab] wrote {out_path}")


if __name__ == "__main__":
    main()
