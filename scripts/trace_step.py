"""On-chip profiler trace of the production step (round-4 VERDICT weak
item 1: no committed trace artifact backed the 'HBM-bound at realistic
sustained bandwidth' hypothesis).

jax.profiler.trace works through the axon tunnel and records per-kernel
device durations (verified: /device:TPU:0 events with per-fusion timings).
This script traces a jitted scan chunk of the selected job at --M, parses
the device timeline, and writes:

  results/trace_r5/<job>_<M>.json         per-op summary (name, count,
                                          total/mean us, % of device time)
  results/trace_r5/<job>_<M>.trace.json.gz  the raw timeline (committed)

  python scripts/trace_step.py --M 2048 --job full --steps 100
"""

import argparse
import glob
import gzip
import json
import os
import shutil
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


def _cfg(M, P, **ovr):
    return ModelConfig(M=M, P=P, Lx=4000.0 * KM, Ly=4000.0 * KM,
                       dt=60.0, T=3600.0, dtype="float32", **ovr)


def device_summary(trace_dir):
    f = sorted(glob.glob(os.path.join(
        trace_dir, "plugins/profile/*/*.trace.json.gz")))[-1]
    with gzip.open(f) as fh:
        d = json.load(fh)
    ev = d.get("traceEvents", [])
    pids = {e["pid"]: e["args"].get("name") for e in ev
            if e.get("ph") == "M" and e.get("name") == "process_name"}
    ops = {}
    for e in ev:
        if e.get("ph") == "X" and "TPU" in str(pids.get(e["pid"], "")):
            name = e.get("name", "?")
            dur = float(e.get("dur", 0.0))
            rec = ops.setdefault(name, [0, 0.0])
            rec[0] += 1
            rec[1] += dur
    total = sum(v[1] for v in ops.values())
    rows = [{"op": k[:90], "count": v[0],
             "total_us": round(v[1], 1),
             "mean_us": round(v[1] / v[0], 2),
             "pct": round(100.0 * v[1] / total, 1)}
            for k, v in sorted(ops.items(), key=lambda kv: -kv[1][1])]
    return f, total, rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--M", type=int, default=2048)
    ap.add_argument("--P", type=int, default=0)
    ap.add_argument("--job", default="full",
                    choices=["full", "kernel", "inv", "mg"])
    ap.add_argument("--steps", type=int, default=100)
    args = ap.parse_args()
    M, P = args.M, args.P or args.M

    base = _cfg(M, P, use_pallas=True, fft_impl="pallas", fft_pairx="on",
                fft_mxu="bf16x3", step_chain="off", step_full="off")
    state0 = core.init_state(base, key=jax.random.PRNGKey(0))

    if args.job == "full":
        model = core.QGModel(base)
        run = lambda s: model.run(s, args.steps)
        init = state0
    elif args.job == "kernel":
        from tpu_qg.ops.pallas_tendency import fused_step_streamed

        def kstep(s):
            zn, tend = fused_step_streamed(
                base, s.zeta, s.psi, s.f1, s.f2, s.step, False, 0)
            return core.State(zn, s.psi, tend, s.f1, s.step + 1)

        @jax.jit
        def run(s):
            out, _ = jax.lax.scan(lambda c, _: (kstep(c), None), s, None,
                                  length=args.steps)
            return out
        init = state0
    elif args.job == "inv":
        inv = core._build_packed_inverter(base)

        @jax.jit
        def run(z):
            out, _ = jax.lax.scan(lambda c, _: (inv(c), None), z, None,
                                  length=args.steps)
            return out
        init = state0.zeta
    else:  # mg
        from tpu_qg.ops.multigrid import MultigridModalInverter
        mginv = MultigridModalInverter(
            M, P, base.dx, base.S_eig, base.P_inv_matrix(),
            base.back_projection_matrix(), n_cycles=2)
        zc = state0.zeta

        @jax.jit
        def run(psi):
            out, _ = jax.lax.scan(
                lambda c, _: (mginv(zc, psi_prev=c), None), psi, None,
                length=args.steps)
            return out
        init = state0.psi

    out = run(init)          # compile + warm
    _ = float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))

    trace_dir = f"/tmp/trace_{args.job}_{M}"
    shutil.rmtree(trace_dir, ignore_errors=True)
    with jax.profiler.trace(trace_dir):
        out = run(out)
        _ = float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))

    src, total, rows = device_summary(trace_dir)
    dst_dir = os.path.join(REPO, "results", "trace_r5")
    os.makedirs(dst_dir, exist_ok=True)
    shutil.copy(src, os.path.join(dst_dir,
                                  f"{args.job}_{M}.trace.json.gz"))
    rec = {"M": M, "P": P, "job": args.job, "steps": args.steps,
           "device_total_us": round(total, 1),
           "us_per_step": round(total / args.steps, 2), "ops": rows[:25]}
    with open(os.path.join(dst_dir, f"{args.job}_{M}.json"), "w") as fh:
        json.dump(rec, fh, indent=1)
    print(json.dumps({k: rec[k] for k in
                      ("device_total_us", "us_per_step")}))
    for r in rows[:12]:
        print(f"  {r['pct']:5.1f}%  n={r['count']:5d}  "
              f"mean {r['mean_us']:9.2f} us  {r['op']}")


if __name__ == "__main__":
    main()
