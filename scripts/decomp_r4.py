"""Single-protocol perf decomposition on the real chip (VERDICT round-3
items 1, 6, 7).

Round 3's numbers came from different protocols (20- vs 50-step chunks) and
different sessions (host-load varies 6x on the tunnel), leaving the
decomposition self-contradictory (kernel-only 1.747 ms vs full step 1.6 ms)
and the dispatch-regime claim uncomparable. This script measures EVERY part
under ONE protocol in ONE process/session: chunks of ``--chunk`` steps under
one jitted ``lax.scan``, completion forced by a host-transferred reduction,
best of ``--reps``, jobs run back to back.

Jobs (comma list via --jobs):
  full-pairx    whole step, pairx-bf16x3 inversion (the auto default)
  full-mono     whole step, mono-bf16x3 inversion (1 launch per inversion)
  kernel[@T]    v4 streamed step kernel ONLY (optionally tile=T), no inversion
  inv-pairx     inversion only (fwd-y, pair-x, inv-y = 3 kernel passes)
  inv-mono      inversion only (monolithic = 1 kernel pass)
  ypass         one y-kernel pass per iteration (per-launch cost floor)

Examples:
  python scripts/decomp_r4.py --M 2048 --chunk 50 \
      --jobs full-pairx,kernel,inv-pairx,full-mono,inv-mono
  python scripts/decomp_r4.py --M 2048 --chunk 10 --jobs full-mono,full-pairx
  python scripts/decomp_r4.py --M 2048 --chunk 50 \
      --jobs kernel@64,kernel@128,kernel@256

Writes results/decomp_r4_<M>_c<chunk>.json incrementally (a late hang never
loses earlier jobs). Run ONE instance at a time (remote compiles must not
overlap).
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

_OVR = {
    "pairx": dict(use_pallas=True, fft_impl="pallas", fft_pairx="on",
                  fft_mxu="bf16x3", step_chain="off", step_full="off"),
    "mono": dict(use_pallas=True, fft_impl="pallas", fft_mono="on",
                 fft_mxu="bf16x3", step_chain="off", step_full="off"),
    "fullstep": dict(use_pallas=True, fft_impl="pallas", step_full="on",
                     fft_mxu="bf16x3", step_chain="off"),
    # Follows the models/core auto gates (the shape picks its own kernel
    # forms — needed at 4096^2 where pair_x_fits is False and a pinned
    # fft_pairx="on" now raises).
    "pallas": dict(use_pallas=True, fft_impl="pallas"),
}


def _cfg(M, P, **ovr):
    return ModelConfig(M=M, P=P, Lx=4000.0 * KM, Ly=4000.0 * KM,
                       dt=60.0, T=3600.0, dtype="float32", **ovr)


def _sync(x):
    return float(jnp.sum(x))


def _measure(tag, fn, init, chunk, reps, rec):
    @jax.jit
    def run(carry):                      # ONE jitted scan per job
        def body(c, _):
            return fn(c), None
        out, _ = jax.lax.scan(body, carry, None, length=chunk)
        return out

    t0 = time.perf_counter()
    out = run(init)
    _sync(jax.tree_util.tree_leaves(out)[0])
    compile_s = time.perf_counter() - t0
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = run(out)
        _sync(jax.tree_util.tree_leaves(out)[0])
        best = min(best, time.perf_counter() - t0)
    rec[tag] = {"ms_per_iter": round(best / chunk * 1e3, 4),
                "compile_s": round(compile_s, 1),
                "best_chunk_s": round(best, 4)}
    print(f"[decomp] {tag}: {rec[tag]}", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--M", type=int, default=2048)
    ap.add_argument("--P", type=int, default=0)
    ap.add_argument("--chunk", type=int, default=50)
    ap.add_argument("--reps", type=int, default=4)
    ap.add_argument("--jobs", default="full-pairx,kernel,inv-pairx")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    M, P = args.M, args.P or args.M

    out_path = args.out or os.path.join(
        REPO, "results", f"decomp_r4_{M}_c{args.chunk}.json")
    rec = {"M": M, "P": P, "chunk": args.chunk, "reps": args.reps,
           "platform": jax.devices()[0].platform, "jobs": {}}
    if os.path.exists(out_path):      # accumulate across invocations
        with open(out_path) as f:
            prev = json.load(f)
        if (prev.get("M"), prev.get("P"), prev.get("chunk")) == (
                M, P, args.chunk):
            rec = prev

    base = _cfg(M, P, **_OVR["pairx"])
    state0 = core.init_state(base, key=jax.random.PRNGKey(0))

    for job in args.jobs.split(","):
        job = job.strip()
        try:
            if job.startswith("full-"):
                cfg = _cfg(M, P, **_OVR[job[5:]])
                model = core.QGModel(cfg)
                st = core.init_state(cfg, key=jax.random.PRNGKey(0))
                t0 = time.perf_counter()
                st = model.run(st, args.chunk)
                _sync(st.zeta)
                compile_s = time.perf_counter() - t0
                best = float("inf")
                for _ in range(args.reps):
                    t0 = time.perf_counter()
                    st = model.run(st, args.chunk)
                    _sync(st.zeta)
                    best = min(best, time.perf_counter() - t0)
                rec["jobs"][job] = {
                    "ms_per_iter": round(best / args.chunk * 1e3, 4),
                    "compile_s": round(compile_s, 1),
                    "best_chunk_s": round(best, 4)}
                print(f"[decomp] {job}: {rec['jobs'][job]}", flush=True)
            elif job.startswith("kernel"):
                tile = int(job.split("@")[1]) if "@" in job else 0
                from tpu_qg.ops.pallas_tendency import fused_step_streamed
                cfg = base

                def kstep(s, cfg=cfg, tile=tile):
                    zn, tend = fused_step_streamed(
                        cfg, s.zeta, s.psi, s.f1, s.f2, s.step, False, tile)
                    return core.State(zn, s.psi, tend, s.f1, s.step + 1)

                _measure(job, kstep, state0, args.chunk, args.reps,
                         rec["jobs"])
            elif job.startswith("inv-"):
                cfg = _cfg(M, P, **_OVR[job[4:]])
                inv = core._build_packed_inverter(cfg)
                _measure(job, lambda z: inv(z), state0.zeta, args.chunk,
                         args.reps, rec["jobs"])
            elif job == "ypass":
                cfg = base
                inv = core._build_packed_inverter(cfg)
                pf = inv._pfft
                _measure(job, lambda z: pf._call_y(z, False), state0.zeta,
                         args.chunk, args.reps, rec["jobs"])
            elif job.startswith("mg"):
                # mg@C: single-chip multigrid modal inversion (ops/
                # multigrid.py), C V-cycles per call, warm-started from the
                # previous call's psi (the production stepping pattern) —
                # per-V-cycle cost = (mg@2C - mg@C) / C.
                cycles = int(job.split("@")[1]) if "@" in job else 4
                from tpu_qg.ops.multigrid import MultigridModalInverter
                cfg = base
                mginv = MultigridModalInverter(
                    M, P, cfg.dx, cfg.S_eig, cfg.P_inv_matrix(),
                    cfg.back_projection_matrix(), n_cycles=cycles)
                # zeta rides the scan carry: closing over it would embed a
                # (2, M, P) CONSTANT in the program — 268 MB at 8192^2,
                # which overflows the remote-compile tunnel's request-size
                # limit (HTTP 413).
                _measure(job,
                         lambda t: (mginv(t[1], psi_prev=t[0]), t[1]),
                         (state0.psi, state0.zeta), args.chunk, args.reps,
                         rec["jobs"])
            elif job == "addone":
                # Scan-iteration floor probe: one elementwise full-field op
                # per iteration (HBM floor ~0.082 ms at 2048^2). Anything
                # measured far above it is per-iteration overhead that
                # inflates every standalone part measurement.
                _measure(job, lambda z: z + 1.0, state0.zeta, args.chunk,
                         args.reps, rec["jobs"])
            else:
                raise ValueError(f"unknown job {job!r}")
        except Exception as e:  # a failing job must not lose the session
            rec["jobs"][job] = {"error": repr(e)[:300]}
            print(f"[decomp] {job} FAILED: {e}", flush=True)
        os.makedirs(os.path.dirname(out_path), exist_ok=True)
        with open(out_path, "w") as f:
            json.dump(rec, f, indent=1)
    print(f"[decomp] wrote {out_path}")


if __name__ == "__main__":
    main()
