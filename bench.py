"""Headline benchmark: grid-points/s per chip, two-layer QG at 2048^2.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The metric counts grid-point-steps per second (M * P * steps / elapsed) for the
full model step (fused tendencies + AB3 + spectral modal inversion, float32) on
one chip at the BASELINE config-4 resolution (2048^2).

Protocol (round 4): chunks of 500 steps under one jitted lax.scan, best of 3,
completion forced by a host-transferred reduction. Rounds 1-3 used 50-step
chunks; the round-4 floor probes (results/decomp_r4_2048_c50.json `addone`:
a single elementwise op per scan iteration measuring 0.505 ms against an
0.082 ms HBM floor) showed every chunk measurement carries a FIXED ~21-30 ms
of tunnel RPC + sync latency — ~0.45 ms/step of pure measurement artifact at
50-step chunks, which also produced the spurious "4096^2 is faster per point
than 2048^2" gap (VERDICT round 3 item 1). 500-step chunks amortize the
fixed cost to <0.06 ms/step; the number reported is the model, not the
tunnel.

vs_baseline: the reference has no GPU/TPU/parallel numbers; its best measured
throughput is the M=256 sweep point — 24 steps in 5.141 s on one CPU core
(BASELINE.md, julia_parts_graph.ipynb cell 3) = 3.06e5 grid-point-steps/s.
vs_baseline is the ratio of our per-chip throughput to that number.

Orchestration (round-2 hardening; see VERDICT.md): the headline metric must be
un-crashable. auto mode tries a tier ladder — each candidate step variant in
its own timeboxed subprocess — and falls through on ANY failure:

    pallas  fused Pallas tendency kernel + fused Pallas factored-DFT inversion
    matmul  fused Pallas tendency kernel + MXU matmul-DFT inversion (pure-XLA
            transforms; the fastest hardware-verified config of round 1)
    xla     fused Pallas tendency kernel + jnp.fft inversion
    plain   no Pallas anywhere, jnp.fft inversion (maximum-safety oracle path)

The final 'plain' tier is timeboxed in a subprocess like the others (a tunnel
hang in the remote compile RPC cannot be interrupted inline), and a JSON line
is ALWAYS printed (value 0.0 only if every tier failed, which would mean the
chip itself is unreachable). `python bench.py --mode <tier>` runs one tier
inline.
"""

import argparse
import json
import subprocess
import sys
import time

# Reference: M=256, 1 model-day, dt=60 min => 24 steps in 5.141 s (1 CPU core).
_REF_GRIDPOINT_STEPS_PER_S = 256 * 256 * 24 / 5.141

# mode -> ModelConfig overrides. fft_impl is ALWAYS pinned explicitly so a
# bad "auto" resolution can never leak a broken transform into a fallback
# tier. The "pallas" tier leaves fft_mxu/step_chain on "auto" so it follows
# the hardware gates in models/core; the explicit tiers pin them for
# decomposition measurements.
_MODES = {
    "pallas": dict(use_pallas=True, fft_impl="pallas"),
    "chain": dict(step_full="off", use_pallas=True, fft_impl="pallas", step_chain="on"),
    "chain-pairx": dict(step_full="off", use_pallas=True, fft_impl="pallas",
                        step_chain="on", fft_pairx="on"),
    "chain-pairx-bf16x3": dict(step_full="off", use_pallas=True, fft_impl="pallas",
                               fft_mxu="bf16x3", step_chain="on",
                               fft_pairx="on"),
    "pairx": dict(step_full="off", use_pallas=True, fft_impl="pallas", fft_pairx="on",
                  step_chain="off"),
    "pairx-bf16x3": dict(step_full="off", use_pallas=True, fft_impl="pallas", fft_pairx="on",
                         fft_mxu="bf16x3", step_chain="off"),
    "chain-bf16x3": dict(step_full="off", use_pallas=True, fft_impl="pallas",
                         fft_mxu="bf16x3", step_chain="on"),
    "pallas-bf16x3": dict(step_full="off", use_pallas=True, fft_impl="pallas",
                          fft_mxu="bf16x3", step_chain="off"),
    "pallas-hi": dict(step_full="off", use_pallas=True, fft_impl="pallas",
                      fft_mxu="highest", step_chain="off"),
    "mono-bf16x3": dict(step_full="off", use_pallas=True, fft_impl="pallas", fft_mono="on",
                        fft_mxu="bf16x3", step_chain="off"),
    "mono": dict(step_full="off", use_pallas=True, fft_impl="pallas", fft_mono="on",
                 fft_mxu="highest", step_chain="off"),
    "fullstep-bf16x3": dict(use_pallas=True, fft_impl="pallas",
                            step_full="on", fft_mxu="bf16x3",
                            step_chain="off"),
    "fullstep": dict(use_pallas=True, fft_impl="pallas", step_full="on",
                     fft_mxu="highest", step_chain="off"),
    "matmul": dict(use_pallas=True, fft_impl="matmul"),
    "xla": dict(use_pallas=True, fft_impl="xla"),
    "plain": dict(use_pallas=False, fft_impl="xla"),
}


def bench(mode: str, M=2048, P=2048, steps_per_chunk=500, reps=3):
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    import jax.numpy as jnp

    from tpu_qg.config import ModelConfig
    from tpu_qg.constants import KM
    from tpu_qg.models.core import QGModel, init_state

    cfg = ModelConfig(
        M=M, P=P, Lx=4000.0 * KM, Ly=4000.0 * KM,
        dt=60.0, T=3600.0, dtype="float32",
        **_MODES[mode],
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

    # A tier that produces non-finite fields must not record a number.
    if not bool(jnp.isfinite(state.zeta).all()):
        raise RuntimeError(f"tier {mode}: non-finite state after "
                           f"{steps_per_chunk * (reps + 1)} steps")
    # Roofline companion (VERDICT round-3 item 9): every headline number
    # carries its fraction of the HBM-bandwidth light-speed estimate.
    from tpu_qg.utils.profiling import roofline_report
    frac = roofline_report(cfg, best / steps_per_chunk)[
        "fraction_of_light_speed"]
    return M * P * steps_per_chunk / best, frac


def result_line(gps: float, M: int = 2048, P: int = 2048,
                roofline_fraction=None) -> str:
    rec = {
        "metric": f"gridpoint-steps/s per chip, two-layer QG {M}x{P} float32",
        "value": round(gps, 1),
        "unit": "gridpoint-steps/s",
        "vs_baseline": round(gps / _REF_GRIDPOINT_STEPS_PER_S, 2),
    }
    if roofline_fraction is not None:
        rec["hbm_roofline_fraction"] = round(roofline_fraction, 3)
    return json.dumps(rec)


def _try_subprocess(mode: str, timeout: float, M: int = 2048,
                    P: int = 2048):
    """Run one tier in a subprocess; return its JSON line or None."""
    try:
        out = subprocess.run(
            [sys.executable, __file__, "--mode", mode,
             "--M", str(M), "--P", str(P)],
            capture_output=True, text=True, timeout=timeout,
        )
    except subprocess.TimeoutExpired:
        print(f"[bench] tier {mode}: timed out after {timeout}s",
              file=sys.stderr)
        return None
    for line in out.stdout.splitlines():
        if line.startswith("{"):
            return line
    tail = (out.stderr or out.stdout or "").strip().splitlines()[-3:]
    print(f"[bench] tier {mode}: rc={out.returncode} " + " | ".join(tail),
          file=sys.stderr)
    return None


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--mode", default="auto",
                        choices=["auto"] + sorted(_MODES))
    parser.add_argument("--M", type=int, default=2048)
    parser.add_argument("--P", type=int, default=2048)
    parser.add_argument("--tier-timeout", type=float, default=1500.0,
                        help="per-tier subprocess timeout in auto mode "
                             "(remote-tunnel compiles run 3-15 min)")
    args = parser.parse_args()

    if args.mode != "auto":
        gps, frac = bench(args.mode, M=args.M, P=args.P)
        print(result_line(gps, args.M, args.P, roofline_fraction=frac))
        return

    # "pallas" follows the hardware gates (may include the y-fused chain and
    # bf16x3); "pallas-hi" is the round-2-validated fused config pinned, so a
    # gated-in experiment failing can never cost more than one tier.
    for mode in ("pallas", "pallas-hi", "matmul", "xla"):
        line = _try_subprocess(mode, args.tier_timeout, args.M, args.P)
        if line is not None:
            print(line)
            return

    # Last resort: maximum-safety path, still timeboxed in a subprocess — a
    # tunnel hang during the plain compile cannot be interrupted inline
    # (processes blocked in the remote compile RPC ignore signals), and the
    # headline JSON must ALWAYS be printed.
    line = _try_subprocess("plain", args.tier_timeout, args.M, args.P)
    print(line if line is not None else result_line(0.0, args.M, args.P))


if __name__ == "__main__":
    main()
