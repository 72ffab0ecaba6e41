"""Micro-benchmarks of step/inversion variants on the real chip.

Usage (run ONE variant per invocation — remote compiles are slow and must not
overlap):

    python scripts/bench_variants.py step-xla          # packed inverter (new default)
    python scripts/bench_variants.py step-xla-batched  # old batched-rfft2 modal solve
    python scripts/bench_variants.py step-pallas       # v3 kernel + packed inverter
    python scripts/bench_variants.py step-pallas-v2    # v2 kernel + batched solve
    python scripts/bench_variants.py invert            # inversion only: packed vs batched

Timing protocol: chunks of `--steps` model steps under one jitted scan,
completion forced by host-transferring a reduction (block_until_ready does not
block through the axon tunnel), best of `--reps`.
"""

import argparse
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:  # `python scripts/...` puts scripts/ first
    sys.path.insert(0, _REPO)

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import jax.numpy as jnp  # noqa: E402

from tpu_qg.config import ModelConfig  # noqa: E402
from tpu_qg.constants import KM  # noqa: E402
from tpu_qg.models import core  # noqa: E402


def _cfg(M, P, use_pallas):
    return ModelConfig(M=M, P=P, Lx=4000.0 * KM, Ly=4000.0 * KM,
                       dt=60.0, T=3600.0, dtype="float32",
                       use_pallas=use_pallas)


def _sync(x):
    return float(jnp.sum(x))


def bench_step(cfg, steps, reps, force_batched=False):
    if force_batched:
        # Pre-packed-inverter algorithm: batched rfft2 modal solve +
        # physical-space projections.
        from tpu_qg.ops.spectral import BatchedModalSolver
        orig = core._build_solvers

        def batched_only(c, batched_fft=True):
            if batched_fft and c.n_layers == 2:
                return BatchedModalSolver(c.M, c.P, c.dx, (0.0, c.S_eig),
                                          gauge=c.poisson_gauge)
            return orig(c, batched_fft)

        core._build_solvers = batched_only
    try:
        model = core.QGModel(cfg)
        state = core.init_state(cfg, key=jax.random.PRNGKey(0))
        t0 = time.perf_counter()
        state = model.run(state, steps)
        _sync(state.zeta)
        print(f"  compile+first chunk: {time.perf_counter() - t0:.1f} s")
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            state = model.run(state, steps)
            _sync(state.zeta)
            best = min(best, time.perf_counter() - t0)
        ms = best / steps * 1e3
        gps = cfg.M * cfg.P * steps / best
        print(f"  {ms:.3f} ms/step   {gps:.3e} gridpoint-steps/s")
    finally:
        if force_batched:
            core._build_solvers = orig


def bench_invert(cfg, reps, variants=("packed", "batched")):
    from tpu_qg.ops.spectral import (BatchedModalSolver, PackedModalInverter,
                                     PackedModalInverterMXU,
                                     PackedModalInverterPallasFFT)
    inv_args = (cfg.M, cfg.P, cfg.dx, cfg.S_eig, cfg.P_inv_matrix(),
                cfg.back_projection_matrix())
    packed = PackedModalInverter(*inv_args)
    batched = BatchedModalSolver(cfg.M, cfg.P, cfg.dx, (0.0, cfg.S_eig))
    # Lazy: PallasFFT (and MXU) inverters reject grids their kernels don't
    # support, so only construct the ones actually requested.
    mxu = PackedModalInverterMXU(*inv_args) if "mxu" in variants else None
    pfft = (PackedModalInverterPallasFFT(*inv_args)
            if "pfft" in variants else None)
    (pi11, pi12), (pi21, pi22) = cfg.P_inv_matrix()
    (p11, p12), (p21, p22) = cfg.back_projection_matrix()

    def full_batched(z):
        zt = jnp.stack([pi11 * z[0] + pi12 * z[1],
                        pi21 * z[0] + pi22 * z[1]])
        pt = batched(zt)
        return jnp.stack([p11 * pt[0] + p12 * pt[1],
                          p21 * pt[0] + p22 * pt[1]])

    n_inner = 20

    def loop(fn):
        def body(z, _):
            return fn(z), None
        def run(z):
            out, _ = jax.lax.scan(body, z, None, length=n_inner)
            return out
        return jax.jit(run)

    z = jax.random.normal(jax.random.PRNGKey(1), (2, cfg.M, cfg.P),
                          jnp.float32)
    table = {"packed": ("packed (1x complex fft2+ifft2)", loop(packed)),
             "batched": ("batched (rfft2 modal + proj)", loop(full_batched)),
             "mxu": ("mxu (matmul-factorized DFT)", loop(mxu)),
             "pfft": ("pfft (fused Pallas factored DFT)", loop(pfft))}
    for name, impl in (("mxu", mxu), ("pfft", pfft)):
        if name in variants:
            ref = jax.jit(packed)(z)
            got = jax.jit(impl)(z)
            err = float(jnp.max(jnp.abs(got - ref)) / jnp.max(jnp.abs(ref)))
            print(f"  {name}-vs-packed max rel diff: {err:.3e}")
    for name, fn in (table[v] for v in variants):
        out = fn(z)
        _sync(out)
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            out = fn(z)
            _sync(out)
            best = min(best, time.perf_counter() - t0)
        print(f"  {name}: {best / n_inner * 1e3:.3f} ms/inversion")


def bench_kernel_only(cfg, reps):
    """The v4 streamed stencil kernel alone (no inversion): a jitted scan
    whose carry cycles (zeta, psi, f1, f2) through the kernel outputs."""
    from tpu_qg.ops.pallas_tendency import fused_step_streamed
    n_inner = 20

    def body(c, _):
        zeta, psi, f1, f2 = c
        zn, tend = fused_step_streamed(cfg, zeta, psi, f1, f2,
                                       jnp.asarray(5, jnp.int32))
        return (zn, psi, tend, f1), None

    @jax.jit
    def run(c):
        out, _ = jax.lax.scan(body, c, None, length=n_inner)
        return out

    k = jax.random.PRNGKey(0)
    c = tuple(jax.random.normal(jax.random.fold_in(k, i),
                                (2, cfg.M, cfg.P), jnp.float32)
              for i in range(4))
    t0 = time.perf_counter()
    c = run(c)
    _sync(c[0])
    print(f"  compile+first: {time.perf_counter() - t0:.1f} s")
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        c = run(c)
        _sync(c[0])
        best = min(best, time.perf_counter() - t0)
    print(f"  kernel-only: {best / n_inner * 1e3:.3f} ms/step-kernel")


def bench_fft_parts(cfg, reps):
    """Decompose the packed inversion's cost: bare fft2, fft2+ifft2, and the
    full chain (symbols + negate-spectrum flips) on a complex 2048^2 field."""
    from tpu_qg.ops.spectral import PackedModalInverter
    packed = PackedModalInverter(cfg.M, cfg.P, cfg.dx, cfg.S_eig,
                                 cfg.P_inv_matrix(),
                                 cfg.back_projection_matrix())
    n_inner = 20

    def loop(fn):
        def body(z, _):
            return fn(z), None
        def run(z):
            out, _ = jax.lax.scan(body, z, None, length=n_inner)
            return out
        return jax.jit(run)

    w = jax.random.normal(jax.random.PRNGKey(1), (cfg.M, cfg.P), jnp.float32)
    w = jax.lax.complex(w, w[::-1])

    def fft_only(z):
        # keep it a fixed point shape-wise: fft then scale down
        return jnp.fft.fft2(z) * (1.0 / (cfg.M * cfg.P))

    def fft_ifft(z):
        return jnp.fft.ifft2(jnp.fft.fft2(z))

    def full_chain(z):
        zz = jnp.stack([z.real, z.imag])
        p = packed(zz)
        return jax.lax.complex(p[0], p[1])

    for name, fn in (("fft2 only", loop(fft_only)),
                     ("fft2+ifft2", loop(fft_ifft)),
                     ("full packed chain", loop(full_chain))):
        out = fn(w)
        _sync(out.real)
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            out = fn(w)
            _sync(out.real)
            best = min(best, time.perf_counter() - t0)
        print(f"  {name}: {best / n_inner * 1e3:.3f} ms")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("variant", choices=["step-xla", "step-xla-batched",
                                        "step-pallas", "step-pallas-v2",
                                        "step-pallas-v4", "step-matmul",
                                        "step-pfft", "invert", "invert-mxu",
                                        "invert-pfft", "fft-parts",
                                        "kernel-only"])
    ap.add_argument("--M", type=int, default=2048)
    ap.add_argument("--P", type=int, default=2048)
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--reps", type=int, default=4)
    args = ap.parse_args()

    print(f"{args.variant} @ {args.M}x{args.P} on {jax.devices()[0].platform}")
    if args.variant == "invert":
        bench_invert(_cfg(args.M, args.P, False), args.reps)
    elif args.variant == "invert-mxu":
        bench_invert(_cfg(args.M, args.P, False), args.reps,
                     variants=("mxu", "packed"))
    elif args.variant == "invert-pfft":
        bench_invert(_cfg(args.M, args.P, False), args.reps,
                     variants=("pfft", "mxu"))
    elif args.variant == "fft-parts":
        bench_fft_parts(_cfg(args.M, args.P, False), args.reps)
    elif args.variant == "kernel-only":
        bench_kernel_only(_cfg(args.M, args.P, True), args.reps)
    elif args.variant == "step-xla":
        bench_step(_cfg(args.M, args.P, False), args.steps, args.reps)
    elif args.variant == "step-xla-batched":
        bench_step(_cfg(args.M, args.P, False), args.steps, args.reps,
                   force_batched=True)
    elif args.variant == "step-pallas":
        bench_step(_cfg(args.M, args.P, True), args.steps, args.reps)
    elif args.variant == "step-matmul":
        # v4 kernel + matmul-factorized DFT inversion.
        bench_step(_cfg(args.M, args.P, True).replace(fft_impl="matmul"),
                   args.steps, args.reps)
    elif args.variant == "step-pfft":
        # v4 kernel + fused Pallas factored-DFT inversion.
        bench_step(_cfg(args.M, args.P, True).replace(fft_impl="pallas"),
                   args.steps, args.reps)
    elif args.variant == "step-pallas-v4":
        # Swap the v3 kernel for the streamed (double-buffered input) v4 at
        # core's import site; everything else identical to step-pallas.
        from tpu_qg.ops import pallas_tendency as pt
        orig_fn = pt.fused_step_pre_fft
        pt.fused_step_pre_fft = pt.fused_step_streamed
        try:
            bench_step(_cfg(args.M, args.P, True), args.steps, args.reps)
        finally:
            pt.fused_step_pre_fft = orig_fn
    elif args.variant == "step-pallas-v2":
        # Force the v2 path by using the pin gauge? No — pin changes work.
        # Instead monkeypatch the packed-inverter gate off.
        from tpu_qg.ops.spectral import BatchedModalSolver
        orig = core._build_solvers

        def batched_only(c, batched_fft=True):
            if batched_fft and c.n_layers == 2:
                return BatchedModalSolver(c.M, c.P, c.dx, (0.0, c.S_eig),
                                          gauge=c.poisson_gauge)
            return orig(c, batched_fft)

        core._build_solvers = batched_only
        try:
            bench_step(_cfg(args.M, args.P, True), args.steps, args.reps)
        finally:
            core._build_solvers = orig


if __name__ == "__main__":
    main()
