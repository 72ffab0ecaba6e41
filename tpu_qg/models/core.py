"""Two-layer (and single-layer barotropic) QG model: state, tendencies, stepping.

TPU-native re-design of the reference's model layer (reference: src/model.jl).
Key architectural differences from the reference, by design:

  * State is an interior-only pytree carried through ``lax.scan`` — no ghost
    ring, no 4-D ring buffers with dead slots. The reference keeps
    (M+2, P+2, 2, 3) arrays (src/model.jl:53-54) of which only time-level 1 of
    zeta/psi is ever read (AB3 history lives in f_store); we carry exactly the
    data the scheme needs: current zeta, current psi, and the two past
    tendencies per layer.
  * The elliptic inversion is spectral (tpu_qg.ops.spectral) instead of sparse
    Cholesky backsolves (reference: src/model.jl:184-192).
  * Euler (first two steps) vs AB3 (after) dispatch (reference:
    src/model.jl:160-170) is a branch-free ``jnp.where`` on the step counter so
    one compiled step function serves the whole run.
  * float32 on the TPU speed path, float64 (jax_enable_x64) for the
    reference-equivalence path — dtype is a config axis.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import Array

from ..config import ModelConfig
from ..ops.spectral import HelmholtzSolver
from ..ops.stencils import arakawa_J, centered_diff_x, laplace_5p


class State(NamedTuple):
    """Simulation state (a JAX pytree).

    zeta: (L, M, P) potential-vorticity-like prognostic field.
    psi:  (L, M, P) streamfunction (diagnostic, from elliptic inversion).
    f1:   (L, M, P) tendency of the previous step (the reference's f_store
          slot 2, src/model.jl:101-106,129-136).
    f2:   (L, M, P) tendency two steps back (f_store slot 3). Kept as two
          separate leaves (not a stacked (2, L, M, P) array) so the per-step
          history shift is pure pytree re-binding — XLA aliases the buffers
          instead of copying, unlike the reference's ring-buffer copy.
    step: () int32 — number of completed steps.
    """

    zeta: Array
    psi: Array
    f1: Array
    f2: Array
    step: Array


def _tendencies(cfg: ModelConfig, zeta: Array, psi: Array) -> Array:
    """Per-layer RHS d(zeta)/dt, fused across layers.

    Layer 1 (reference: src/model.jl:139-145, ``zeta_f1``):
        visc*lap(lap(psi)) - J(zeta, psi) - beta_1*d(psi)/dx - U*d(zeta)/dx
    Layer 2 (reference: src/model.jl:147-153, ``zeta_f2``):
        visc*lap(lap(psi)) - J(zeta, psi) - beta_2*d(psi)/dx - r*lap(psi)

    Single-layer barotropic variant: layer-1 form plus bottom drag -r*lap(psi)
    with no layer coupling.
    """
    dx = cfg.dx
    dtype = zeta.dtype
    lap_psi = laplace_5p(psi, dx)              # (L, M, P), used by visc and drag
    visc_term = cfg.visc * laplace_5p(lap_psi, dx)
    jac = arakawa_J(zeta, psi, dx)
    dpsi_dx = centered_diff_x(psi, dx)

    if cfg.n_layers == 1:
        u_term = cfg.U * centered_diff_x(zeta, dx)
        drag = cfg.r * lap_psi
        tend = visc_term - jac - cfg.beta * dpsi_dx - u_term - drag
        if cfg.wind_tau0 != 0.0:
            tend = tend + _wind_forcing(cfg, dtype)[None]
        return tend

    betas = jnp.asarray([cfg.beta_1, cfg.beta_2], dtype)[:, None, None]
    beta_term = betas * dpsi_dx
    # Layer 1: mean-flow advection U d(zeta)/dx; layer 2: bottom drag r*lap(psi).
    u_term = cfg.U * centered_diff_x(zeta[0], dx)
    drag = cfg.r * lap_psi[1]
    extra = jnp.stack([u_term, drag])
    tend = visc_term - jac - beta_term - extra
    if cfg.wind_tau0 != 0.0:
        tend = tend.at[0].add(_wind_forcing(cfg, dtype))
    return tend


def _wind_forcing(cfg: ModelConfig, dtype) -> Array:
    """Double-gyre wind-stress-curl PV forcing on the top layer:
    F(y) = -(2 pi tau_0 / (rho_0 H_1 Ly)) sin(2 pi y / Ly), broadcast over x
    (two counter-rotating gyres on the periodic domain). Extension beyond the
    reference, whose only forcing is the imposed shear U. Shape (1, P)."""
    y = np.arange(cfg.P) * cfg.dx
    amp = 2.0 * np.pi * cfg.wind_tau0 / (cfg.rho0 * cfg.H_1 * cfg.Ly)
    f = -amp * np.sin(2.0 * np.pi * y / cfg.Ly)
    return jnp.asarray(f, dtype)[None, :]


def _invert_psi(cfg: ModelConfig, solvers, zeta: Array) -> Array:
    """Streamfunction from PV: modal decomposition + spectral elliptic solves.

    Reference: ``evolve_psi!`` (src/model.jl:172-199) — project zeta into
    barotropic/baroclinic modes with P_inv, solve Poisson (mode 1) and modified
    Helmholtz (mode 2), project back with P. The reference's back-projection
    quirk P_matrix(H_1, H_1) (src/model.jl:173) is honored via
    cfg.back_projection_matrix().
    """
    from ..ops.spectral import PackedModalInverter
    if isinstance(solvers, PackedModalInverter):
        # Projection, solves, and back-projection all live in the spectral
        # symbols: one complex fft2/ifft2 pair, nothing else.
        return solvers(zeta)

    if cfg.n_layers == 1:
        if isinstance(solvers, tuple):
            return solvers[0](zeta)
        return solvers(zeta)

    (pi11, pi12), (pi21, pi22) = cfg.P_inv_matrix()
    zt1 = pi11 * zeta[0] + pi12 * zeta[1]   # barotropic mode
    zt2 = pi21 * zeta[0] + pi22 * zeta[1]   # baroclinic mode
    if isinstance(solvers, tuple):
        # Per-mode transforms (the GSPMD-partitionable form: XLA's CPU FFT
        # thunk rejects the batched form's layout under sharding).
        poisson, helmholtz = solvers
        pt0, pt1_ = poisson(zt1), helmholtz(zt2)
    else:
        pt = solvers(jnp.stack([zt1, zt2]))  # one batched rfft2/irfft2 pair
        pt0, pt1_ = pt[0], pt[1]
    (p11, p12), (p21, p22) = cfg.back_projection_matrix()
    return jnp.stack([p11 * pt0 + p12 * pt1_, p21 * pt0 + p22 * pt1_])


# Hardware gate for the Pallas FFT in fft_impl="auto" (VERDICT.md round-1
# process fix): this may only be True in a commit whose scripts/tpu_smoke.py
# JSON (results/tpu_smoke_*.json) shows the Pallas FFT path compiling AND
# matching the XLA oracle on the real chip at the headline 2048^2 size.
# fft_impl="pallas" stays available as an explicit opt-in either way.
# Gate evidence: results/tpu_smoke_83c541e.json — fused-symbol Pallas FFT
# compiles at 2048^2 (64 MB scoped-VMEM limit), matches the no-Pallas oracle
# to 3.2e-5 after 10 steps, and bench.py measured 2.236e9 gridpoint-steps/s
# (1.875 ms/step) vs 1.857e9 for the matmul tier on one v5e chip.
_PALLAS_FFT_IN_AUTO = True

# Hardware gate for the bf16x3 MXU stage inside the Pallas DFT kernels
# (fft_mxu="auto"): may only be True in a commit whose scripts/tpu_smoke.py
# JSON shows the bf16x3 variant compiling AND matching the no-Pallas oracle
# on the real chip at 2048^2. fft_mxu="bf16x3" stays an explicit opt-in
# either way.
# Gate evidence: results/tpu_smoke_6e70b50.json — pairx-bf16x3 matches the
# no-Pallas oracle to 1.8e-6 after 10 steps at 2048^2 (vs 3.1e-7 for the
# highest-precision pairx run: the bf16x3 stage costs ~1.5e-6 relative);
# results/accuracy_2048_10000_pairx.json shows energy/enstrophy drift within
# the xla-backend f32 noise band over 10k steps; bench.py 50-step protocol
# measured 2.57-2.67e9 gridpoint-steps/s vs 2.24e9 for the highest-precision
# unfused default (results/bench_headline_r3.json).
_BF16X3_IN_AUTO = True


# Size class above which fft_mxu="auto" resolves to HIGHEST instead of
# bf16x3. Round-4 float64 adjudication (ADVICE round-3 isolation;
# results/step_f64_check_{2048,4096,8192}.json — 10-step max rel zeta
# error vs the CPU float64 oracle, same IC):
#
#   grid    plain-f32   pallas-HIGHEST  pallas-bf16x3
#   2048^2  2.51e-7     2.54e-7         1.80e-6   (7x plain)
#   4096^2  4.07e-7     3.45e-7         6.20e-6   (15x)
#   8192^2  1.35e-6     9.53e-7         1.78e-5   (13x)
#
# The kernel ALGORITHM at highest precision beats or equals the f32 FFT
# oracle at every size; the bf16x3 MXU stage alone is the degradation,
# amplified through the low-k 1/lambda symbol as the grid grows. bf16x3
# stays the auto default only where 10k-step conserved-quantity drift
# evidence shows the 10-step error to be dynamically inert:
#   2048^2: energy 2.6e-7 / enstrophy 1.9e-6 vs the XLA backend — inside
#           the f32 noise band (results/accuracy_2048_10000_r4.json).
#   4096^2: energy 4.5e-7 / enstrophy 2.8e-6 — same band
#           (results/accuracy_4096_10000_r4.json).
# Above 4096^2 the auto route runs HIGHEST (which still BEATS the plain
# f32 oracle vs f64); fft_mxu="bf16x3" stays an explicit opt-in anywhere.
# Round-5 re-grounding (VERDICT r4 item 4): the 8192^2 10k-step drift
# ladder now EXISTS (results/accuracy_8192_10000.json, pallas-hi as the
# on-chip reference — the jnp.fft leg that crashed the TPU worker in r4
# is not needed): bf16x3's energy diff stays in the noise band (~5e-7)
# but its enstrophy diff GROWS unsaturated through 10k steps
# (1.5e-6 -> 3.3e-5), unlike <= 4096^2 where it stays flat in-band —
# so the boundary stays at 4096^2 on drift-level evidence, no longer on
# 10-step evidence alone (the ~21% throughput at 8192^2 remains opt-in).
_BF16X3_MAX_POINTS = 4096 * 4096


def _resolve_fft_mxu(cfg: ModelConfig) -> str:
    """Resolve fft_mxu="auto" for the Pallas DFT kernels (see
    config.ModelConfig.fft_mxu, _BF16X3_IN_AUTO, and _BF16X3_MAX_POINTS).
    The bf16x3 default applies only on the TPU backend it was
    hardware-gated on and only at size classes where the float64
    adjudication admits it; CPU interpret runs (tests, oracles) stay at
    full f32 emulation so they remain high-precision references."""
    if cfg.fft_mxu != "auto":
        return cfg.fft_mxu
    if jax.default_backend() != "tpu":
        return "highest"
    if cfg.M * cfg.P > _BF16X3_MAX_POINTS:
        return "highest"
    return "bf16x3" if _BF16X3_IN_AUTO else "highest"


# Hardware gate for the mirror-pair fused x-kernel (fft_pairx="auto"): may
# only be True in a commit whose scripts/tpu_smoke.py JSON shows the pairx
# variant compiling AND matching the no-Pallas oracle on the real chip at
# 2048^2. fft_pairx="on" stays an explicit opt-in either way.
# Gate evidence: results/tpu_smoke_6e70b50.json — pairx compiles at 2048^2
# and matches the no-Pallas oracle to 3.1e-7 after 10 steps (BETTER than the
# unfused 4-pass inversion's 3.2e-5: the spectrum W never round-trips HBM);
# bench.py 50-step protocol: pairx-bf16x3 2.57-2.67e9 gridpoint-steps/s over
# three runs vs 2.24e9 for the unfused default and 2.43-2.50e9 for the
# chain-pairx-bf16x3 variant (results/bench_headline_r3.json — the y-fused
# chain stays opt-in: it loses ~6% at the 50-step protocol despite one fewer
# HBM pass; its step kernel's in-VMEM y-DFTs cost more than the separate
# pipelined y-kernel passes they replace).
_PAIRX_IN_AUTO = True


def _resolve_pairx(cfg: ModelConfig) -> bool:
    """Resolve fft_pairx="auto" (see config.ModelConfig.fft_pairx and
    _PAIRX_IN_AUTO); the VMEM shape bound is applied downstream
    (pallas_fft.pair_x_fits)."""
    if cfg.fft_pairx != "auto":
        return cfg.fft_pairx == "on"
    return _PAIRX_IN_AUTO


# Hardware gate for the monolithic single-pass inversion kernel
# (fft_mono="auto"): may only be True in a commit whose scripts/tpu_smoke.py
# JSON shows the mono variant compiling AND matching the no-Pallas oracle on
# the real chip at 2048^2. fft_mono="on" stays an explicit opt-in either way.
# Round-3 decision: stays False ON EVIDENCE. tpu_smoke_14e85bc.json shows
# mono-bf16x3 ok (1.8e-6 vs oracle) and the 50-step bench protocol measures
# it TIED with pairx-bf16x3 within tunnel noise (2.49-2.63e9 vs 2.45-2.67e9
# gridpoint-steps/s — the step is compute-bound, not HBM-bound, at 2048^2,
# so collapsing 3 inversion passes to 1 buys throughput nothing). Mono wins
# decisively in the DISPATCH-bound regime (10-step chunks: 5.5 ms/step vs
# ~53 for the 3-pass path — 1 kernel launch instead of 3 per inversion), so
# it stays the recommended opt-in for interactive / small-chunk runs.
_MONO_IN_AUTO = False


# Hardware gate for routing DISPATCH-BOUND runs (small scan chunks — e.g.
# run.py with a short sample interval) to the monolithic inversion kernel
# under fft_mono="auto" (VERDICT round-3 item 7). May only be True in a
# commit whose evidence shows mono and the 3-pass path measured BACK TO BACK
# in one session at a small chunk size (round 3's 5.5-vs-53 ms claim
# compared two runs under a 6x host-load difference AND mono never actually
# engaged — ADVICE.md round 3).
# Gate evidence: results/decomp_r4_2048_c10.json — 10-step chunks at
# 2048^2 measured back-to-back in ONE session: full-mono 3.7235 ms/step vs
# full-pairx 3.9927 (7%; the win is the two saved kernel launches per
# step — the round-3 "10x" figure was a cross-session comparison under 6x
# host-load difference with mono silently disengaged, and does not stand).
# At the 50-step protocol pairx wins (decomp_r4_2048_c50.json), so the
# crossover sits between; mono also passes the same-rev oracle smoke
# (results/tpu_smoke_90aadbf.json, engaged.mono=true, 1.8e-6).
_MONO_SMALL_CHUNK_IN_AUTO = True
_MONO_CHUNK_CROSSOVER = 25   # scan-chunk steps below which mono wins


def resolve_mono_for_chunk(cfg: ModelConfig, chunk_steps: int) -> ModelConfig:
    """Chunk-size-aware fft_mono="auto" resolution for drivers that know
    their scan-chunk length (run.py): in the dispatch-bound regime (chunks
    below the measured crossover) the single-kernel-launch inversion wins
    by a wide margin on the remote-tunnel chip, so route to it when the
    shape admits it. No-op unless fft_mono is "auto" and the hardware gate
    (_MONO_SMALL_CHUNK_IN_AUTO) is flipped on evidence."""
    if (cfg.fft_mono != "auto" or not _MONO_SMALL_CHUNK_IN_AUTO
            or chunk_steps >= _MONO_CHUNK_CROSSOVER
            or jax.default_backend() != "tpu"):
        return cfg
    if _resolve_fft_impl(cfg) != "pallas":
        return cfg
    from ..ops.pallas_fft import mono_fits, symbol_inverse_fits
    # Both gates the inverter itself applies must pass, or the replaced
    # "on" would raise the forced-form ValueError instead of routing.
    if mono_fits(cfg.M, cfg.P) and symbol_inverse_fits(cfg.M, cfg.P):
        return cfg.replace(fft_mono="on")
    return cfg


def _resolve_mono(cfg: ModelConfig) -> bool:
    """Resolve fft_mono="auto" (see config.ModelConfig.fft_mono and
    _MONO_IN_AUTO); the VMEM shape bound is applied downstream
    (pallas_fft.mono_fits)."""
    if cfg.fft_mono != "auto":
        return cfg.fft_mono == "on"
    return _MONO_IN_AUTO


def _resolve_fft_impl(cfg: ModelConfig) -> str:
    """Resolve fft_impl="auto": on TPU float32, the Pallas fused factored DFT
    when hardware-gated in (see _PALLAS_FFT_IN_AUTO), the kernel's honest
    VMEM-footprint bound admits the shape, AND Pallas is enabled; else the
    matmul-factorized DFT when both extents factor MXU-friendly (largest
    divisor <= 128 at least 8); else XLA's FFT.

    ``use_pallas=False`` disables the Pallas FFT here too (round-1 lesson:
    the "fallback" must actually fall back — see VERDICT.md), leaving matmul
    (pure-XLA einsums) and xla as the non-Pallas tiers.
    """
    if cfg.fft_impl != "auto":
        return cfg.fft_impl
    if jax.default_backend() != "tpu" or cfg.dtype != "float32":
        return "xla"
    from ..ops.matmul_fft import split_factor
    if cfg.use_pallas and _PALLAS_FFT_IN_AUTO:
        from ..ops.pallas_fft import planar_fft2_fits
        # Hardware-validated regime, all shapes planar_fft2_fits admits
        # (BlockSpec x-kernels to N2 = 32 per extent, streaming x-kernels at
        # 8192). Evidence ladder:
        #   2048^2: tpu_smoke_6e70b50.json + bench_headline_r3.json.
        #   4096^2 (N2 = 32, recursive small stage):
        #     tpu_smoke_4ec881e_4096x4096.json (10-step vs oracle 6.1e-6),
        #     bench 2.96e9 gridpoint-steps/s vs 0.96e9 matmul (the round-2
        #     auto route silently 3x-underperformed here).
        #   8192^2 (N2 = 64, streaming x-kernel):
        #     tpu_smoke_65cd376_8192x8192.json (10-step vs oracle 1.8e-5;
        #     round 2's 3.0e-4 gate failure does not reproduce with the
        #     current kernels), results/inv_f64_check_8192.json (vs the
        #     float64 oracle the kernel algorithm errs 2.9e-4 — BETTER than
        #     the f32 jnp.fft path's 3.3e-4; the old pairwise-f32 metric
        #     measured low-k-amplified noise), and bench 2.63e9
        #     gridpoint-steps/s vs 0.83e9 matmul / 1.01e9 xla (r3_hw_log).
        if planar_fft2_fits(cfg.M, cfg.P):
            return "pallas"
    if split_factor(cfg.M)[0] >= 8 and split_factor(cfg.P)[0] >= 8:
        return "matmul"
    return "xla"


def _build_packed_inverter(cfg: ModelConfig):
    """PackedModalInverter for the single-complex-fft2 inversion (two-layer,
    zero-mean gauge only — the pin gauge needs the per-mode physical field).
    ``fft_impl="matmul"`` swaps in the MXU matmul-factorized DFT;
    ``fft_impl="pallas"`` the fused Pallas factored DFT."""
    from ..ops.spectral import (PackedModalInverter, PackedModalInverterMXU,
                                PackedModalInverterPallasFFT)
    impl = _resolve_fft_impl(cfg)
    if impl == "pallas":
        inv = PackedModalInverterPallasFFT(
            cfg.M, cfg.P, cfg.dx, cfg.S_eig, cfg.P_inv_matrix(),
            cfg.back_projection_matrix(), mxu=_resolve_fft_mxu(cfg),
            pair_x=_resolve_pairx(cfg), mono=_resolve_mono(cfg))
        # An explicitly pinned kernel form that cannot engage must FAIL, not
        # silently degrade to another path — a silent downgrade is how
        # round 3's "mono" hardware evidence ended up actually measuring the
        # pairx path (ADVICE.md round 3). "auto" stays free to fall back.
        if cfg.fft_mono == "on" and not inv._mono:
            raise ValueError(
                f"fft_mono='on' requested but the monolithic kernel cannot "
                f"engage at ({cfg.M}, {cfg.P}) (mono_fits/fuse rejected); "
                "use fft_mono='auto' to allow fallback")
        if cfg.fft_pairx == "on" and not (inv._pair or inv._pair_stream
                                           or inv._mono):
            raise ValueError(
                f"fft_pairx='on' requested but the mirror-pair kernel cannot "
                f"engage at ({cfg.M}, {cfg.P}) (pair_x_fits/fuse rejected); "
                "use fft_pairx='auto' to allow fallback")
        return inv
    cls = PackedModalInverterMXU if impl == "matmul" else PackedModalInverter
    return cls(cfg.M, cfg.P, cfg.dx, cfg.S_eig, cfg.P_inv_matrix(),
               cfg.back_projection_matrix())


def _build_solvers(cfg: ModelConfig, batched_fft: bool = True):
    from ..ops.spectral import BatchedModalSolver
    if (batched_fft and cfg.n_layers == 2
            and cfg.poisson_gauge == "zero_mean"):
        return _build_packed_inverter(cfg)
    if batched_fft:
        alphas = (0.0,) if cfg.n_layers == 1 else (0.0, cfg.S_eig)
        return BatchedModalSolver(cfg.M, cfg.P, cfg.dx, alphas,
                                  gauge=cfg.poisson_gauge)
    if cfg.n_layers == 1:
        return (HelmholtzSolver(cfg.M, cfg.P, cfg.dx, 0.0,
                                gauge=cfg.poisson_gauge),)
    return (
        HelmholtzSolver(cfg.M, cfg.P, cfg.dx, 0.0, gauge=cfg.poisson_gauge),
        HelmholtzSolver(cfg.M, cfg.P, cfg.dx, cfg.S_eig),
    )


def _use_pallas(cfg: ModelConfig) -> bool:
    """Fused kernels cover both time schemes (euler_ab3 and leapfrog_ra) and
    the wind-forcing term since round 2; shape/dtype support gates, plus a
    size floor: below ~256^2 the step is dispatch-latency dominated and the
    kernel machinery loses to plain XLA (measured on v5e: barotropic-128
    fused 0.0656 ms/step vs XLA 0.0572 — results/preset_rates.json)."""
    if not cfg.use_pallas or jax.default_backend() != "tpu":
        return False
    if cfg.M * cfg.P < 256 * 256:
        return False
    from ..ops.pallas_tendency import pallas_supported
    return pallas_supported(cfg, jnp.dtype(cfg.dtype))


# Hardware gate for the ONE-LAUNCH whole-step kernel (v6,
# ops/pallas_fullstep.py — tendency + update + the entire inversion in a
# single pallas_call; see config.ModelConfig.step_full). May only be True in
# a commit whose scripts/tpu_smoke.py JSON shows the fullstep variant
# compiling AND matching the no-Pallas oracle on the real chip at 2048^2,
# plus a same-protocol bench win. cfg.step_full="on" stays an explicit
# opt-in either way.
# Gate evidence: none yet — stays False until this round's smoke + bench
# land from the real chip.
_FULLSTEP_IN_AUTO = False


def _resolve_fullstep(cfg: ModelConfig) -> bool:
    """Resolve step_full (see config.ModelConfig.step_full and
    _FULLSTEP_IN_AUTO); the VMEM shape bound is applied by the caller via
    pallas_fullstep.fullstep_supported."""
    if cfg.step_full != "auto":
        return cfg.step_full == "on"
    return _FULLSTEP_IN_AUTO


# Hardware gate for the y-fused three-kernel step chain in QGModel.run
# (tendency+y-transforms, forward-x, symbol+inverse-x — the step's psi rides
# in permuted y-spectral form between steps). May only be True in a commit
# whose scripts/tpu_smoke.py JSON shows the chain compiling AND matching the
# no-Pallas oracle on the real chip at 2048^2. cfg.step_chain="on" stays an
# explicit opt-in either way.
# Round-3 decision: stays False ON EVIDENCE, not for lack of it.
# results/tpu_smoke_6e70b50.json shows chain-pairx-bf16x3 compiling and
# matching the oracle (1.6e-6 after 10 steps), but the 50-step bench
# protocol measured it at 2.43-2.50e9 gridpoint-steps/s vs 2.57-2.67e9 for
# pairx-bf16x3 WITHOUT the chain (results/bench_headline_r3.json): folding
# the y-transforms into the step kernel saves one HBM pass but its
# serialized in-VMEM y-DFT matmuls cost more than the separate, pipelined
# y-kernel passes they replace. The chain remains the right form for the
# SHARDED step (parallel/stepper.py), where it minimizes per-chip passes
# between halo exchanges.
_YFUSED_IN_AUTO = False


def _chain_next_state(cfg: ModelConfig, state: State, zeta_new, psi_new,
                      carry) -> State:
    if cfg.time_scheme == "leapfrog_ra":
        return State(zeta_new, psi_new, carry, state.f2, state.step + 1)
    return State(zeta_new, psi_new, carry, state.f1, state.step + 1)


def make_chain_fns(cfg: ModelConfig, interpret: bool = False):
    """The y-fused step chain: (to_internal, step, to_external), or None.

    Internally ``State.psi`` holds the PACKED PERMUTED y-SPECTRUM of psi (the
    symbol+inverse-x kernel's output — the inversion minus its final
    inverse-y): the step kernel inverse-y's it in-VMEM before the stencils
    and forward-y's the updated zeta in-VMEM, so one model step is exactly
    THREE kernel HBM passes. ``to_internal``/``to_external`` convert a
    natural-psi State at scan boundaries (one y-kernel pass each; external
    semantics — checkpoints, diagnostics, samples — always see natural psi).
    """
    if cfg.n_layers != 2 or cfg.poisson_gauge != "zero_mean":
        return None
    # The one-launch whole-step kernel takes precedence over the chain —
    # if it engages, the step is already a single pallas_call.
    from ..ops.pallas_fullstep import fullstep_supported
    if _resolve_fullstep(cfg) and fullstep_supported(cfg, jnp.dtype(cfg.dtype)):
        return None
    from ..ops.pallas_tendency import fused_step_streamed_yspec, yfused_supported
    if not yfused_supported(cfg, jnp.dtype(cfg.dtype)):
        return None
    mxu = _resolve_fft_mxu(cfg)
    if interpret:
        # Test hook: build the chain off-TPU (all kernels in interpret mode).
        from ..ops.spectral import PackedModalInverterPallasFFT
        inverter = PackedModalInverterPallasFFT(
            cfg.M, cfg.P, cfg.dx, cfg.S_eig, cfg.P_inv_matrix(),
            cfg.back_projection_matrix(), interpret=True, mxu=mxu,
            pair_x=_resolve_pairx(cfg))
    else:
        if not _use_pallas(cfg) or _resolve_fft_impl(cfg) != "pallas":
            return None
        inverter = _build_packed_inverter(cfg)
    if not getattr(inverter, "_fuse", False):
        return None
    pfft = inverter._pfft
    consts = inverter._sym_consts
    pair = getattr(inverter, "_pair", False)

    def to_internal(state: State) -> State:
        return state._replace(psi=pfft._call_y(state.psi, False))

    def to_external(state: State) -> State:
        return state._replace(psi=pfft._call_y(state.psi, True))

    def step(state: State) -> State:
        zeta_new, carry, zeta_ys = fused_step_streamed_yspec(
            cfg, state.zeta, state.psi, state.f1, state.f2, state.step, mxu,
            interpret)
        if pair:
            # Two kernel HBM passes per step: the v5 step kernel + the
            # mirror-pair fused forward-x/symbols/inverse-x kernel.
            psi_ys = pfft.pair_x_symbols(zeta_ys, consts)
        else:
            W = pfft._call_x(zeta_ys, False)
            psi_ys = pfft._call_x_symbols(W, consts)
        return _chain_next_state(cfg, state, zeta_new, psi_ys, carry)

    return to_internal, step, to_external


def _resolve_step_chain(cfg: ModelConfig) -> bool:
    if cfg.step_chain != "auto":
        return cfg.step_chain == "on"
    return _YFUSED_IN_AUTO


def make_step_fn(cfg: ModelConfig, batched_fft: bool = True):
    """Build the single-step transition function ``state -> state``.

    One step = evolve zeta (Euler for the first two steps, AB3 after —
    reference: src/model.jl:155-170) then invert for psi (reference:
    src/model.jl:172-199, called at src/run_model.jl:83-84).

    ``batched_fft=False`` uses per-mode transforms — required under GSPMD
    sharding on the CPU backend.
    """
    solvers = _build_solvers(cfg, batched_fft)
    dt = cfg.dt

    # Carry convention per scheme (shared by the fused-kernel and XLA paths):
    #   euler_ab3:  f1 <- tendency of this step, f2 <- previous f1.
    #   leapfrog_ra: f1 <- Robert-Asselin-filtered zeta of this level
    #                (zeta_bar^n), f2 unused and carried through unchanged.
    def _next_state(state: State, zeta_new, psi_new, carry) -> State:
        if cfg.time_scheme == "leapfrog_ra":
            return State(zeta_new, psi_new, carry, state.f2, state.step + 1)
        return State(zeta_new, psi_new, carry, state.f1, state.step + 1)

    if _use_pallas(cfg) and batched_fft:
        from ..ops.spectral import PackedModalInverter

        if (isinstance(solvers, PackedModalInverter)
                and _resolve_fft_impl(cfg) == "pallas"):
            # v6 one-launch whole step (tendency + update + the entire
            # inversion in a single pallas_call) when resolved on and the
            # VMEM bound admits the shape.
            from ..ops.pallas_fullstep import (fullstep_supported,
                                               fused_step_full)
            full_ok = fullstep_supported(cfg, jnp.dtype(cfg.dtype))
            if cfg.step_full == "on" and not full_ok:
                raise ValueError(
                    f"step_full='on' requested but the one-launch kernel "
                    f"cannot engage at ({cfg.M}, {cfg.P}) "
                    "(fullstep_supported rejected); use step_full='auto' "
                    "to allow fallback")
            if _resolve_fullstep(cfg) and full_ok:
                mxu = _resolve_fft_mxu(cfg)

                def step(state: State) -> State:
                    zeta_new, carry, psi_new = fused_step_full(
                        cfg, state.zeta, state.psi, state.f1, state.f2,
                        state.step, mxu)
                    return _next_state(state, zeta_new, psi_new, carry)

                return step

        if isinstance(solvers, PackedModalInverter):
            # v4 streamed kernel (tendency + time update for either scheme,
            # shared-rotation stencils, double-buffered HBM input pipeline;
            # falls back to v3 on single-tile grids) + the packed single-fft2
            # inversion. The kernel has no modal output — projection and
            # back-projection ride in the spectral symbols.
            from ..ops.pallas_tendency import fused_step_streamed

            def step(state: State) -> State:
                zeta_new, carry = fused_step_streamed(
                    cfg, state.zeta, state.psi, state.f1, state.f2,
                    state.step)
                psi_new = solvers(zeta_new)
                return _next_state(state, zeta_new, psi_new, carry)

            return step

        # v2 fused path (single layer, or pin gauge): tendency + update +
        # modal projection in one kernel, then batched solve + back-projection.
        from ..ops.pallas_tendency import fused_pre_inversion

        def step(state: State) -> State:
            zeta_new, carry, modes = fused_pre_inversion(
                cfg, state.zeta, state.psi, state.f1, state.f2, state.step)
            pt = solvers(modes)
            if cfg.n_layers == 1:
                psi_new = pt
            else:
                (p11, p12), (p21, p22) = cfg.back_projection_matrix()
                psi_new = jnp.stack([p11 * pt[0] + p12 * pt[1],
                                     p21 * pt[0] + p22 * pt[1]])
            return _next_state(state, zeta_new, psi_new, carry)

        return step

    if cfg.time_scheme == "leapfrog_ra":
        # Leapfrog with Robert-Asselin filter (extension beyond the reference,
        # for the BASELINE leapfrog configs). State.f1 holds the *filtered*
        # zeta of the previous level (zeta_bar^{n-1}); f2 is unused. Step 0 is
        # forward Euler with zeta_bar^{-1} := zeta^0.
        ra = cfg.ra_filter

        def step(state: State) -> State:
            tend = _tendencies(cfg, state.zeta, state.psi)
            zeta_prev_f = jnp.where(state.step == 0, state.zeta, state.f1)
            leap = zeta_prev_f + (2.0 * dt) * tend
            euler = state.zeta + dt * tend
            zeta_new = jnp.where(state.step == 0, euler, leap)
            # Robert-Asselin filter of the *current* level for the next step.
            zeta_filt = state.zeta + ra * (zeta_prev_f - 2.0 * state.zeta
                                           + zeta_new)
            psi_new = _invert_psi(cfg, solvers, zeta_new)
            return _next_state(state, zeta_new, psi_new, zeta_filt)

        return step

    def step(state: State) -> State:
        tend = _tendencies(cfg, state.zeta, state.psi)
        ab3 = dt * ((23.0 / 12.0) * tend
                    - (16.0 / 12.0) * state.f1
                    + (5.0 / 12.0) * state.f2)
        euler = dt * tend
        # Steps 0 and 1 (the reference's timestep 1 and 2) use Euler
        # (reference: src/model.jl:161-164).
        update = jnp.where(state.step < 2, euler, ab3)
        zeta_new = state.zeta + update
        psi_new = _invert_psi(cfg, solvers, zeta_new)
        return State(zeta_new, psi_new, tend, state.f1, state.step + 1)

    return step


def init_state(cfg: ModelConfig, key: Optional[Array] = None,
               psi_init: Optional[Array] = None) -> State:
    """Initial condition: random streamfunction kick, zeta from its definition.

    Reference: ``initialise_model`` (src/model.jl:36-62) — psi_i = initial_kick
    * U * Ly * uniform[0,1), then zeta from the layer-coupled definition
    (src/model.jl:47-48). The reference's RNG is unseeded Julia rand; for
    reproducibility (and for the allclose check against serialized reference
    trajectories) an explicit ``psi_init`` of shape (L, M, P) can be injected.
    """
    if cfg.n_layers == 2:
        cfg.validate()
    dtype = jnp.dtype(cfg.dtype)
    L = cfg.n_layers
    shape = (L, cfg.M, cfg.P)

    if psi_init is not None:
        psi = jnp.asarray(psi_init, dtype).reshape(shape)
    elif cfg.ic_type == "vortex":
        # Gaussian vortex dipole (BASELINE config 1's barotropic vortex):
        # two opposite-signed Gaussian streamfunction bumps, periodic-friendly.
        x = (np.arange(cfg.M) + 0.5) * cfg.dx
        y = (np.arange(cfg.P) + 0.5) * cfg.dx
        X, Y = np.meshgrid(x, y, indexing="ij")
        sigma = 0.08 * min(cfg.Lx, cfg.Ly)
        amp = cfg.initial_kick * (abs(cfg.U) or 1.0) * cfg.Ly

        def bump(cx, cy, s):
            return s * np.exp(-(((X - cx) ** 2 + (Y - cy) ** 2)
                                / (2.0 * sigma ** 2)))

        field = (bump(0.35 * cfg.Lx, 0.5 * cfg.Ly, amp)
                 + bump(0.65 * cfg.Lx, 0.5 * cfg.Ly, -amp))
        psi = jnp.broadcast_to(jnp.asarray(field, dtype), shape)
    else:
        if key is None:
            key = jax.random.PRNGKey(cfg.seed)
        amp = cfg.initial_kick * (cfg.U if cfg.U != 0.0 else 1.0) * cfg.Ly
        psi = amp * jax.random.uniform(key, shape, dtype=dtype)

    return _init_finish(cfg, psi)


@functools.partial(jax.jit, static_argnums=(0,))
def _init_finish(cfg: ModelConfig, psi: Array) -> State:
    """zeta-from-psi plus history zeros in ONE compiled program (eager
    op-by-op execution costs one remote compile per op on tunneled TPU
    backends)."""
    dtype = psi.dtype
    if cfg.n_layers == 1:
        zeta = laplace_5p(psi, cfg.dx)
    else:
        lap = laplace_5p(psi, cfg.dx)
        z1 = lap[0] + cfg.S1_plus * (psi[1] - psi[0])
        z2 = lap[1] + cfg.S2_minus * (psi[0] - psi[1])
        zeta = jnp.stack([z1, z2])
    zero = jnp.zeros(psi.shape, dtype)
    return State(zeta, psi, zero, zero, jnp.asarray(0, jnp.int32))


@functools.partial(jax.jit, static_argnums=(0, 2))
def _run_scan(step_fn, state: State, n_steps: int) -> State:
    def body(s, _):
        return step_fn(s), None
    out, _ = jax.lax.scan(body, state, None, length=n_steps)
    return out


@functools.partial(jax.jit, static_argnums=(0, 1, 2, 4))
def _run_chain(ti, st, te, state: State, n_steps: int) -> State:
    """n_steps of the y-fused chain under one jit: convert psi to its
    internal y-spectral form, scan, convert back."""
    def body(s, _):
        return st(s), None
    out, _ = jax.lax.scan(body, ti(state), None, length=n_steps)
    return te(out)


@functools.partial(jax.jit, static_argnums=(0, 1, 2, 4, 5))
def _run_chain_trajectory(ti, st, te, state: State, n_chunks: int,
                          sample_every: int):
    def outer(s, _):
        def body(x, _):
            return st(x), None
        s2, _ = jax.lax.scan(body, s, None, length=sample_every)
        ext = te(s2)
        return s2, (ext.zeta, ext.psi)

    final, (zs, ps) = jax.lax.scan(outer, ti(state), None, length=n_chunks)
    return te(final), zs, ps


class QGModel:
    """Convenience wrapper bundling config, jitted step, and multi-step runs.

    The counterpart of the reference's driver-facing surface
    (BaroclinicModel + initialise_model + evolve_zeta!/evolve_psi!).
    """

    def __init__(self, cfg: ModelConfig):
        self.cfg = cfg
        self._step_fn = make_step_fn(cfg)
        self.step = jax.jit(self._step_fn)
        # Multi-step runs use the y-fused three-kernel chain when resolved on
        # and supported (single external steps stay on the plain step fn).
        self._chain = make_chain_fns(cfg) if _resolve_step_chain(cfg) else None

    def init_state(self, key: Optional[Array] = None,
                   psi_init: Optional[Array] = None) -> State:
        return init_state(self.cfg, key=key, psi_init=psi_init)

    def run(self, state: State, n_steps: int) -> State:
        """Advance ``n_steps`` steps under one compiled ``lax.scan``."""
        if self._chain is not None:
            ti, st, te = self._chain
            return _run_chain(ti, st, te, state, n_steps)
        return _run_scan(self._step_fn, state, n_steps)

    def run_trajectory(self, state: State, n_steps: int, sample_every: int
                       ) -> Tuple[State, Array, Array]:
        """Advance n_steps, returning (final_state, zeta_samples, psi_samples)
        sampled every ``sample_every`` steps (scan-of-scans: the inner scan is
        one sampling interval)."""
        assert n_steps % sample_every == 0
        n_chunks = n_steps // sample_every
        if self._chain is not None:
            ti, st, te = self._chain
            return _run_chain_trajectory(ti, st, te, state, n_chunks,
                                         sample_every)

        def outer(s, _):
            s = _run_scan(self._step_fn, s, sample_every)
            return s, (s.zeta, s.psi)

        final, (zs, ps) = jax.lax.scan(outer, state, None, length=n_chunks)
        return final, zs, ps
