"""Analytic multi-chip scaling projection for the fused sharded step
(VERDICT round-3 item 5): count the per-step communication against v5e ICI
bandwidth, combine with measured per-chip compute from the real chip, and
project efficiency at 2/4/8/16 chips. Hardware beyond one chip is not
reachable in this environment — this model, with its assumptions stated, is
the honest substitute.

Model
-----
Mesh (nx, 1), rows sharded. Per step, per chip:

  compute  C(nx) = measured single-chip step time x (local points / total
           points). Strong scaling: C = T_1chip/nx. Weak scaling: C =
           T_tile (constant).
  comm     2 all_to_alls over the x-ring (the round-4 merged form):
             out:  stacked y-spectrum + mirror companion, 4 planes of
                   (M_global x P / nx) float32
             back: V, 2 planes
           -> D = 6 * (M_global * P / nx) * 4 bytes per chip per step.
           Ring all_to_all, bidirectional links: total byte-hops =
           D_total * nx/4 averaged; per-directed-link bytes = D * nx / 8
           (exact for nx >= 4), so T_a2a = D * nx / (8 * W_link).
           Plus 4 ppermute halo slabs (L=2, H=8 rows, P lanes) -> ~2 MB,
           negligible (<0.01 ms), included anyway.

  ICI      v5e: 4 ICI ports; a 1-D ring embedded in the 2D torus uses one
           link per direction per neighbor. W_link = 4.5e10 B/s one-way
           (the public per-link figure used by the scaling-book-style
           analyses for v5e). Sustained fraction 0.8 applied.

Efficiency bounds: no-overlap (compute + comm serialized) and full-overlap
(max(compute, comm); the chunked-transpose pipeline enabling it exists as
``DistributedPackedInverter(overlap_groups=G)`` — XLA's latency-hiding
scheduler may run chunk g+1's collective behind chunk g's kernel — but the
realized fraction cannot be measured on one chip).

Also projected: the "paired-strip" variant that ships NO mirror companion
(a local strip pre-permutation makes each chip receive mirror PAIRS, so the
kernel pairs strips locally as the single-chip pair-x kernel does):
D drops from 6 to 4 planes — implemented in round 4 as the roadmap's next
comm lever (see RESULTS.md).

Usage: python scripts/weak_scaling_projection.py [--emit-md]
"""

import argparse
import json
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

W_LINK = 4.5e10          # v5e one-way ICI bandwidth per link, B/s
SUSTAIN = 0.8            # sustained fraction of peak link bandwidth
HALO_BYTES = 4 * 2 * 8 * 8192 * 4   # 4 ppermute slabs (L=2, H=8, P) f32


def a2a_time(d_bytes: float, nx: int) -> float:
    """Ring all_to_all of d_bytes per chip over nx chips (bidirectional
    links): per-directed-link load = D * nx / 8 (exact for nx >= 4;
    nx = 2 degenerates to D / 2). PESSIMISTIC bound: assumes the logical
    x-ring maps to a physical 1-D path."""
    per_link = d_bytes / 2 if nx == 2 else d_bytes * nx / 8
    return per_link / (W_LINK * SUSTAIN)


def a2a_time_torus(d_bytes: float, nx: int) -> float:
    """OPTIMISTIC bound: XLA routes the all_to_all over the physical 2-D
    sub-torus (near-square a x b = nx, no wraparound on sub-slices).
    T = max(injection through the chip's 4 ICI ports, bisection: half the
    total data crosses min(a, b) links per direction)."""
    import math
    a = int(math.floor(math.sqrt(nx)))
    while nx % a:
        a -= 1
    b = nx // a
    inject = d_bytes * (nx - 1) / nx / (4 * W_LINK * SUSTAIN)
    cross = (nx * d_bytes / 4) / (min(a, b) * W_LINK * SUSTAIN)
    return max(inject, cross)


def halo_time(P: int) -> float:
    return (4 * 2 * 8 * P * 4) / (W_LINK * SUSTAIN)


def project(step_1chip_ms: float, M: int, P: int, mode: str, planes: int):
    rows = []
    for nx in (2, 4, 8, 16):
        if mode == "strong":
            comp = step_1chip_ms / nx
            mg = M
        else:                       # weak: per-chip tile (M, P) constant
            comp = step_1chip_ms
            mg = M * nx
        d = planes * (mg * P / nx) * 4
        ring = (a2a_time(d, nx) + halo_time(P)) * 1e3
        torus = (a2a_time_torus(d, nx) + halo_time(P)) * 1e3
        rows.append((nx, comp, ring, comp / (comp + ring),
                     torus, comp / (comp + torus),
                     comp / max(comp, torus)))
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--emit-md", action="store_true")
    args = ap.parse_args()

    # Measured single-chip inputs (amortized-protocol, round 4):
    #   2048^2 fused step ~0.99 ms (decomp_r4_2048_c500.json full-pairx);
    #   8192^2 fused (1,1)-mesh step 25.97 ms raw at 20-step chunks ->
    #   ~24.7 ms after removing the measured ~25 ms fixed per-chunk
    #   overhead (results/scaling_1chip_fused_8192.csv + the addone floor
    #   probe).
    meas = {"t2048": 0.99, "t8192": 24.7}
    p = os.path.join(REPO, "results", "decomp_r4_2048_c500.json")
    if os.path.exists(p):
        jobs = json.load(open(p))["jobs"]
        if "full-pairx" in jobs and "ms_per_iter" in jobs["full-pairx"]:
            meas["t2048"] = jobs["full-pairx"]["ms_per_iter"]

    out = []

    def emit(line=""):
        out.append(line)
        print(line)

    emit("### Multi-chip scaling projection (analytic; v5e ICI model)")
    emit()
    emit(f"Assumptions: ring all_to_all over (nx, 1) mesh; v5e ICI "
         f"{W_LINK/1e9:.0f} GB/s per link one-way x {SUSTAIN:.0%} "
         "sustained; per-directed-link load D*nx/8; measured single-chip "
         f"step times {meas['t2048']:.2f} ms (2048^2), "
         f"{meas['t8192']:.1f} ms (8192^2, fused (1,1) mesh, fixed "
         "per-chunk overhead removed). 'no-ov' = communication on the "
         "critical path); 'full-ov' = perfect comm/compute overlap (upper "
         "bound; the chunked-transpose pipeline that enables it is "
         "implemented — DistributedPackedInverter(overlap_groups=G), "
         "pointwise-identical to the blocking form per the virtual-mesh "
         "tests — but its REALIZED overlap fraction is unmeasurable "
         "without multi-chip hardware). 6 planes = merged-companion "
         "scheme; 4 "
         "planes = paired-strip scheme (no companion shipped; "
         "parallel/paired.py, auto-preferred where supported).")
    emit()
    for title, t1, M, P, mode in (
        ("Strong scaling, global 8192^2 (BASELINE config 5)",
         meas["t8192"], 8192, 8192, "strong"),
        ("Weak scaling, 2048^2 per chip (headline tile)",
         meas["t2048"], 2048, 2048, "weak"),
        ("Weak scaling, 8192^2 per chip",
         meas["t8192"], 8192, 8192, "weak"),
    ):
        emit(f"**{title}**")
        emit()
        emit("| chips | compute ms | ring comm ms | eff (ring) | torus "
             "comm ms | eff (torus) | eff (torus, overlap) | eff (torus, "
             "4pl) |")
        emit("|---|---|---|---|---|---|---|---|")
        r6 = project(t1, M, P, mode, 6)
        r4 = project(t1, M, P, mode, 4)
        for (nx, comp, ring6, er6, tor6, et6, eo6), \
                (_, _, _, _, tor4, et4, _) in zip(r6, r4):
            emit(f"| {nx} | {comp:.2f} | {ring6:.2f} | {er6:.0%} | "
                 f"{tor6:.2f} | {et6:.0%} | {eo6:.0%} | {et4:.0%} |")
        emit()

    # ------------------------------------------------------------------
    # Round 5: the communication-avoiding MULTIGRID route (measured).
    mgk = os.path.join(REPO, "results", "decomp_r5_mgk_2048_c500.json")
    mg8 = os.path.join(REPO, "results", "decomp_r5_mgk_8192.json")
    if os.path.exists(mgk):
        jobs = json.load(open(mgk))["jobs"]
        mg1 = jobs["mg@1"]["ms_per_iter"]
        mg2 = jobs["mg@2"]["ms_per_iter"]
        cyc2048 = mg2 - mg1              # marginal V-cycle cost at 2048^2
        base2048 = mg1 - cyc2048         # projection + fixed overhead
        kern2048 = 0.4928                # v4 kernel, decomp_r4_2048_c500
        if os.path.exists(mg8) and "ms_per_iter" in json.load(
                open(mg8))["jobs"].get("mg@1", {}):
            j8 = json.load(open(mg8))["jobs"]
            # chunk-60 protocol: subtract the fixed per-chunk tunnel
            # overhead (addone at 8192^2 chunk 60 = 2.07 ms/iter vs the
            # ~0.65 ms HBM floor -> ~1.4 ms of artifact per iter).
            art = 1.4
            cyc8192 = j8["mg@2"]["ms_per_iter"] - j8["mg@1"]["ms_per_iter"]
            base8192 = j8["mg@1"]["ms_per_iter"] - cyc8192 - art
            mg8192_src = "measured (decomp_r5_mgk_8192.json, c60 protocol)"
        else:
            cyc8192, base8192 = 16.0 * cyc2048, 16.0 * base2048
            mg8192_src = "scaled 16x from 2048^2 (area ratio)"
        kern8192 = 7.9                   # 16 x v4 kernel (area-scaled)

        def mg_comm_ms(P_, n_levels, cycles, nx):
            # (nu1 + nu2 + 2) 1-row halo exchanges per level per cycle
            # (K = 2 modes batched), + the 64^2 coarse all_gather.
            if nx == 1:
                return 0.0
            per_ex = 2 * 2 * 2 * P_ * 4          # K * dirs * rows * P * f32
            lat = 2e-6
            ex = 6 * n_levels * cycles
            gather = 2 * 64 * 64 * 4 * cycles
            return (ex * (per_ex / (W_LINK * SUSTAIN) + lat)
                    + gather / (W_LINK * SUSTAIN)) * 1e3

        emit("**Multigrid route (round 5) — measured single-chip V-cycle "
             "costs, O(halo) comm**")
        emit()
        emit(f"Measured at 2048^2 (decomp_r5_mgk_2048_c500.json, c500 "
             f"protocol, Pallas fused smoother): marginal V-cycle "
             f"{cyc2048:.2f} ms, inversion overhead {base2048:.2f} ms; "
             f"8192^2 cycle {cyc8192:.1f} ms ({mg8192_src}). Step = v4 "
             "kernel + overhead + C cycles + halo comm; weak-scaling "
             "efficiency vs the best SINGLE-chip step (spectral).")
        emit()
        emit("| tile/chip | C (cycles/step) | step ms (8 chips) | "
             "eff vs 1-chip spectral | spectral-route eff (8 chips) |")
        emit("|---|---|---|---|---|")
        for tile, kern, cyc, base, t1, levels in (
                ("2048^2", kern2048, cyc2048, base2048, meas["t2048"], 5),
                ("8192^2", kern8192, cyc8192, base8192, meas["t8192"], 7)):
            for C in (1, 2, 4):
                comm = mg_comm_ms(int(tile[:4]), levels, C, 8)
                step = kern + base + C * cyc + comm
                eff = t1 / step
                spec_eff = {"2048^2": 0.38, "8192^2": 0.45}[tile]
                emit(f"| {tile} | {C} | {step:.2f} | {eff:.0%} | "
                     f"{spec_eff:.0%} |")
        emit()
        emit("The MG route's comm term is < 1 ms at any chip count (it "
             "does not grow with the mesh: halos + a 64^2 gather), so "
             "these efficiencies are FLAT from 8 chips up, while the "
             "spectral route keeps degrading (ring all_to_all: 17-22% at "
             "16 chips) — the structural property BASELINE.json asks "
             "for. The cycle itself went 13.8 -> 0.69 ms at 2048^2 and "
             "42.4 -> 10.2 ms at 8192^2 over round 5 (factored-selection "
             "restriction, then the Pallas fused smoother, then "
             "IN-KERNEL restriction and prolongation: the pre-smooth + "
             "residual + restriction and the coarse-correction + "
             "post-smooth are each ONE streamed HBM pass; the full-res "
             "residual and prolonged correction never touch HBM). As "
             "measured, at the BASELINE-config-5 tile (8192^2/chip) the "
             "MG route reaches ~92% at C=1, ~67% at C=2, ~43% at C=4 vs "
             "the spectral route's 36-45% — the >= 80% north star is "
             "reached at C=1 and within one lever of C=2. Fidelity sets "
             "the cycle count (results/mg_accuracy_256_5000.json, 5000 "
             "steps f32, SATURATING bias vs the spectral trajectory): "
             "C=4 sits in the f32 noise band (energy 2.8e-7) and is the "
             "default; C=2 trades a bounded ~2e-4 energy bias, C=1 "
             "~2e-3. The psi-extrapolation warm start (seed 2 psi_n - "
             "psi_{n-1}; psi_{n-1} rides the scan carry — "
             "parallel/stepper.make_halo_run_fn, mg_extrapolate config, "
             "State and checkpoints unchanged) was then BUILT and "
             "measured: 5000-step energy bias drops 1.8e-4 -> 2.1e-6 at "
             "C=2 (f32 noise band; results/mg_accuracy_256_5000_extrap"
             ".json) and 2.1e-3 -> 3.0e-5 at C=1, at zero extra cost — "
             "the pod-8192-mg preset runs C=2: 67% at 8+ chips AT BAND "
             "FIDELITY, with C=1 (94%) a ~3e-5-bias opt-in.")
        emit()

    emit("Reading: the transposed-FFT inversion must move the whole field "
         "across the mesh twice per step (plus the mirror companion), so "
         "per-chip all_to_all volume is CONSTANT under weak scaling while "
         "link capacity per chip is fixed — the global elliptic solve, "
         "not the stencils (halo cost < 0.1 ms), owns the scaling "
         "budget. Projected efficiency at 8 chips: 26-36% as implemented, "
         "45% with the paired-strip scheme (4 planes instead of 6: a "
         "local strip pre-permutation lets each chip receive mirror "
         "PAIRS, so no companion ships — implemented, parallel/paired.py, "
         "auto-preferred where its BlockSpec group kernel fits; at "
         "8192^2 its streaming form exceeds VMEM at compile "
         "(stream_probe_8192_nx8.json), so that row needs the group "
         "kernel live-set halved first), 55-62% adding full comm/compute "
         "overlap (strip-pipelined transposes). The >= 80% north star "
         "needs the remaining structural lever: replacing the transposed "
         "FFT with a communication-avoiding elliptic solve (distributed "
         "multigrid / DCT-blocked solves with O(halo) traffic per "
         "V-cycle) — BASELINE.json names exactly this alternative. At "
         "2-4 chips with 8192^2 tiles, overlap alone reaches ~100%/62%. "
         "Caveats: rows-only (nx, 1) weak scaling also outgrows the "
         "x-kernel's N2 <= 64 extent bound beyond M_global = 8192 — "
         "larger slices require the 2-D-mesh fused form; all bandwidth "
         "constants are public-figure estimates at 80% sustained, "
         "unverifiable on this one-chip environment.")

    if args.emit_md:
        md = os.path.join(REPO, "results", "scaling_projection.md")
        with open(md, "w") as f:
            f.write("\n".join(out) + "\n")
        print(f"\nwrote {md}")


if __name__ == "__main__":
    main()
