"""On-chip decomposition of the multigrid V-cycle cost (round 5).

The first TPU measurement (decomp_r5_mg_2048_c500.json) put one V(2,2)
cycle at 2048^2 at 13.8 ms — ~35x the ~0.4 ms HBM floor for its ~14
field passes. This probe times the cycle's building blocks under the same
c500 protocol to find where the time goes before designing the fix
(Pallas fused smoother vs XLA restructuring).

  python scripts/mg_probe.py --M 2048 --chunk 500 --jobs jac,lap,restrict,prolong,coarse,vc1024,vc64,addone
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
import numpy as np  # noqa: E402


def _sync(x):
    return float(jnp.sum(x))


def _measure(tag, fn, init, chunk, reps, rec):
    @jax.jit
    def run(carry):
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
                "compile_s": round(compile_s, 1)}
    print(f"[mgprobe] {tag}: {rec[tag]}", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--M", type=int, default=2048)
    ap.add_argument("--chunk", type=int, default=500)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--jobs",
                    default="jac,lap,restrict,prolong,coarse,vc1024,vc64,"
                            "addone")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    M = args.M

    from tpu_qg.constants import KM
    from tpu_qg.ops import multigrid as mg

    Lx = 4000.0 * KM
    dx = Lx / M
    S = -1.0 / (40.0 * KM) ** 2
    alphas = (0.0, S)
    rng = np.random.default_rng(0)
    f = jnp.asarray(rng.standard_normal((2, M, M)).astype(np.float32) * 1e-5)
    a_col = jnp.asarray(alphas, jnp.float32).reshape(-1, 1, 1)

    out_path = args.out or os.path.join(
        REPO, "results", f"mg_probe_{M}_c{args.chunk}.json")
    rec = {"M": M, "chunk": args.chunk,
           "platform": jax.devices()[0].platform, "jobs": {}}
    if os.path.exists(out_path):
        prev = json.load(open(out_path))
        if (prev.get("M"), prev.get("chunk")) == (M, args.chunk):
            rec = prev

    for job in args.jobs.split(","):
        job = job.strip()
        try:
            if job == "jac":
                # f rides the carry: closing over it embeds a (2, M, M)
                # constant (268 MB at 8192^2 -> remote-compile HTTP 413).
                _measure(job,
                         lambda t: (mg.jacobi_smooth(t[0], t[1], dx,
                                                     a_col), t[1]),
                         (f, f), args.chunk, args.reps, rec["jobs"])
            elif job == "lap":
                _measure(job, lambda u: mg.apply_helmholtz(u, dx, a_col),
                         f, args.chunk, args.reps, rec["jobs"])
            elif job == "restrict":
                _measure(job, lambda u: jnp.pad(
                    mg.restrict_full_weighting(u), ((0, 0), (0, M // 2),
                                                    (0, M // 2))),
                         f, args.chunk, args.reps, rec["jobs"])
            elif job == "restrict_mm":
                # Separable full weighting as two MXU matmuls:
                # Lx (m/2, m) banded [1,2,1]/4 row-restrict, Ry (p, p/2).
                m = M
                Lx = np.zeros((m // 2, m), np.float32)
                for i in range(m // 2):
                    Lx[i, (2 * i - 1) % m] = 0.25
                    Lx[i, 2 * i] = 0.5
                    Lx[i, (2 * i + 1) % m] = 0.25
                Ry = jnp.asarray(Lx.T)
                Lxj = jnp.asarray(Lx)

                def rmm(u):
                    w = jnp.einsum("cm,kmp->kcp", Lxj, u)
                    out = jnp.einsum("kcp,pd->kcd", w, Ry)
                    return jnp.pad(out, ((0, 0), (0, M // 2),
                                         (0, M // 2)))
                _measure(job, rmm, f, args.chunk, args.reps, rec["jobs"])
            elif job == "restrict_tt":
                # 9-point weights via rolls, then stride-2 on SUBLANES both
                # times (lane-stride avoided by a transpose sandwich).
                from tpu_qg.ops import multigrid as mgm

                def rtt(u):
                    w = (4.0 * u
                         + 2.0 * (jnp.roll(u, 1, 1) + jnp.roll(u, -1, 1)
                                  + jnp.roll(u, 1, 2) + jnp.roll(u, -1, 2))
                         + jnp.roll(u, (1, 1), (1, 2))
                         + jnp.roll(u, (1, -1), (1, 2))
                         + jnp.roll(u, (-1, 1), (1, 2))
                         + jnp.roll(u, (-1, -1), (1, 2))) / 16.0
                    s1 = w[:, ::2, :]                    # sublane stride
                    t = jnp.swapaxes(s1, 1, 2)           # (k, p, m/2)
                    s2 = t[:, ::2, :]                    # sublane stride
                    out = jnp.swapaxes(s2, 1, 2)         # (k, m/2, p/2)
                    return jnp.pad(out, ((0, 0), (0, M // 2),
                                         (0, M // 2)))
                _measure(job, rtt, f, args.chunk, args.reps, rec["jobs"])
            elif job == "restrict_rs":
                # reshape-to-pairs + tiny contraction for both strides.
                sel = jnp.asarray([1.0, 0.0], jnp.float32)

                def rrs(u):
                    w = (4.0 * u
                         + 2.0 * (jnp.roll(u, 1, 1) + jnp.roll(u, -1, 1)
                                  + jnp.roll(u, 1, 2) + jnp.roll(u, -1, 2))
                         + jnp.roll(u, (1, 1), (1, 2))
                         + jnp.roll(u, (1, -1), (1, 2))
                         + jnp.roll(u, (-1, 1), (1, 2))
                         + jnp.roll(u, (-1, -1), (1, 2))) / 16.0
                    k_, m_, p_ = w.shape
                    w = jnp.einsum("kmqc,c->kmq",
                                   w.reshape(k_, m_, p_ // 2, 2), sel)
                    w = jnp.einsum("kmcq,c->kmq",
                                   w.reshape(k_, m_ // 2, 2, p_ // 2),
                                   sel)
                    return jnp.pad(w, ((0, 0), (0, M // 2), (0, M // 2)))
                _measure(job, rrs, f, args.chunk, args.reps, rec["jobs"])
            elif job == "restrict_nhwc":
                k3 = jnp.asarray(np.outer([1, 2, 1], [1, 2, 1]) / 16.0,
                                 jnp.float32).reshape(3, 3, 1, 1)

                def rnh(u):
                    x = u[..., None]            # (2, M, M, 1) NHWC
                    x = jnp.concatenate([x[:, -1:], x, x[:, :1]], axis=1)
                    x = jnp.concatenate([x[:, :, -1:], x, x[:, :, :1]],
                                        axis=2)
                    y = jax.lax.conv_general_dilated(
                        x, k3, window_strides=(2, 2), padding="VALID",
                        dimension_numbers=("NHWC", "HWIO", "NHWC"))
                    return jnp.pad(y[..., 0], ((0, 0), (0, M // 2),
                                               (0, M // 2)))
                _measure(job, rnh, f, args.chunk, args.reps, rec["jobs"])
            elif job == "prolong":
                uc = f[:, :M // 2, :M // 2]
                _measure(job, lambda u: mg.prolong_bilinear(
                    u[:, :M // 2, :M // 2]), f, args.chunk, args.reps,
                    rec["jobs"])
            elif job == "coarse":
                fc = f[:, :64, :64]
                _measure(job, lambda u: mg._coarse_spectral_solve(
                    u, 64, 64, dx * (M // 64), alphas) + 0.0 * u,
                    fc, args.chunk, args.reps, rec["jobs"])
            elif job.startswith("vc"):
                # vc<cutoff> (XLA smoothers) or vck<cutoff> (Pallas fused
                # smoother kernel at every supported level).
                kern = job[2] == "k"
                cutoff = int(job[3:] if kern else job[2:])
                solver = mg.MultigridSolver(
                    M, M, dx, alphas, n_cycles=1, coarse_cutoff=cutoff,
                    use_pallas="on" if kern else "off")
                _measure(job,
                         lambda t: (solver._vcycle(0, t[0], t[1]), t[1]),
                         (f, f), args.chunk, args.reps, rec["jobs"])
            elif job == "mgsmooth":
                from tpu_qg.ops.pallas_mg import mg_smooth

                def sm(t):
                    u2, r = mg_smooth(t[0], t[1], dx, alphas, 2, True)
                    return u2 + 0.0 * r, t[1]
                _measure(job, sm, (f, f), args.chunk, args.reps,
                         rec["jobs"])
            elif job == "addone":
                _measure(job, lambda u: u + 1.0, f, args.chunk, args.reps,
                         rec["jobs"])
            else:
                raise ValueError(f"unknown job {job!r}")
        except Exception as e:
            rec["jobs"][job] = {"error": repr(e)[:300]}
            print(f"[mgprobe] {job} FAILED: {e}", flush=True)
        os.makedirs(os.path.dirname(out_path), exist_ok=True)
        with open(out_path, "w") as fh:
            json.dump(rec, fh, indent=1)
    print(f"[mgprobe] wrote {out_path}")


if __name__ == "__main__":
    main()
