"""Step-level float64 adjudication for large grids (VERDICT round-2 item 3).

At 8192^2 the 10-step f32-vs-f32 smoke comparison exceeds its 2e-4 bound for
EVERY fast backend, and scripts/inv_f64_check.py shows the single inversion's
f32 error vs float64 is ~1e-2-level for ALL f32 backends (including the
jnp.fft "oracle") — pairwise f32 comparisons measure low-k-amplified
transform noise there, not correctness. This script adjudicates at the STEP
level: run the same 10-step trajectory from the same IC
(init_state(PRNGKey(0)), exactly the smoke's) under

  * float64 CPU (true oracle; --f64)
  * float32 on the current backend for any smoke variant (--variant ...),
    saving the final zeta to results/step_zeta_<tag>_<M>.npy

and compare everything against the f64 zeta (--compare). The fast backend
passes if its error vs f64 matches the plain-f32 path's error vs f64 (same
noise level), regardless of how far the two f32 paths sit from each other.

  python scripts/step_f64_check.py --M 8192 --f64            # CPU, ~10 min
  python scripts/step_f64_check.py --M 8192 --variant plain  # on TPU
  python scripts/step_f64_check.py --M 8192 --variant pallas-bf16x3
  python scripts/step_f64_check.py --M 8192 --compare
"""

import argparse
import json
import os
import sys
import time

_SCRIPTS = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(_SCRIPTS)
for _p in (REPO, _SCRIPTS):   # _SCRIPTS: `from tpu_smoke import VARIANTS`
    if _p not in sys.path:    # must resolve from any cwd / -m invocation
        sys.path.insert(0, _p)

STEPS = 10


def _out(tag, M):
    return os.path.join(REPO, "results", f"step_zeta_{tag}_{M}.npy")


def _state32(cfg32):
    import jax
    from tpu_qg.models.core import init_state
    return init_state(cfg32, key=jax.random.PRNGKey(0))


def run_f64(M, P):
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    import numpy as np
    from tpu_qg.config import ModelConfig
    from tpu_qg.constants import KM
    from tpu_qg.models.core import QGModel, State

    base = dict(M=M, P=P, Lx=4000.0 * KM, Ly=4000.0 * KM, dt=60.0, T=3600.0)
    s32 = _state32(ModelConfig(dtype="float32", **base))
    cfg64 = ModelConfig(dtype="float64", use_pallas=False, fft_impl="xla",
                        **base)
    cast = lambda x: jnp.asarray(x, jnp.float64)
    s64 = State(cast(s32.zeta), cast(s32.psi), cast(s32.f1), cast(s32.f2),
                s32.step)
    t0 = time.perf_counter()
    model = QGModel(cfg64)
    out = model.run(s64, STEPS)
    z = np.asarray(out.zeta)
    np.save(_out("f64", M), z)
    print(json.dumps({"tag": "f64", "M": M, "steps": STEPS,
                      "wall_s": round(time.perf_counter() - t0, 1),
                      "finite": bool(np.isfinite(z).all())}))


def run_variant(M, P, variant):
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    import numpy as np
    from tpu_qg.config import ModelConfig
    from tpu_qg.constants import KM
    from tpu_qg.models.core import QGModel
    from tpu_smoke import VARIANTS

    cfg = ModelConfig(M=M, P=P, Lx=4000.0 * KM, Ly=4000.0 * KM,
                      dt=60.0, T=3600.0, dtype="float32",
                      **VARIANTS[variant])
    state = _state32(cfg)
    t0 = time.perf_counter()
    model = QGModel(cfg)
    out = model.run(state, STEPS)
    z = np.asarray(out.zeta)
    np.save(_out(variant, M), z)
    print(json.dumps({"tag": variant, "M": M, "steps": STEPS,
                      "platform": jax.devices()[0].platform,
                      "wall_s": round(time.perf_counter() - t0, 1),
                      "finite": bool(np.isfinite(z).all())}))


def compare(M):
    import numpy as np
    ref = np.load(_out("f64", M))
    scale = float(np.max(np.abs(ref)))
    rec = {"M": M, "steps": STEPS, "scale": scale, "err_vs_f64": {}}
    for f in sorted(os.listdir(os.path.join(REPO, "results"))):
        if f.startswith("step_zeta_") and f.endswith(f"_{M}.npy") \
                and "f64" not in f:
            tag = f[len("step_zeta_"):-len(f"_{M}.npy")]
            z = np.load(os.path.join(REPO, "results", f)).astype(np.float64)
            rec["err_vs_f64"][tag] = float(np.max(np.abs(z - ref)) / scale)
    out = os.path.join(REPO, "results", f"step_f64_check_{M}.json")
    with open(out, "w") as fh:
        json.dump(rec, fh, indent=1)
    print(json.dumps(rec))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--M", type=int, default=8192)
    ap.add_argument("--P", type=int, default=0)
    ap.add_argument("--f64", action="store_true")
    ap.add_argument("--variant")
    ap.add_argument("--compare", action="store_true")
    args = ap.parse_args()
    P = args.P or args.M
    if args.f64:
        run_f64(args.M, P)
    elif args.variant:
        run_variant(args.M, P, args.variant)
    elif args.compare:
        compare(args.M)
    else:
        ap.error("pick one of --f64 / --variant / --compare")


if __name__ == "__main__":
    main()
