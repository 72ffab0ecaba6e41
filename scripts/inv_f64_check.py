"""Is the large-grid inversion disagreement f32-intrinsic or a kernel bug?

At 8192^2 the inversion-only smoke shows every f32 backend pair disagreeing
far beyond the 2e-5 gate (pallas vs plain 1.0e-2, matmul vs plain 5.7e-2).
Two hypotheses:
  (a) kernel defect in the factored-DFT paths at N2 = 64;
  (b) f32-intrinsic: the Poisson symbol 1/lambda_k amplifies low-k transform
      noise like (N dx / 2 pi)^2; at 8192 EVERY f32 transform (including the
      jnp.fft "oracle") is equally far from the exact answer, and pairwise
      f32-vs-f32 comparisons measure noise, not correctness.

This script decides: on CPU it computes the SAME packed inversion (same seed
and zeta as scripts/tpu_smoke.py --inversion-only) in float64 (the true
oracle) and reports each f32 backend's error against it:
  plain-f32 (jnp.fft) | matmul-f32 (factored einsum DFT) |
  pallas-f32 (interpret-mode kernels, exact same op sequence as the chip).
If plain-f32's error is the same magnitude as the others', (b) holds and the
gate for large grids must compare against f64, not against plain-f32.

    python scripts/inv_f64_check.py --M 8192

Writes results/inv_f64_check_<M>.json.
"""

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from tpu_qg.config import ModelConfig  # noqa: E402
from tpu_qg.constants import KM  # noqa: E402
from tpu_qg.models.core import init_state  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--M", type=int, default=8192)
    ap.add_argument("--P", type=int, default=0)
    ap.add_argument("--skip-pallas", action="store_true",
                    help="interpret-mode kernels are slow at 8192; skip them")
    args = ap.parse_args()
    M, P = args.M, args.P or args.M

    cfg = ModelConfig(M=M, P=P, Lx=4000.0 * KM, Ly=4000.0 * KM,
                      dt=60.0, T=3600.0, dtype="float32")
    state = init_state(cfg, key=jax.random.PRNGKey(0))
    z32 = np.asarray(state.zeta, np.float32)

    from tpu_qg.ops.spectral import (PackedModalInverter,
                                     PackedModalInverterMXU,
                                     PackedModalInverterPallasFFT)
    inv_args = (M, P, cfg.dx, cfg.S_eig, cfg.P_inv_matrix(),
                cfg.back_projection_matrix())

    rec = {"M": M, "P": P}
    t0 = time.perf_counter()
    psi64 = np.asarray(PackedModalInverter(*inv_args)(
        jnp.asarray(z32, jnp.float64)))
    rec["f64_s"] = round(time.perf_counter() - t0, 1)
    scale = float(np.max(np.abs(psi64)))

    def err(psi):
        return float(np.max(np.abs(np.asarray(psi, np.float64) - psi64))
                     / scale)

    rec["plain_f32_vs_f64"] = err(PackedModalInverter(*inv_args)(
        jnp.asarray(z32)))
    rec["matmul_f32_vs_f64"] = err(PackedModalInverterMXU(*inv_args)(
        jnp.asarray(z32)))
    if not args.skip_pallas:
        t0 = time.perf_counter()
        rec["pallas_f32_vs_f64"] = err(PackedModalInverterPallasFFT(
            *inv_args, interpret=True)(jnp.asarray(z32)))
        rec["pallas_interpret_s"] = round(time.perf_counter() - t0, 1)

    out = os.path.join(REPO, "results", f"inv_f64_check_{M}.json")
    with open(out, "w") as f:
        json.dump(rec, f, indent=1)
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
