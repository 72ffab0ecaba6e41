"""On-chip compile probe for the distributed streaming x-stage kernels at
the 8192^2 pod shapes (round 4).

The single-chip mirror_from_self form of the streaming pair kernel measured
a 114.97 MB Mosaic stack at 8192^2 — 1.5x the naive footprint model — so
the shape gates for the DISTRIBUTED forms (which had only ever compiled in
interpret mode) must be validated by an actual chip compile of the local
kernels at the post-transpose block shapes. No mesh needed: the pallas_calls
are plain local computations; only the surrounding all_to_alls need devices.

    python scripts/stream_probe.py --M 8192 --nx 8

Writes results/stream_probe_<M>_nx<nx>.json.
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

from tpu_qg.config import ModelConfig  # noqa: E402
from tpu_qg.constants import KM  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--M", type=int, default=8192)
    ap.add_argument("--nx", type=int, default=8)
    args = ap.parse_args()
    M = P = args.M
    nx = args.nx
    cols = P // nx

    cfg = ModelConfig(M=M, P=P, Lx=4000.0 * KM, Ly=4000.0 * KM,
                      dt=60.0, T=3600.0, dtype="float32")
    rec = {"M": M, "nx": nx, "cols": cols,
           "platform": jax.devices()[0].platform, "probes": {}}
    out = os.path.join(REPO, "results", f"stream_probe_{M}_nx{nx}.json")

    rng = np.random.default_rng(0)

    def save():
        with open(out, "w") as f:
            json.dump(rec, f, indent=1)

    # Probe 1: the companion-scheme streaming kernel
    # (_build_streaming_fwd_sym_inv_x_pair, offset form) on a local
    # (2, M, cols) block pair.
    try:
        from tpu_qg.parallel.packed import DistributedPackedInverter
        inv = DistributedPackedInverter(
            M, P, cfg.dx, cfg.S_eig, cfg.P_inv_matrix(),
            cfg.back_projection_matrix())
        assert inv._pfft._stream_x
        Zy = jnp.asarray(rng.standard_normal((2, M, cols)), jnp.float32)
        Zm = jnp.asarray(rng.standard_normal((2, M, cols)), jnp.float32)
        f = jax.jit(lambda a, b: inv._pfft._call_x_fwd_symbols_offset(
            a, b, inv._sym_consts, 0))
        t0 = time.perf_counter()
        V = f(Zy, Zm)
        ok = bool(jnp.isfinite(V).all())
        rec["probes"]["packed_stream"] = {
            "ok": ok, "compile_s": round(time.perf_counter() - t0, 1)}
    except Exception as e:
        rec["probes"]["packed_stream"] = {"ok": False,
                                          "error": repr(e)[:400]}
    print("[probe] packed_stream:", rec["probes"]["packed_stream"],
          flush=True)
    save()

    # Probe 2: the paired-strip streaming kernel (_build_paired_kernel_stream)
    # on a local pair-ordered block.
    try:
        from tpu_qg.parallel.paired import PairedDistributedInverter
        pinv = PairedDistributedInverter(
            M, P, cfg.dx, cfg.S_eig, cfg.P_inv_matrix(),
            cfg.back_projection_matrix())
        assert pinv._pfft._stream_x
        X = jnp.asarray(rng.standard_normal((2, M, cols)), jnp.float32)
        idx = jnp.asarray(pinv._order[:cols // 128], jnp.int32)
        g = jax.jit(lambda x: pinv._call_paired_kernel(x, idx))
        t0 = time.perf_counter()
        V2 = g(X)
        ok = bool(jnp.isfinite(V2).all())
        rec["probes"]["paired_stream"] = {
            "ok": ok, "compile_s": round(time.perf_counter() - t0, 1)}
    except Exception as e:
        rec["probes"]["paired_stream"] = {"ok": False,
                                          "error": repr(e)[:400]}
    print("[probe] paired_stream:", rec["probes"]["paired_stream"],
          flush=True)
    save()
    print(f"[probe] wrote {out}")


if __name__ == "__main__":
    main()
