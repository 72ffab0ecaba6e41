"""Profiling / tracing hooks.

The reference's tracing is ad-hoc ``@time`` macros (reference:
src/run_model.jl:61-62,124) and BenchmarkTools sweeps. Here:

  * ``trace(...)``       — context manager wrapping ``jax.profiler`` to write a
    TensorBoard-loadable XPlane trace of the wrapped region.
  * ``Timer``            — wall-clock section timer with a completion barrier
    that actually works on the remote-tunnel backend (a host transfer of a
    reduction; plain block_until_ready can return early there).
  * ``roofline_report``  — per-step bandwidth estimate vs the chip's HBM
    bandwidth: how far the step is from speed-of-light.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp


def sync(x) -> float:
    """Reliable completion barrier: forces the computation producing ``x`` to
    finish by pulling a scalar reduction to the host."""
    return float(jnp.sum(x))


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/tpu_qg_trace"):
    """Capture a jax.profiler trace of the enclosed region (view with
    TensorBoard's profile plugin or xprof)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


class Timer:
    """Named wall-clock sections with forced completion."""

    def __init__(self):
        self.times: Dict[str, float] = {}

    @contextlib.contextmanager
    def section(self, name: str, result=None):
        t0 = time.perf_counter()
        yield
        if result is not None:
            sync(result)
        self.times[name] = self.times.get(name, 0.0) + time.perf_counter() - t0

    def report(self) -> str:
        total = sum(self.times.values()) or 1.0
        lines = [f"{k:>24s}: {v:.4f} s ({100 * v / total:5.1f}%)"
                 for k, v in sorted(self.times.items(), key=lambda kv: -kv[1])]
        return "\n".join(lines)


# Approximate peak HBM bandwidth per chip (bytes/s) for roofline estimates.
_HBM_BW = {
    "TPU v4": 1.2e12,
    "TPU v5 lite": 8.2e11,   # v5e
    "TPU v5": 2.76e12,       # v5p
    "TPU v6 lite": 1.64e12,  # v6e / Trillium
}


def roofline_report(cfg, step_seconds: float,
                    device: Optional[jax.Device] = None) -> Dict[str, float]:
    """Estimate how close one model step is to the HBM-bandwidth light-speed.

    Minimal per-step HBM traffic (float32, both layers): read zeta+psi+f1+f2,
    write zeta+psi+f1 -> 7 L-layer arrays for the fused tendency+update path,
    plus ~6 array passes for the two spectral transforms (rfft2+irfft2 on two
    modes with on-chip twiddles). This is the achievable floor, not a bound
    proof — use ``trace`` for the real picture.
    """
    device = device or jax.devices()[0]
    kind = device.device_kind
    bw = next((v for k, v in _HBM_BW.items() if kind.startswith(k)), 8.2e11)
    itemsize = jnp.dtype(cfg.dtype).itemsize
    array_bytes = cfg.n_layers * cfg.M * cfg.P * itemsize
    min_bytes = (7 + 6) * array_bytes
    light_speed_s = min_bytes / bw
    return {
        "step_seconds": step_seconds,
        "estimated_min_bytes": float(min_bytes),
        "hbm_bandwidth": bw,
        "light_speed_seconds": light_speed_s,
        "fraction_of_light_speed": light_speed_s / step_seconds,
    }
