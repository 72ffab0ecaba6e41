"""Test configuration: CPU backend, 8 virtual devices, float64 enabled.

Tests run on the CPU backend (reference-equivalence needs float64 — the TPU
tunnel can't compile f64 FFTs — and the multi-device sharding tests use a
virtual 8-device host mesh, the standard JAX fake-backend analog, see
SURVEY.md section 4). The axon TPU tunnel ignores the JAX_PLATFORMS env var,
so the backend is forced via jax.config before any backend initialization.
"""

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_enable_x64", True)
