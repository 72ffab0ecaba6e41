"""Physics diagnostics: energy, enstrophy, CFL — jitted reductions.

The reference has no conservation diagnostics at all (its ``update_max/min``
helpers are dead code, reference: src/run_model.jl:41-53); validation of full
runs was done visually (SURVEY.md section 4). These are the structured
per-interval scalars the TPU build logs instead — cheap on TPU as fused
reductions.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
from jax import Array

from ..config import ModelConfig
from ..ops.stencils import centered_diff_x


def _grad_sq(psi: Array, dx: float) -> Array:
    """|grad psi|^2 with centred differences, per layer."""
    dpx = centered_diff_x(psi, dx)
    dpy = jnp.swapaxes(centered_diff_x(jnp.swapaxes(psi, -1, -2), dx), -1, -2)
    return dpx * dpx + dpy * dpy


def energy(cfg: ModelConfig, psi: Array) -> Array:
    """Kinetic energy per layer: 0.5 * mean(|grad psi|^2), shape (L,)."""
    return 0.5 * jnp.mean(_grad_sq(psi, cfg.dx), axis=(-2, -1))


def enstrophy(zeta: Array) -> Array:
    """Potential enstrophy per layer: 0.5 * mean(zeta^2), shape (L,)."""
    return 0.5 * jnp.mean(zeta * zeta, axis=(-2, -1))


def cfl_number(cfg: ModelConfig, psi: Array) -> Array:
    """Advective CFL: max(|u|) * dt / dx with u = |grad psi| (plus the mean
    flow U on layer 1)."""
    speed = jnp.sqrt(jnp.max(_grad_sq(psi, cfg.dx)))
    return (speed + abs(cfg.U)) * cfg.dt / cfg.dx


@jax.jit
def _max_abs(x):
    return jnp.max(jnp.abs(x))


def diagnostics(cfg: ModelConfig, state) -> Dict[str, float]:
    """Scalar diagnostic dict for logging (host-side)."""
    ke = energy(cfg, state.psi)
    ens = enstrophy(state.zeta)
    out = {
        "step": int(state.step),
        "cfl": float(cfl_number(cfg, state.psi)),
        "max_abs_zeta": float(_max_abs(state.zeta)),
    }
    for i in range(ke.shape[0]):
        out[f"ke_{i + 1}"] = float(ke[i])
        out[f"enstrophy_{i + 1}"] = float(ens[i])
    return out
