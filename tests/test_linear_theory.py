"""Baroclinic-instability growth-rate validation against the discrete linear
theory (tpu_qg.validation.linear_theory) — an independent closed-form check of
tendencies + inversion (incl. the compat quirk) + time stepping."""

import jax.numpy as jnp
import numpy as np

from tpu_qg.config import ModelConfig
from tpu_qg.constants import KM, MINUTES
from tpu_qg.models.core import (QGModel, State, _build_solvers, _invert_psi)
from tpu_qg.validation.linear_theory import (eigenmode_fields,
                                             fastest_growing_mode,
                                             growth_rate, inversion_map)


def _cfg(**kw):
    base = dict(M=64, P=64, Lx=4000.0 * KM, Ly=4000.0 * KM,
                dt=15.0 * MINUTES, T=1.0, U=0.5, visc=100.0, r=1e-8,
                R_d=40.0 * KM, dtype="float64")
    base.update(kw)
    return ModelConfig(**base)


def _measure_growth(cfg, kappa, ell, vec, n_skip=50, n_meas=100):
    zeta0 = eigenmode_fields(cfg, kappa, ell, vec, 1e-8)
    solvers = _build_solvers(cfg)
    psi0 = _invert_psi(cfg, solvers, jnp.asarray(zeta0))
    model = QGModel(cfg)
    s = State(jnp.asarray(zeta0), psi0, jnp.zeros_like(jnp.asarray(zeta0)),
              jnp.zeros_like(jnp.asarray(zeta0)), jnp.asarray(0, jnp.int32))
    amps = []
    for i in range(n_skip + n_meas):
        s = model.step(s)
        if i >= n_skip:
            amps.append(float(jnp.sqrt(jnp.mean(s.zeta[0] ** 2))))
    return np.polyfit(np.arange(len(amps)) * cfg.dt, np.log(amps), 1)[0]


def test_growth_rate_matches_linear_theory():
    cfg = _cfg()
    kappa, ell, sigma, vec = fastest_growing_mode(cfg, max_kappa=20)
    assert sigma.real > 0, "config must be baroclinically unstable"
    measured = _measure_growth(cfg, kappa, ell, vec)
    assert abs(measured - sigma.real) / sigma.real < 1e-4


def test_growth_rate_with_quirk_disabled_differs():
    """The P(H_1, H_1) quirk changes the dynamics when H_1 != H_2: the
    discrete theory (which models the quirk) predicts different growth rates
    with and without it — and the model follows whichever it is configured
    for. This is the regression net around SURVEY.md section 0 quirk 1."""
    cfg_quirk = _cfg()
    cfg_fixed = _cfg(compat_reference_P=False)
    k1, l1, s1, v1 = fastest_growing_mode(cfg_quirk, max_kappa=16)
    k2, l2, s2, v2 = fastest_growing_mode(cfg_fixed, max_kappa=16)
    # different back-projection => measurably different growth rates
    assert abs(s1.real - s2.real) / s1.real > 1e-3
    m2 = _measure_growth(cfg_fixed, k2, l2, v2)
    assert abs(m2 - s2.real) / s2.real < 1e-4


def test_inversion_map_consistency():
    """The theory's G map equals the model's inversion on a pure mode."""
    cfg = _cfg()
    kappa, ell = 5, 3
    lam = ((2 * np.cos(2 * np.pi * kappa / cfg.M) - 2)
           + (2 * np.cos(2 * np.pi * ell / cfg.P) - 2)) / cfg.dx ** 2
    G = inversion_map(cfg, lam)
    vec = np.array([1.0 + 0.3j, -0.7 + 0.1j])
    zeta = eigenmode_fields(cfg, kappa, ell, vec, 1.0)
    psi = np.asarray(_invert_psi(cfg, _build_solvers(cfg), jnp.asarray(zeta)))
    psi_theory = eigenmode_fields(cfg, kappa, ell, G @ vec, 1.0)
    np.testing.assert_allclose(psi, psi_theory, atol=1e-12)


def test_stable_mode_decays():
    """A config below criticality (tiny U) has no growing zonal modes."""
    cfg = _cfg(U=0.5)
    # high-wavenumber modes are stabilized by friction
    sig, _ = growth_rate(cfg, cfg.M // 2 - 1, 0)
    assert sig.real < 0
