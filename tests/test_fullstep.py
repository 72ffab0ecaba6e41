"""Equality tests for the one-launch whole-step kernel (v6,
tpu_qg.ops.pallas_fullstep): the fused step+inversion must reproduce the
4-launch default (v4 streamed kernel + forward-y + mirror-pair x-stage +
inverse-y) to f32 roundoff. Bitwise equality is NOT attainable in interpret
mode: tile count changes the traced graph, and XLA CPU's fusion/FMA
contraction (and BLAS dot blocking) then reorders roundoff — observed
~4.5e-7 relative, pure ulp noise. On-chip accuracy is adjudicated against
float64 (scripts/step_f64_check.py), not against another f32 path."""

import jax
import numpy as np
import pytest

from tpu_qg.config import ModelConfig
from tpu_qg.constants import KM, MINUTES, YEAR
from tpu_qg.models.core import State, init_state


def _cfg(**kw):
    base = dict(
        H_1=1.0 * KM, H_2=2.0 * KM, beta=2e-11,
        Lx=4000.0 * KM, Ly=4000.0 * KM,
        dt=60.0 * MINUTES, T=1.0 * YEAR, U=0.1,
        M=256, P=256, visc=100.0, r=1e-7, R_d=40.0 * KM,
        initial_kick=1e-6, dtype="float32",
    )
    base.update(kw)
    return ModelConfig(**base)


def _oracle_step(cfg, state, mxu):
    """v4 streamed kernel + pair-x packed inversion (the 4-launch default),
    interpret mode."""
    from tpu_qg.ops.pallas_tendency import fused_step_streamed
    from tpu_qg.ops.spectral import PackedModalInverterPallasFFT

    inv = PackedModalInverterPallasFFT(
        cfg.M, cfg.P, cfg.dx, cfg.S_eig, cfg.P_inv_matrix(),
        cfg.back_projection_matrix(), interpret=True, mxu=mxu, pair_x=True)
    assert inv._pair
    zeta_new, carry = fused_step_streamed(
        cfg, state.zeta, state.psi, state.f1, state.f2, state.step, True)
    return zeta_new, carry, inv(zeta_new)


@pytest.mark.parametrize("mxu", ["highest", "bf16x3"])
@pytest.mark.parametrize("scheme", ["euler_ab3", "leapfrog_ra"])
def test_fullstep_matches_default_composition(mxu, scheme):
    from tpu_qg.ops.pallas_fullstep import (fullstep_supported,
                                            fused_step_full)

    cfg = _cfg(time_scheme=scheme, wind_tau0=0.05)
    assert fullstep_supported(cfg, np.float32)
    state = init_state(cfg, psi_init=np.asarray(
        np.random.default_rng(0).standard_normal((2, cfg.M, cfg.P)) * 1e-4,
        np.float32))
    # Advance past the Euler bootstrap so f1/f2 history is populated.
    for k in range(3):
        zr, cr, pr = _oracle_step(cfg, state, mxu)
        zf, cf, pf = fused_step_full(cfg, state.zeta, state.psi, state.f1,
                                     state.f2, state.step, mxu, True)
        for name, got, ref in (("zeta", zf, zr), ("carry", cf, cr),
                               ("psi", pf, pr)):
            ref = np.asarray(ref)
            scale = np.abs(ref).max()
            np.testing.assert_allclose(np.asarray(got), ref, rtol=0,
                                       atol=2e-6 * scale,
                                       err_msg=f"{name} step {k}")
        state = State(zr, pr, cr,
                      state.f1 if scheme == "euler_ab3" else state.f2,
                      state.step + 1)


def test_fullstep_rect_grid():
    """Non-square extents (distinct x/y plans, N2x != N2y)."""
    from tpu_qg.ops.pallas_fullstep import (fullstep_supported,
                                            fused_step_full)

    cfg = _cfg(M=384, P=256)
    assert fullstep_supported(cfg, np.float32)
    state = init_state(cfg, psi_init=np.asarray(
        np.random.default_rng(1).standard_normal((2, cfg.M, cfg.P)) * 1e-4,
        np.float32))
    zr, cr, pr = _oracle_step(cfg, state, "highest")
    zf, cf, pf = fused_step_full(cfg, state.zeta, state.psi, state.f1,
                                 state.f2, state.step, "highest", True)
    for got, ref in ((zf, zr), (cf, cr), (pf, pr)):
        ref = np.asarray(ref)
        np.testing.assert_allclose(np.asarray(got), ref, rtol=0,
                                   atol=2e-6 * np.abs(ref).max())


def test_fullstep_fits_ladder():
    """The gate admits the headline 2048^2 (the design point) and rejects
    4096^2 (field alone exceeds VMEM)."""
    from tpu_qg.ops.pallas_fullstep import fullstep_fits

    assert fullstep_fits(2048, 2048)
    assert fullstep_fits(1024, 1024)
    assert not fullstep_fits(4096, 4096)
