"""The round-3 slice-based stencil body (kept as the lab's `legacy`
variant) must match the round-4 production body (aligned rolls, adopted
after winning the on-chip ablation 0.4605 vs 0.4884 ms/step kernel-only,
c500 protocol — see tpu_qg/ops/_stencil_lab.py)."""

import jax
import numpy as np
import pytest

from tpu_qg.config import ModelConfig
from tpu_qg.constants import KM, MINUTES, YEAR
from tpu_qg.models.core import init_state
from tpu_qg.ops._stencil_lab import lab_step


@pytest.mark.parametrize("kw", [dict(), dict(time_scheme="leapfrog_ra"),
                                dict(wind_tau0=0.05)])
def test_legacy_body_matches_production(kw):
    cfg = ModelConfig(
        H_1=1.0 * KM, H_2=2.0 * KM, beta=2e-11, Lx=4000.0 * KM,
        Ly=4000.0 * KM, dt=60.0 * MINUTES, T=1.0 * YEAR, U=0.1,
        M=256, P=256, visc=100.0, r=1e-7, R_d=40.0 * KM,
        initial_kick=1e-6, dtype="float32", **kw)
    st = init_state(cfg, psi_init=np.asarray(
        np.random.default_rng(0).standard_normal((2, 256, 256)) * 1e-4,
        np.float32))
    zb, cb = lab_step(cfg, st.zeta, st.psi, st.f1, st.f2, st.step,
                      "base", True, 64)
    za, ca = lab_step(cfg, st.zeta, st.psi, st.f1, st.f2, st.step,
                      "legacy", True, 64)
    for got, ref in ((za, zb), (ca, cb)):
        ref = np.asarray(ref)
        scale = np.abs(ref).max()
        np.testing.assert_allclose(np.asarray(got), ref, rtol=0,
                                   atol=2e-6 * scale)
