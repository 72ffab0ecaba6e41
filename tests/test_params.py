"""Exact parameter/algebra unit tests (reference: src/test.jl:8-44,195-217)."""

import numpy as np
import pytest

from tpu_qg.config import ModelConfig, preset
from tpu_qg.constants import KM, MINUTES, YEAR


def _test_config():
    """The reference's test config (reference: src/test.jl:9-23)."""
    return ModelConfig(
        H_1=1.0 * KM, H_2=2.0 * KM, beta=2e-11,
        Lx=4000.0 * KM, Ly=4000.0 * KM,
        dt=15.0 * MINUTES, T=0.5 * YEAR, U=2.0,
        M=128, P=128, visc=100.0, r=1e-7, R_d=40.0 * KM, initial_kick=1e-2,
    )


def test_derived_parameters_exact():
    cfg = _test_config()
    expected_ratio = 0.5 * (1000 + 2000) / (40000.0 ** 2 * (1 / 1000 + 1 / 2000))
    assert cfg.ratio_term == expected_ratio

    expected_S1 = 2 * expected_ratio / (1000 * 3000)
    assert cfg.S1_plus == expected_S1

    expected_S2 = 2 * expected_ratio / (2000 * 3000)
    assert cfg.S2_minus == expected_S2

    assert cfg.beta_1 == cfg.beta + expected_S1 * cfg.U
    assert cfg.beta_2 == cfg.beta - expected_S2 * cfg.U

    expected_eig = -1.0 / cfg.R_d ** 2
    assert cfg.S_eig == expected_eig
    # Eigen-identity (reference: src/test.jl:43).
    assert -cfg.S1_plus - cfg.S2_minus == expected_eig


def test_P_times_P_inv_is_identity():
    """reference: src/test.jl:195-217."""
    cfg = _test_config()
    P = np.array(cfg.P_matrix())
    P_inv = np.array(cfg.P_inv_matrix())
    np.testing.assert_allclose(P @ P_inv, np.eye(2), atol=1e-15)


def test_back_projection_quirk():
    """compat_reference_P reproduces P_matrix(H_1, H_1) = [[1,-1],[1,1]]
    (reference: src/model.jl:173)."""
    cfg = _test_config()
    assert cfg.back_projection_matrix() == ((1.0, -1.0), (1.0, 1.0))
    fixed = cfg.replace(compat_reference_P=False)
    assert fixed.back_projection_matrix() == ((1.0, -2.0), (1.0, 1.0))


def test_baroclinic_instability_assert():
    """Reference asserts sign(beta_1) == -sign(beta_2) (src/model.jl:38)."""
    cfg = _test_config()
    cfg.validate()  # does not raise (U=2 makes beta_2 negative)
    stable = cfg.replace(U=0.0)
    with pytest.raises(ValueError):
        stable.validate()


def test_geometry():
    cfg = _test_config()
    assert cfg.H == cfg.H_1 + cfg.H_2
    assert cfg.dx == cfg.Lx / cfg.M
    assert cfg.total_steps == int(cfg.T / cfg.dt)


def test_presets_exist():
    for name in ("production", "barotropic-128", "two-layer-256", "spinup-512",
                 "turbulence-2048", "pod-8192", "bench-ref"):
        p = preset(name)
        assert p.M > 0 and p.P > 0
    with pytest.raises(KeyError):
        preset("nope")
