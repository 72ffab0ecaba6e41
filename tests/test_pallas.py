"""Pallas fused-tendency kernel tests (interpret mode on CPU; the compiled
path is exercised on real TPU by bench.py and the driver)."""

import jax.numpy as jnp
import numpy as np
import pytest

from tpu_qg.config import ModelConfig
from tpu_qg.constants import KM
from tpu_qg.models.core import _tendencies
from tpu_qg.ops.pallas_tendency import fused_tendency, pallas_supported


def _cfg(**kw):
    base = dict(M=64, P=128, Lx=4000.0 * KM, Ly=8000.0 * KM,
                dt=60.0, T=3600.0, dtype="float32")
    base.update(kw)
    return ModelConfig(**base)


def _rand(shape, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.standard_normal(shape), jnp.float32)


def test_matches_xla_two_layer():
    cfg = _cfg()
    zeta, psi = _rand((2, 64, 128), 0), _rand((2, 64, 128), 1)
    ref = np.asarray(_tendencies(cfg, zeta, psi))
    out = np.asarray(fused_tendency(cfg, zeta, psi, True))
    np.testing.assert_allclose(out, ref, rtol=0,
                               atol=1e-6 * np.abs(ref).max())


def test_matches_xla_single_layer():
    cfg = _cfg(n_layers=1)
    zeta, psi = _rand((1, 64, 128), 2), _rand((1, 64, 128), 3)
    ref = np.asarray(_tendencies(cfg, zeta, psi))
    out = np.asarray(fused_tendency(cfg, zeta, psi, True))
    np.testing.assert_allclose(out, ref, rtol=0,
                               atol=1e-6 * np.abs(ref).max())


def test_multiple_row_tiles():
    """Grid with >1 program: wrap halos must come from the pre-padded rows."""
    cfg = _cfg(M=256, P=128)
    zeta, psi = _rand((2, 256, 128), 4), _rand((2, 256, 128), 5)
    ref = np.asarray(_tendencies(cfg, zeta, psi))
    out = np.asarray(fused_tendency(cfg, zeta, psi, True))
    np.testing.assert_allclose(out, ref, rtol=0,
                               atol=1e-6 * np.abs(ref).max())


def test_supported_predicate():
    assert pallas_supported(_cfg(), jnp.float32)
    assert not pallas_supported(_cfg(P=100), jnp.float32)  # not 128-aligned
    assert not pallas_supported(_cfg(), jnp.float64)       # 4-byte only
