"""The y-fused three-kernel step chain (interpret mode on CPU).

The chain carries psi between steps in permuted y-spectral form and does the
inversion's y-transforms inside the step kernel (tpu_qg.models.core
make_chain_fns / tpu_qg.ops.pallas_tendency.fused_step_streamed_yspec). It
must reproduce the plain step path (XLA stencils + XLA-FFT inversion) to f32
roundoff, for both time schemes, wind forcing, and non-square grids.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_qg.config import ModelConfig
from tpu_qg.constants import KM
from tpu_qg.models import core


def _base(M=256, P=256, **kw):
    return dict(M=M, P=P, Lx=4000.0 * KM, Ly=4000.0 * KM * P / M,
                dt=60.0, T=3600.0, dtype="float32", **kw)


def _run_plain(cfg_kw, state0, n):
    model = core.QGModel(ModelConfig(**cfg_kw, fft_impl="xla",
                                     use_pallas=False))
    return model.run(state0, n)


def _run_chain(cfg_kw, state0, n):
    cfg = ModelConfig(**cfg_kw)
    chain = core.make_chain_fns(cfg, interpret=True)
    assert chain is not None, "chain must be supported for this config"
    ti, st, te = chain
    s = ti(state0)
    for _ in range(n):
        s = st(s)
    return te(s)


@pytest.mark.parametrize("M,P", [(256, 256), (256, 384)])
def test_chain_matches_plain_path(M, P):
    kw = _base(M, P)
    state0 = core.init_state(ModelConfig(**kw), key=jax.random.PRNGKey(0))
    n = 4
    ref = _run_plain(kw, state0, n)
    got = _run_chain(kw, state0, n)
    for name in ("zeta", "psi", "f1"):
        r = np.asarray(getattr(ref, name))
        g = np.asarray(getattr(got, name))
        np.testing.assert_allclose(g, r, rtol=0, atol=6e-5 * np.abs(r).max(),
                                   err_msg=f"{(M, P)} {name}")


def test_chain_leapfrog_wind():
    kw = _base(256, 256, time_scheme="leapfrog_ra", wind_tau0=0.1)
    state0 = core.init_state(ModelConfig(**kw), key=jax.random.PRNGKey(1))
    n = 4
    ref = _run_plain(kw, state0, n)
    got = _run_chain(kw, state0, n)
    for name in ("zeta", "psi", "f1"):
        r = np.asarray(getattr(ref, name))
        g = np.asarray(getattr(got, name))
        np.testing.assert_allclose(g, r, rtol=0, atol=6e-5 * np.abs(r).max(),
                                   err_msg=name)


def test_chain_internal_form_roundtrip():
    """to_external(to_internal(state)) is the identity up to f32 transform
    roundoff, and the internal psi really is the permuted y-spectrum."""
    kw = _base(256, 256)
    cfg = ModelConfig(**kw)
    state0 = core.init_state(cfg, key=jax.random.PRNGKey(2))
    ti, st, te = core.make_chain_fns(cfg, interpret=True)
    internal = ti(state0)
    back = te(internal)
    psi0 = np.asarray(state0.psi)
    np.testing.assert_allclose(np.asarray(back.psi), psi0, rtol=0,
                               atol=1e-6 * np.abs(psi0).max())
    # Internal psi = permuted y-spectrum of the packed psi_1 + i psi_2.
    from tpu_qg.ops.matmul_fft import freq_order
    w = psi0[0] + 1j * psi0[1]
    want = np.fft.fft(w, axis=1)[:, freq_order(cfg.P)]
    got = np.asarray(internal.psi[0]) + 1j * np.asarray(internal.psi[1])
    np.testing.assert_allclose(got, want, rtol=0,
                               atol=3e-5 * np.abs(want).max())


def test_chain_bf16x3():
    """The chain under the bf16x3 MXU stage stays within the bf16x3 error
    band of the plain path."""
    kw = _base(256, 256, fft_mxu="bf16x3")
    state0 = core.init_state(ModelConfig(**kw), key=jax.random.PRNGKey(3))
    n = 3
    ref = _run_plain(kw, state0, n)
    got = _run_chain(kw, state0, n)
    r, g = np.asarray(ref.zeta), np.asarray(got.zeta)
    np.testing.assert_allclose(g, r, rtol=0, atol=1e-4 * np.abs(r).max())


def test_chain_supported_predicate():
    from tpu_qg.ops.pallas_tendency import yfused_supported
    f32 = jnp.float32
    assert yfused_supported(ModelConfig(**_base(256, 256)), f32)
    assert yfused_supported(ModelConfig(**_base(2048, 2048)), f32)
    # Single layer and non-128-multiple y extents are out.
    assert not yfused_supported(
        ModelConfig(**_base(256, 256), n_layers=1), f32)
    assert not yfused_supported(ModelConfig(**_base(256, 192)), f32)


def test_chain_pairx_matches_chain():
    """The mirror-pair fused x-kernel path (2 kernel passes/step) is BITWISE
    the 3-pass chain: identical per-strip arithmetic, only the spectrum W's
    HBM round trip removed."""
    kw = _base(256, 384)
    state0 = core.init_state(ModelConfig(**kw), key=jax.random.PRNGKey(4))
    n = 3
    ref = _run_chain(kw, state0, n)
    got = _run_chain(dict(kw, fft_pairx="on"), state0, n)
    for name in ("zeta", "psi", "f1"):
        r = np.asarray(getattr(ref, name))
        g = np.asarray(getattr(got, name))
        np.testing.assert_allclose(g, r, rtol=0, atol=1e-6 * np.abs(r).max(),
                                   err_msg=name)


def test_pairx_inverter_matches_fused():
    """PackedModalInverterPallasFFT(pair_x=True) equals the 4-pass fused
    inverter, including odd strip counts (P=384 -> n2y=3) and M != P."""
    from tpu_qg.ops.spectral import PackedModalInverterPallasFFT

    for M, P in [(256, 256), (256, 384), (128, 512)]:
        cfg = ModelConfig(**_base(M, P))
        args = (M, P, cfg.dx, cfg.S_eig, cfg.P_inv_matrix(),
                cfg.back_projection_matrix())
        base = PackedModalInverterPallasFFT(*args, interpret=True)
        pair = PackedModalInverterPallasFFT(*args, interpret=True,
                                            pair_x=True)
        assert base._fuse and pair._pair
        rng = np.random.default_rng(0)
        z = np.asarray(rng.standard_normal((2, M, P)), np.float32)
        r, g = np.asarray(base(z)), np.asarray(pair(z))
        np.testing.assert_allclose(g, r, rtol=0,
                                   atol=1e-6 * np.abs(r).max(),
                                   err_msg=f"{(M, P)}")


def test_mono_inverter_matches_fused():
    """PackedModalInverterPallasFFT(mono=True) — the whole inversion in ONE
    kernel HBM pass, field VMEM-resident — equals the 4-pass fused inverter,
    including odd strip counts (P=384 -> n2y=3, self-mirror edge cases) and
    M != P."""
    from tpu_qg.ops.spectral import PackedModalInverterPallasFFT

    for M, P in [(256, 256), (256, 384), (128, 512)]:
        cfg = ModelConfig(**_base(M, P))
        args = (M, P, cfg.dx, cfg.S_eig, cfg.P_inv_matrix(),
                cfg.back_projection_matrix())
        base = PackedModalInverterPallasFFT(*args, interpret=True)
        mono = PackedModalInverterPallasFFT(*args, interpret=True,
                                            mono=True)
        assert base._fuse and mono._mono
        rng = np.random.default_rng(0)
        z = np.asarray(rng.standard_normal((2, M, P)), np.float32)
        r, g = np.asarray(base(z)), np.asarray(mono(z))
        np.testing.assert_allclose(g, r, rtol=0,
                                   atol=1e-6 * np.abs(r).max(),
                                   err_msg=f"{(M, P)}")


def test_mono_config_plumbing():
    """fft_mono="on" routes _build_packed_inverter to the mono kernel (and
    the solver output matches the jnp.fft packed inverter); "off"/default
    auto (gate False) leave it inactive."""
    from tpu_qg.ops.spectral import PackedModalInverter

    kw = _base(256, 384, fft_impl="pallas")
    cfg_on = ModelConfig(**kw, fft_mono="on")
    inv = core._build_packed_inverter(cfg_on)
    assert inv._mono
    cfg_auto = ModelConfig(**kw)
    assert core._build_packed_inverter(cfg_auto)._mono == core._MONO_IN_AUTO

    ref = PackedModalInverter(cfg_on.M, cfg_on.P, cfg_on.dx, cfg_on.S_eig,
                              cfg_on.P_inv_matrix(),
                              cfg_on.back_projection_matrix())
    rng = np.random.default_rng(1)
    z = np.asarray(rng.standard_normal((2, cfg_on.M, cfg_on.P)), np.float32)
    r, g = np.asarray(ref(z)), np.asarray(inv(z))
    np.testing.assert_allclose(g, r, rtol=0, atol=1e-5 * np.abs(r).max())
