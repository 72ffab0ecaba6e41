"""Fused Pallas factored-DFT tests (interpret mode on CPU).

The kernel must reproduce matmul_fft.FactoredFFT's permuted-order transforms
exactly (same plan, same conventions), and the planar packed inverter must
match the complex-FFT PackedModalInverter oracle.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_qg.ops.matmul_fft import MatmulFFT2, freq_order
from tpu_qg.ops.pallas_fft import PlanarFFT2, pallas_fft_supported


def _planar(z):
    return jnp.stack([jnp.real(z), jnp.imag(z)]).astype(jnp.float32)


def _complex(p):
    return np.asarray(p[0]) + 1j * np.asarray(p[1])


def _rand_complex(M, P, seed=0):
    rng = np.random.default_rng(seed)
    return (rng.standard_normal((M, P)) + 1j * rng.standard_normal((M, P)))


@pytest.mark.parametrize("M,P", [(256, 256), (256, 512), (384, 256)])
def test_forward_matches_matmul_fft(M, P):
    z = _rand_complex(M, P)
    ref = np.asarray(MatmulFFT2(M, P).forward(jnp.asarray(z, jnp.complex64)))
    got = _complex(PlanarFFT2(M, P, interpret=True).forward(_planar(z)))
    scale = np.abs(ref).max()
    np.testing.assert_allclose(got, ref, rtol=0, atol=3e-6 * scale)


@pytest.mark.parametrize("M,P", [(256, 256), (256, 512)])
def test_roundtrip_identity(M, P):
    z = _rand_complex(M, P, seed=1)
    fft2 = PlanarFFT2(M, P, interpret=True)
    back = _complex(fft2.inverse(fft2.forward(_planar(z))))
    np.testing.assert_allclose(back, z, rtol=0, atol=3e-6 * np.abs(z).max())


def test_forward_is_the_permuted_dft():
    M = P = 256
    z = _rand_complex(M, P, seed=2)
    W = _complex(PlanarFFT2(M, P, interpret=True).forward(_planar(z)))
    ref = np.fft.fft2(z)[np.ix_(freq_order(M), freq_order(P))]
    np.testing.assert_allclose(W, ref, rtol=0, atol=3e-5 * np.abs(ref).max())


def test_supported_predicate():
    assert pallas_fft_supported(128)
    assert pallas_fft_supported(256)
    assert pallas_fft_supported(2048)
    assert pallas_fft_supported(4096)       # N2 = 32: recursive small stage
    assert pallas_fft_supported(8192)       # N2 = 64
    assert not pallas_fft_supported(16384)  # N2 = 128 > 64
    assert not pallas_fft_supported(192)    # N1 = 96 != 128
    assert not pallas_fft_supported(64)

    from tpu_qg.ops.pallas_fft import _x_blockspec_fits, planar_fft2_fits
    assert planar_fft2_fits(2048, 2048)
    assert planar_fft2_fits(4096, 4096)
    assert planar_fft2_fits(8192, 8192)      # via the streaming x-kernel
    assert _x_blockspec_fits(2048, 2048)
    assert not _x_blockspec_fits(8192, 8192)  # its block alone is 8 MB
    assert PlanarFFT2(8192, 8192, interpret=True)._stream_x


def test_packed_inverter_matches_oracle():
    from tpu_qg.config import ModelConfig
    from tpu_qg.constants import KM
    from tpu_qg.ops.spectral import (PackedModalInverter,
                                     PackedModalInverterPallasFFT)

    cfg = ModelConfig(M=256, P=256, Lx=4000.0 * KM, Ly=4000.0 * KM,
                      dt=60.0, T=3600.0, dtype="float32")
    args = (cfg.M, cfg.P, cfg.dx, cfg.S_eig, cfg.P_inv_matrix(),
            cfg.back_projection_matrix())
    rng = np.random.default_rng(3)
    zeta = jnp.asarray(rng.standard_normal((2, cfg.M, cfg.P)), jnp.float32)
    ref = np.asarray(PackedModalInverter(*args)(zeta))
    got = np.asarray(PackedModalInverterPallasFFT(*args, interpret=True)(zeta))
    np.testing.assert_allclose(got, ref, rtol=0, atol=2e-5 * np.abs(ref).max())


def test_model_step_with_pallas_fft_matches_xla_fft():
    """One full jitted model step with fft_impl='pallas' (interpret mode on
    CPU) must match the XLA-FFT step."""
    from tpu_qg.config import ModelConfig
    from tpu_qg.constants import KM
    from tpu_qg.models import core

    base = dict(M=256, P=256, Lx=4000.0 * KM, Ly=4000.0 * KM,
                dt=60.0, T=3600.0, dtype="float32")
    state0 = core.init_state(ModelConfig(**base), key=jax.random.PRNGKey(0))

    def run(fft_impl, n=3):
        cfg = ModelConfig(**base, fft_impl=fft_impl)
        model = core.QGModel(cfg)
        return np.asarray(model.run(state0, n).zeta)

    ref = run("xla")
    got = run("pallas")
    np.testing.assert_allclose(got, ref, rtol=0, atol=1e-5 * np.abs(ref).max())


def test_chunk_dft_matches_numpy():
    """The recursive small-stage DFT (compile-time scalar weights over tile
    pairs) equals numpy's FFT for composite, power-of-two, and prime sizes,
    both signs, with the inverse scale."""
    from tpu_qg.ops.pallas_fft import _chunk_dft

    rng = np.random.default_rng(0)
    for N in (1, 4, 7, 12, 16, 32, 64):
        x = rng.standard_normal(N) + 1j * rng.standard_normal(N)
        # Tiles of shape (2, 3) so broadcasting paths are exercised.
        tile = rng.standard_normal((2, 3))
        pairs = [(x[s].real * tile, x[s].imag * tile) for s in range(N)]

        out = _chunk_dft(pairs, -1)
        want = np.fft.fft(x)
        got = np.stack([r + 1j * i for r, i in out])
        np.testing.assert_allclose(got, want[:, None, None] * tile,
                                   rtol=1e-12, atol=1e-12)

        out = _chunk_dft(pairs, +1, 1.0 / N)
        want = np.fft.ifft(x)
        got = np.stack([r + 1j * i for r, i in out])
        np.testing.assert_allclose(got, want[:, None, None] * tile,
                                   rtol=1e-12, atol=1e-12)


def test_fused_symbol_inverse_matches_unfused():
    """The symbol stage fused into the inverse-x kernel (negate-spectrum via
    mirror-strip BlockSpec + 0/1 permutation dots) equals the XLA-level
    symbol path, on square and non-square grids."""
    from tpu_qg.config import ModelConfig
    from tpu_qg.constants import KM
    from tpu_qg.ops.spectral import PackedModalInverterPallasFFT

    for (M, P) in ((256, 256), (256, 512), (384, 256)):
        cfg = ModelConfig(M=M, P=P, Lx=4000.0 * KM,
                          Ly=4000.0 * KM * P / M,
                          dt=60.0, T=3600.0, dtype="float32")
        args = (cfg.M, cfg.P, cfg.dx, cfg.S_eig, cfg.P_inv_matrix(),
                cfg.back_projection_matrix())
        rng = np.random.default_rng(7)
        zeta = jnp.asarray(rng.standard_normal((2, M, P)), jnp.float32)
        fused = PackedModalInverterPallasFFT(*args, interpret=True)
        plain = PackedModalInverterPallasFFT(*args, interpret=True,
                                             fuse_symbols=False)
        assert fused._fuse and not plain._fuse
        got = np.asarray(fused(zeta))
        ref = np.asarray(plain(zeta))
        # The fused path's mirror permutations go through _pdot (two-pass
        # exact-split bf16, pinned ~2^-16 relative budget independent of
        # Mosaic's default dot lowering — ADVICE.md round 2), so the fused
        # and unfused spectra differ at that level, not at f32 roundoff.
        np.testing.assert_allclose(got, ref, rtol=0,
                                   atol=4e-5 * np.abs(ref).max(),
                                   err_msg=f"{(M, P)}")


def test_streaming_x_kernel_matches_blockspec():
    """The manually-DMA'd streaming x-kernel (the 8192^2 form) produces the
    same transforms and fused-symbol inversion as the BlockSpec form, forced
    on at small sizes via stream_x=True."""
    M, P = 256, 384
    z = _rand_complex(M, P, seed=9)
    a = PlanarFFT2(M, P, interpret=True)
    b = PlanarFFT2(M, P, interpret=True, stream_x=True)
    assert not a._stream_x and b._stream_x

    Wa = a.forward(_planar(z))
    Wb = b.forward(_planar(z))
    scale = float(np.abs(np.asarray(Wa)).max())
    np.testing.assert_allclose(np.asarray(Wb), np.asarray(Wa), rtol=0,
                               atol=1e-6 * scale)
    za = _complex(a.inverse(Wa))
    zb = _complex(b.inverse(Wb))
    np.testing.assert_allclose(zb, za, rtol=0,
                               atol=1e-6 * np.abs(za).max())

    from tpu_qg.config import ModelConfig
    from tpu_qg.constants import KM
    from tpu_qg.ops.spectral import PackedModalInverterPallasFFT

    cfg = ModelConfig(M=M, P=P, Lx=4000.0 * KM, Ly=4000.0 * KM * P / M,
                      dt=60.0, T=3600.0, dtype="float32")
    args = (cfg.M, cfg.P, cfg.dx, cfg.S_eig, cfg.P_inv_matrix(),
            cfg.back_projection_matrix())
    rng = np.random.default_rng(11)
    zeta = jnp.asarray(rng.standard_normal((2, M, P)), jnp.float32)
    inv_a = PackedModalInverterPallasFFT(*args, interpret=True)
    inv_b = PackedModalInverterPallasFFT(*args, interpret=True)
    inv_b._pfft = PlanarFFT2(M, P, interpret=True, stream_x=True)
    ra = np.asarray(inv_a(zeta))
    rb = np.asarray(inv_b(zeta))
    np.testing.assert_allclose(rb, ra, rtol=0, atol=1e-6 * np.abs(ra).max())


def test_bf16x3_mxu_stage():
    """The manual 3-term bf16 MXU decomposition (mxu="bf16x3") reproduces the
    HIGHEST-precision build to the bf16x3 error model (~2^-16 relative), for
    the plain transforms, the fused-symbol inversion, and a full model step."""
    M, P = 256, 384
    z = _rand_complex(M, P, seed=13)
    hi = PlanarFFT2(M, P, interpret=True)
    lo = PlanarFFT2(M, P, interpret=True, mxu="bf16x3")

    Wh = np.asarray(hi.forward(_planar(z)))
    Wl = np.asarray(lo.forward(_planar(z)))
    scale = np.abs(Wh).max()
    np.testing.assert_allclose(Wl, Wh, rtol=0, atol=5e-5 * scale)
    back = _complex(lo.inverse(lo.forward(_planar(z))))
    np.testing.assert_allclose(back, z, rtol=0, atol=5e-5 * np.abs(z).max())

    from tpu_qg.config import ModelConfig
    from tpu_qg.constants import KM
    from tpu_qg.ops.spectral import (PackedModalInverter,
                                     PackedModalInverterPallasFFT)

    cfg = ModelConfig(M=M, P=P, Lx=4000.0 * KM, Ly=4000.0 * KM * P / M,
                      dt=60.0, T=3600.0, dtype="float32")
    args = (cfg.M, cfg.P, cfg.dx, cfg.S_eig, cfg.P_inv_matrix(),
            cfg.back_projection_matrix())
    rng = np.random.default_rng(17)
    zeta = jnp.asarray(rng.standard_normal((2, M, P)), jnp.float32)
    ref = np.asarray(PackedModalInverter(*args)(zeta))
    got = np.asarray(PackedModalInverterPallasFFT(
        *args, interpret=True, mxu="bf16x3")(zeta))
    np.testing.assert_allclose(got, ref, rtol=0, atol=5e-5 * np.abs(ref).max())


def test_model_step_with_bf16x3_matches_xla_fft():
    """A full jitted step with fft_mxu='bf16x3' stays within the bf16x3 error
    band of the XLA-FFT step (interpret mode on CPU)."""
    from tpu_qg.config import ModelConfig
    from tpu_qg.constants import KM
    from tpu_qg.models import core

    base = dict(M=256, P=256, Lx=4000.0 * KM, Ly=4000.0 * KM,
                dt=60.0, T=3600.0, dtype="float32")
    state0 = core.init_state(ModelConfig(**base), key=jax.random.PRNGKey(0))

    def run(n=3, **kw):
        model = core.QGModel(ModelConfig(**base, **kw))
        return np.asarray(model.run(state0, n).zeta)

    ref = run(fft_impl="xla")
    got = run(fft_impl="pallas", fft_mxu="bf16x3")
    np.testing.assert_allclose(got, ref, rtol=0, atol=5e-5 * np.abs(ref).max())


def test_stream_pair_symbols_matches_four_pass():
    """The single-chip streaming pair form (forward-x + symbols + inverse-x
    in ONE manual-DMA pass, mirror from the same operand) must match the
    4-pass fused-symbol path. NOT a production single-chip route: it
    measured slower than the 4-pass path at 4096² (RESULTS.md) and
    spectral.py gates it off (``_pair_stream = False``; this test forces
    it via the attribute) — the kernel's production role is the
    distributed streaming x-stage."""
    import numpy as np

    from tpu_qg.config import ModelConfig
    from tpu_qg.constants import KM, MINUTES, YEAR
    from tpu_qg.ops.spectral import PackedModalInverterPallasFFT

    for M, P in [(256, 512), (384, 256)]:
        cfg = ModelConfig(
            H_1=1.0 * KM, H_2=2.0 * KM, beta=2e-11, Lx=4000.0 * KM,
            Ly=4000.0 * KM, dt=60.0 * MINUTES, T=1.0 * YEAR, U=0.1,
            M=M, P=P, visc=100.0, r=1e-7, R_d=40.0 * KM,
            initial_kick=1e-6, dtype="float32")
        rng = np.random.default_rng(3)
        zeta = np.asarray(rng.standard_normal((2, M, P)), np.float32)
        ref4 = PackedModalInverterPallasFFT(
            M, P, cfg.dx, cfg.S_eig, cfg.P_inv_matrix(),
            cfg.back_projection_matrix(), interpret=True)
        a = np.asarray(ref4(zeta))
        sp = PackedModalInverterPallasFFT(
            M, P, cfg.dx, cfg.S_eig, cfg.P_inv_matrix(),
            cfg.back_projection_matrix(), interpret=True, pair_x=True)
        sp._pair = False          # force the streaming form at a small M
        sp._pair_stream = True
        b = np.asarray(sp(zeta))
        scale = np.abs(a).max()
        np.testing.assert_allclose(b, a, rtol=0, atol=1e-6 * scale)
