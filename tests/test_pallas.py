"""Pallas fused-tendency kernel tests (interpret mode on CPU; the compiled
path is exercised on real TPU by bench.py and the driver)."""

import jax.numpy as jnp
import numpy as np

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


def test_fused_pre_inversion_matches_xla():
    """v2 kernel: tendency + Euler/AB3 update + modal projection fused."""
    import jax.numpy as jnp
    from tpu_qg.ops.pallas_tendency import fused_pre_inversion

    cfg = _cfg(M=256, P=128)
    zeta, psi = _rand((2, 256, 128), 6), _rand((2, 256, 128), 7)
    f1, f2 = _rand((2, 256, 128), 8), _rand((2, 256, 128), 9)

    for step in (0, 1, 2, 7):
        tend_ref = _tendencies(cfg, zeta, psi)
        upd = jnp.where(jnp.asarray(step) < 2, cfg.dt * tend_ref,
                        cfg.dt * ((23 / 12) * tend_ref - (16 / 12) * f1
                                  + (5 / 12) * f2))
        zn_ref = zeta + upd
        (pi11, pi12), (pi21, pi22) = cfg.P_inv_matrix()
        modes_ref = np.stack([
            np.asarray(pi11 * zn_ref[0] + pi12 * zn_ref[1]),
            np.asarray(pi21 * zn_ref[0] + pi22 * zn_ref[1])])
        zn, tend, modes = fused_pre_inversion(
            cfg, zeta, psi, f1, f2, jnp.asarray(step), True)
        np.testing.assert_allclose(
            np.asarray(tend), np.asarray(tend_ref), rtol=0,
            atol=1e-6 * np.abs(np.asarray(tend_ref)).max(),
            err_msg=f"tend step={step}")
        np.testing.assert_allclose(
            np.asarray(zn), np.asarray(zn_ref), rtol=0,
            atol=1e-6 * np.abs(np.asarray(zn_ref)).max(),
            err_msg=f"zeta_new step={step}")
        np.testing.assert_allclose(
            np.asarray(modes), modes_ref, rtol=0,
            atol=1e-6 * np.abs(modes_ref).max(), err_msg=f"modes step={step}")


def test_fused_pre_inversion_single_layer():
    from tpu_qg.ops.pallas_tendency import fused_pre_inversion
    import jax.numpy as jnp

    cfg = _cfg(n_layers=1)
    zeta, psi = _rand((1, 64, 128), 10), _rand((1, 64, 128), 11)
    f1, f2 = _rand((1, 64, 128), 12), _rand((1, 64, 128), 13)
    zn, tend, modes = fused_pre_inversion(
        cfg, zeta, psi, f1, f2, jnp.asarray(5), True)
    tend_ref = np.asarray(_tendencies(cfg, zeta, psi))
    np.testing.assert_allclose(np.asarray(tend), tend_ref, rtol=0,
                               atol=1e-6 * np.abs(tend_ref).max())
    np.testing.assert_array_equal(np.asarray(modes), np.asarray(zn))


def test_supported_predicate():
    assert pallas_supported(_cfg(), jnp.float32)
    assert not pallas_supported(_cfg(P=100), jnp.float32)  # not 128-aligned
    assert not pallas_supported(_cfg(), jnp.float64)       # 4-byte only


def test_fused_step_pre_fft_matches_xla():
    """v3 kernel (shared-rotation stencils, no modes output) vs the XLA path."""
    import jax.numpy as jnp
    from tpu_qg.ops.pallas_tendency import fused_step_pre_fft

    cfg = _cfg(M=256, P=128)
    zeta, psi = _rand((2, 256, 128), 20), _rand((2, 256, 128), 21)
    f1, f2 = _rand((2, 256, 128), 22), _rand((2, 256, 128), 23)

    for step in (0, 1, 2, 9):
        tend_ref = _tendencies(cfg, zeta, psi)
        upd = jnp.where(jnp.asarray(step) < 2, cfg.dt * tend_ref,
                        cfg.dt * ((23 / 12) * tend_ref - (16 / 12) * f1
                                  + (5 / 12) * f2))
        zn_ref = np.asarray(zeta + upd)
        zn, tend = fused_step_pre_fft(
            cfg, zeta, psi, f1, f2, jnp.asarray(step), True)
        np.testing.assert_allclose(
            np.asarray(tend), np.asarray(tend_ref), rtol=0,
            atol=1e-6 * np.abs(np.asarray(tend_ref)).max(),
            err_msg=f"tend step={step}")
        np.testing.assert_allclose(
            np.asarray(zn), zn_ref, rtol=0,
            atol=1e-6 * np.abs(zn_ref).max(), err_msg=f"zeta_new step={step}")


def test_fused_step_streamed_matches_xla():
    """v4 kernel (double-buffered input pipeline) vs the XLA path, over
    several tile counts including the smallest pipelined grid (n=2)."""
    import jax.numpy as jnp
    from tpu_qg.ops.pallas_tendency import fused_step_streamed

    cfg = _cfg(M=256, P=128)
    zeta, psi = _rand((2, 256, 128), 40), _rand((2, 256, 128), 41)
    f1, f2 = _rand((2, 256, 128), 42), _rand((2, 256, 128), 43)

    for tile in (128, 64, 32):        # 2, 4, 8 grid steps
        for step in (0, 2, 9):
            tend_ref = _tendencies(cfg, zeta, psi)
            upd = jnp.where(jnp.asarray(step) < 2, cfg.dt * tend_ref,
                            cfg.dt * ((23 / 12) * tend_ref - (16 / 12) * f1
                                      + (5 / 12) * f2))
            zn_ref = np.asarray(zeta + upd)
            zn, tend = fused_step_streamed(
                cfg, zeta, psi, f1, f2, jnp.asarray(step), True, tile)
            np.testing.assert_allclose(
                np.asarray(tend), np.asarray(tend_ref), rtol=0,
                atol=1e-6 * np.abs(np.asarray(tend_ref)).max(),
                err_msg=f"tend tile={tile} step={step}")
            np.testing.assert_allclose(
                np.asarray(zn), zn_ref, rtol=0,
                atol=1e-6 * np.abs(zn_ref).max(),
                err_msg=f"zeta_new tile={tile} step={step}")


def test_fused_step_streamed_single_tile_fallback_and_single_layer():
    import jax.numpy as jnp
    from tpu_qg.ops.pallas_tendency import fused_step_streamed

    # tile == M -> falls back to the v3 kernel (grid < 2).
    cfg = _cfg(M=64, P=128)
    zeta, psi = _rand((2, 64, 128), 44), _rand((2, 64, 128), 45)
    f1, f2 = _rand((2, 64, 128), 46), _rand((2, 64, 128), 47)
    tend_ref = np.asarray(_tendencies(cfg, zeta, psi))
    zn, tend = fused_step_streamed(cfg, zeta, psi, f1, f2,
                                   jnp.asarray(5), True, 64)
    np.testing.assert_allclose(np.asarray(tend), tend_ref, rtol=0,
                               atol=1e-6 * np.abs(tend_ref).max())

    cfg1 = _cfg(n_layers=1, M=128)
    zeta, psi = _rand((1, 128, 128), 48), _rand((1, 128, 128), 49)
    f1, f2 = _rand((1, 128, 128), 50), _rand((1, 128, 128), 51)
    tend_ref = np.asarray(_tendencies(cfg1, zeta, psi))
    zn, tend = fused_step_streamed(cfg1, zeta, psi, f1, f2,
                                   jnp.asarray(5), True, 32)
    np.testing.assert_allclose(np.asarray(tend), tend_ref, rtol=0,
                               atol=1e-6 * np.abs(tend_ref).max())


def test_fused_step_pre_fft_single_tile_and_single_layer():
    import jax.numpy as jnp
    from tpu_qg.ops.pallas_tendency import fused_step_pre_fft

    # Single tile (grid n == 1) exercises the both-ends wrap fetch.
    cfg = _cfg(M=64, P=128)
    zeta, psi = _rand((2, 64, 128), 24), _rand((2, 64, 128), 25)
    f1, f2 = _rand((2, 64, 128), 26), _rand((2, 64, 128), 27)
    tend_ref = np.asarray(_tendencies(cfg, zeta, psi))
    zn, tend = fused_step_pre_fft(cfg, zeta, psi, f1, f2, jnp.asarray(5), True)
    np.testing.assert_allclose(np.asarray(tend), tend_ref, rtol=0,
                               atol=1e-6 * np.abs(tend_ref).max())

    cfg1 = _cfg(n_layers=1)
    zeta, psi = _rand((1, 64, 128), 28), _rand((1, 64, 128), 29)
    f1, f2 = _rand((1, 64, 128), 30), _rand((1, 64, 128), 31)
    tend_ref = np.asarray(_tendencies(cfg1, zeta, psi))
    zn, tend = fused_step_pre_fft(cfg1, zeta, psi, f1, f2, jnp.asarray(5), True)
    np.testing.assert_allclose(np.asarray(tend), tend_ref, rtol=0,
                               atol=1e-6 * np.abs(tend_ref).max())


# --- round 2: time-scheme and wind-forcing coverage of the fused kernels ---

def _leapfrog_refs(cfg, zeta, psi, f1, step):
    """Reference (zeta_new, filtered) from the XLA-path leapfrog formulas."""
    import jax.numpy as jnp
    tend = _tendencies(cfg, zeta, psi)
    zpf = jnp.where(jnp.asarray(step) == 0, zeta, f1)
    zn = jnp.where(jnp.asarray(step) == 0,
                   zeta + cfg.dt * tend, zpf + 2.0 * cfg.dt * tend)
    filt = zeta + cfg.ra_filter * (zpf - 2.0 * zeta + zn)
    return np.asarray(zn), np.asarray(filt)


def test_fused_step_streamed_leapfrog():
    """v4 kernel under time_scheme=leapfrog_ra: carry2 is the RA-filtered
    current level; f2 is never read."""
    import jax.numpy as jnp
    from tpu_qg.ops.pallas_tendency import fused_step_streamed

    cfg = _cfg(M=256, P=128, time_scheme="leapfrog_ra")
    zeta, psi = _rand((2, 256, 128), 60), _rand((2, 256, 128), 61)
    f1 = _rand((2, 256, 128), 62)
    f2 = jnp.full_like(f1, jnp.nan)  # must never be read under leapfrog

    for tile in (128, 64):
        for step in (0, 3):
            zn_ref, filt_ref = _leapfrog_refs(cfg, zeta, psi, f1, step)
            zn, filt = fused_step_streamed(
                cfg, zeta, psi, f1, f2, jnp.asarray(step), True, tile)
            np.testing.assert_allclose(
                np.asarray(zn), zn_ref, rtol=0,
                atol=1e-6 * np.abs(zn_ref).max(),
                err_msg=f"zeta_new tile={tile} step={step}")
            np.testing.assert_allclose(
                np.asarray(filt), filt_ref, rtol=0,
                atol=1e-6 * np.abs(filt_ref).max(),
                err_msg=f"filtered tile={tile} step={step}")


def test_fused_step_pre_fft_leapfrog():
    """v3 kernel (also the v4 single-tile fallback) under leapfrog_ra."""
    import jax.numpy as jnp
    from tpu_qg.ops.pallas_tendency import fused_step_pre_fft

    cfg = _cfg(M=64, P=128, time_scheme="leapfrog_ra")
    zeta, psi = _rand((2, 64, 128), 63), _rand((2, 64, 128), 64)
    f1 = _rand((2, 64, 128), 65)
    f2 = jnp.full_like(f1, jnp.nan)
    for step in (0, 3):
        zn_ref, filt_ref = _leapfrog_refs(cfg, zeta, psi, f1, step)
        zn, filt = fused_step_pre_fft(cfg, zeta, psi, f1, f2,
                                      jnp.asarray(step), True)
        np.testing.assert_allclose(np.asarray(zn), zn_ref, rtol=0,
                                   atol=1e-6 * np.abs(zn_ref).max())
        np.testing.assert_allclose(np.asarray(filt), filt_ref, rtol=0,
                                   atol=1e-6 * np.abs(filt_ref).max())


def test_fused_pre_inversion_leapfrog_single_layer():
    """v2 kernel (the barotropic-preset path) under leapfrog_ra."""
    import jax.numpy as jnp
    from tpu_qg.ops.pallas_tendency import fused_pre_inversion

    cfg = _cfg(n_layers=1, time_scheme="leapfrog_ra")
    zeta, psi = _rand((1, 64, 128), 66), _rand((1, 64, 128), 67)
    f1 = _rand((1, 64, 128), 68)
    f2 = jnp.full_like(f1, jnp.nan)
    for step in (0, 3):
        zn_ref, filt_ref = _leapfrog_refs(cfg, zeta, psi, f1, step)
        zn, filt, modes = fused_pre_inversion(cfg, zeta, psi, f1, f2,
                                              jnp.asarray(step), True)
        np.testing.assert_allclose(np.asarray(zn), zn_ref, rtol=0,
                                   atol=1e-6 * np.abs(zn_ref).max())
        np.testing.assert_allclose(np.asarray(filt), filt_ref, rtol=0,
                                   atol=1e-6 * np.abs(filt_ref).max())
        np.testing.assert_array_equal(np.asarray(modes), np.asarray(zn))


def test_wind_forcing_fused_kernels():
    """All kernel generations include the double-gyre wind term on the top
    layer. wind_tau0 is scaled so the wind row is O(1) against the tiny
    stencil terms (visc/Jacobian scale like 1/dx^2 ~ 1e-10 here), making any
    missing/wrong forcing visible. Tolerance 1e-5: the kernels evaluate the
    f32 sin on the VPU vs the XLA path's float64-constant row."""
    import jax.numpy as jnp
    from tpu_qg.ops.pallas_tendency import (fused_pre_inversion,
                                            fused_step_pre_fft,
                                            fused_step_streamed,
                                            fused_tendency)

    cfg = _cfg(M=256, P=128, wind_tau0=1e12)
    zeta, psi = _rand((2, 256, 128), 70), _rand((2, 256, 128), 71)
    f1, f2 = _rand((2, 256, 128), 72), _rand((2, 256, 128), 73)

    ref = np.asarray(_tendencies(cfg, zeta, psi))
    tol = 1e-5 * np.abs(ref).max()
    out = np.asarray(fused_tendency(cfg, zeta, psi, True))
    np.testing.assert_allclose(out, ref, rtol=0, atol=tol, err_msg="v1")

    _, tend = fused_step_pre_fft(cfg, zeta, psi, f1, f2, jnp.asarray(5), True)
    np.testing.assert_allclose(np.asarray(tend), ref, rtol=0, atol=tol,
                               err_msg="v3")
    _, tend = fused_step_streamed(cfg, zeta, psi, f1, f2, jnp.asarray(5),
                                  True, 64)
    np.testing.assert_allclose(np.asarray(tend), ref, rtol=0, atol=tol,
                               err_msg="v4")
    _, tend, _ = fused_pre_inversion(cfg, zeta, psi, f1, f2, jnp.asarray(5),
                                     True)
    np.testing.assert_allclose(np.asarray(tend), ref, rtol=0, atol=tol,
                               err_msg="v2")

    # Single-layer wind (the two-layer-256/barotropic presets' combination).
    cfg1 = _cfg(n_layers=1, wind_tau0=1e12, time_scheme="leapfrog_ra")
    zeta1, psi1 = _rand((1, 64, 128), 74), _rand((1, 64, 128), 75)
    ref1 = np.asarray(_tendencies(cfg1, zeta1, psi1))
    out1 = np.asarray(fused_tendency(cfg1, zeta1, psi1, True))
    np.testing.assert_allclose(out1, ref1, rtol=0,
                               atol=1e-5 * np.abs(ref1).max())
