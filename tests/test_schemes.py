"""Time-scheme and forcing extension tests: leapfrog/Robert-Asselin,
wind-driven double-gyre, vortex IC (BASELINE configs 1-2)."""

import numpy as np

from tpu_qg.config import ModelConfig, preset
from tpu_qg.constants import KM, MINUTES, YEAR
from tpu_qg.models import QGModel, init_state


def small_cfg(**kw):
    base = dict(
        M=32, P=32, Lx=4000.0 * KM, Ly=4000.0 * KM,
        dt=60.0 * MINUTES, T=1.0 * YEAR, U=0.1, visc=100.0, r=1e-7,
        R_d=40.0 * KM, initial_kick=1e-6, dtype="float64",
    )
    base.update(kw)
    return ModelConfig(**base)


def _psi_init(cfg, seed=0, L=2):
    rng = np.random.default_rng(seed)
    return cfg.initial_kick * cfg.Ly * rng.random((L, cfg.M, cfg.P))


def test_leapfrog_matches_manual_recurrence():
    """The jitted leapfrog/RA step equals a hand-rolled float64 recurrence."""
    from tpu_qg.models.core import _invert_psi, _build_solvers, _tendencies
    import jax.numpy as jnp

    cfg = small_cfg(time_scheme="leapfrog_ra", ra_filter=0.1)
    psi0 = _psi_init(cfg)
    model = QGModel(cfg)
    state = model.init_state(psi_init=psi0)

    # Manual recurrence.
    solvers = _build_solvers(cfg)
    z = np.asarray(state.zeta)
    p = np.asarray(state.psi)
    z_bar_prev = z.copy()
    dt, ra = cfg.dt, cfg.ra_filter
    for n in range(5):
        f = np.asarray(_tendencies(cfg, jnp.asarray(z), jnp.asarray(p)))
        if n == 0:
            z_new = z + dt * f
        else:
            z_new = z_bar_prev + 2 * dt * f
        z_bar_prev_next = z + ra * (z_bar_prev - 2 * z + z_new)
        p = np.asarray(_invert_psi(cfg, solvers, jnp.asarray(z_new)))
        z_bar_prev = z_bar_prev_next if n > 0 else z + ra * (z - 2 * z + z_new)
        z = z_new

    for _ in range(5):
        state = model.step(state)
    np.testing.assert_allclose(np.asarray(state.zeta), z, rtol=1e-12, atol=0)


def test_leapfrog_stability_vs_ab3():
    """Both schemes integrate the same config stably over 200 steps and agree
    at leading order (O(dt^2) schemes on a smooth solution)."""
    psi0 = _psi_init(small_cfg())
    out = {}
    for scheme in ("euler_ab3", "leapfrog_ra"):
        cfg = small_cfg(time_scheme=scheme)
        model = QGModel(cfg)
        s = model.run(model.init_state(psi_init=psi0), 200)
        z = np.asarray(s.zeta)
        assert np.isfinite(z).all(), scheme
        out[scheme] = z
    scale = np.abs(out["euler_ab3"]).max()
    rel = np.abs(out["euler_ab3"] - out["leapfrog_ra"]).max() / scale
    assert rel < 0.2  # same trajectory to truncation-error order


def test_wind_forcing_spins_up_gyres():
    """With wind stress on and no noise, KE grows from zero and the forced
    response has the sin(2 pi y / Ly) structure in the top layer."""
    from tpu_qg.utils.diagnostics import energy

    cfg = small_cfg(wind_tau0=0.1, initial_kick=0.0, U=0.1)
    model = QGModel(cfg)
    state = init_state(cfg, psi_init=np.zeros((2, cfg.M, cfg.P)))
    out = model.run(state, 50)
    ke = np.asarray(energy(cfg, out.psi))
    assert ke[0] > 0.0
    # top layer response is x-independent (forcing is) before instability
    z = np.asarray(out.zeta[0])
    assert np.abs(z - z.mean(axis=0, keepdims=True)).max() < 1e-12 * np.abs(z).max() + 1e-30


def test_wind_forcing_zero_mean():
    """The gyre forcing integrates to zero over the domain (no spurious net
    vorticity input)."""
    from tpu_qg.models.core import _wind_forcing
    import jax.numpy as jnp

    cfg = small_cfg(wind_tau0=0.3)
    f = np.asarray(_wind_forcing(cfg, jnp.float64))
    assert abs(f.sum()) < 1e-20


def test_vortex_ic_and_preset():
    cfg = preset("barotropic-128").replace(dtype="float64", M=64, P=64)
    state = init_state(cfg)
    psi = np.asarray(state.psi[0])
    # dipole: antisymmetric about x = Lx/2 -> zero mean, nonzero amplitude
    assert abs(psi.mean()) < 1e-6 * np.abs(psi).max()
    assert np.abs(psi).max() > 0
    model = QGModel(cfg)
    out = model.run(state, 20)
    assert np.isfinite(np.asarray(out.zeta)).all()


def test_double_gyre_preset_runs():
    cfg = preset("two-layer-256").replace(M=32, P=32, dtype="float64")
    model = QGModel(cfg)
    out = model.run(model.init_state(), 20)
    assert np.isfinite(np.asarray(out.zeta)).all()
    assert int(out.step) == 20


def test_leapfrog_wind_on_halo_path():
    """Leapfrog + wind forcing match single-device results on the sharded
    halo-exchange path."""
    from tpu_qg.parallel import make_mesh, make_halo_step_fn, shard_state

    cfg = small_cfg(time_scheme="leapfrog_ra", wind_tau0=0.2)
    psi0 = _psi_init(cfg, seed=3)
    single = QGModel(cfg)
    ref = single.init_state(psi_init=psi0)
    for _ in range(5):
        ref = single.step(ref)

    mesh = make_mesh((2, 4))
    step = make_halo_step_fn(cfg, mesh, donate=False)
    s = shard_state(init_state(cfg, psi_init=psi0), mesh)
    for _ in range(5):
        s = step(s)
    scale = np.abs(np.asarray(ref.zeta)).max()
    np.testing.assert_allclose(np.asarray(s.zeta), np.asarray(ref.zeta),
                               rtol=0, atol=1e-12 * scale)
