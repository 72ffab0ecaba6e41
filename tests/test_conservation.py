"""Physics regression tests the reference lacks (SURVEY.md section 4 notes no
end-to-end conservation checks): Arakawa invariants in the inviscid limit and
bit determinism."""

import numpy as np

from tpu_qg.config import ModelConfig
from tpu_qg.constants import KM, MINUTES, YEAR
from tpu_qg.models import QGModel, init_state
from tpu_qg.utils.diagnostics import energy, enstrophy


def _cfg(**kw):
    base = dict(
        M=64, P=64, Lx=4000.0 * KM, Ly=4000.0 * KM,
        dt=30.0 * MINUTES, T=1.0 * YEAR, U=0.0, visc=0.0, r=0.0,
        R_d=40.0 * KM, initial_kick=1e-4, dtype="float64", n_layers=1,
        beta=0.0,
    )
    base.update(kw)
    return ModelConfig(**base)


def test_barotropic_inviscid_invariants():
    """Unforced inviscid barotropic QG: the Arakawa scheme conserves domain
    enstrophy and energy up to time-discretization error (the property the
    scheme was chosen for — reference: src/schemes/arakawa.jl docstring)."""
    cfg = _cfg()
    model = QGModel(cfg)
    rng = np.random.default_rng(0)
    psi0 = 1e3 * rng.standard_normal((1, cfg.M, cfg.P))
    state = init_state(cfg, psi_init=psi0)

    import jax.numpy as jnp

    def discrete_energy(s):
        """The quadratic form the Arakawa scheme conserves exactly under exact
        time integration: -0.5 <psi, zeta> with zeta = lap_5p(psi)."""
        return float(-0.5 * jnp.mean(s.psi * s.zeta))

    e0 = discrete_energy(state)
    z0 = float(enstrophy(state.zeta)[0])
    out = model.run(state, 200)
    e1 = discrete_energy(out)
    z1 = float(enstrophy(out.zeta)[0])

    # Spatial conservation: residual drift is pure AB3 time-truncation error.
    assert abs(z1 - z0) / z0 < 1e-6
    assert abs(e1 - e0) / abs(e0) < 1e-6

    # The drift is second order in dt: halving dt over the same physical
    # window shrinks it ~4x (allow slack: assert >2x).
    cfg2 = cfg.replace(dt=cfg.dt / 2)
    out2 = QGModel(cfg2).run(init_state(cfg2, psi_init=psi0), 400)
    e2 = discrete_energy(out2)
    assert abs(e2 - e0) < abs(e1 - e0) / 2.0

    # The centred-difference diagnostic energy stays bounded too.
    assert abs(float(energy(cfg, out.psi)[0])
               - float(energy(cfg, state.psi)[0])) \
        / float(energy(cfg, state.psi)[0]) < 1e-3


def test_bit_determinism():
    """Two identical runs produce bit-identical trajectories (the BASELINE
    'bit-stable' requirement)."""
    cfg = _cfg(n_layers=2, U=0.1, beta=2e-11, visc=100.0, r=1e-7)
    cfg.validate()
    model = QGModel(cfg)
    rng = np.random.default_rng(1)
    psi0 = cfg.initial_kick * cfg.Ly * rng.random((2, cfg.M, cfg.P))
    a = model.run(init_state(cfg, psi_init=psi0), 50)
    b = model.run(init_state(cfg, psi_init=psi0), 50)
    np.testing.assert_array_equal(np.asarray(a.zeta), np.asarray(b.zeta))
    np.testing.assert_array_equal(np.asarray(a.psi), np.asarray(b.psi))


def test_sharded_bit_determinism():
    """Determinism holds on the sharded halo path too (deterministic
    collectives)."""
    from tpu_qg.parallel import make_mesh, make_halo_step_fn, shard_state

    cfg = _cfg(M=32, P=32, n_layers=2, U=0.1, beta=2e-11, visc=100.0, r=1e-7)
    rng = np.random.default_rng(2)
    psi0 = cfg.initial_kick * cfg.Ly * rng.random((2, cfg.M, cfg.P))
    mesh = make_mesh((2, 4))
    step = make_halo_step_fn(cfg, mesh, donate=False)
    outs = []
    for _ in range(2):
        s = shard_state(init_state(cfg, psi_init=psi0), mesh)
        for _ in range(10):
            s = step(s)
        outs.append(np.asarray(s.zeta))
    np.testing.assert_array_equal(outs[0], outs[1])
