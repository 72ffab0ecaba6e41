"""I/O layer tests: snapshot parity keys, metadata, exact AB3 resume."""

import numpy as np

from tpu_qg.config import ModelConfig
from tpu_qg.constants import KM, MINUTES, YEAR
from tpu_qg.io import RunReader, RunWriter, create_metadata
from tpu_qg.models import QGModel


def small_cfg(**kw):
    base = dict(
        M=16, P=16, Lx=4000.0 * KM, Ly=4000.0 * KM,
        dt=60.0 * MINUTES, T=1.0 * YEAR, U=0.1, visc=100.0, r=1e-7,
        R_d=40.0 * KM, initial_kick=1e-6, dtype="float64",
    )
    base.update(kw)
    return ModelConfig(**base)


def test_metadata_parity():
    """Metadata fields match the reference's create_metadata
    (reference: src/run_model.jl:6-20) — including the FIXED sampling cadence
    (the reference's run loop saves every 2*sample_timestep, quirk)."""
    cfg = small_cfg()
    meta = create_metadata(cfg)
    assert meta["dt"] == cfg.dt
    assert meta["T"] == cfg.T
    assert meta["sample_timestep"] == int((24 * 3600) // cfg.dt)
    assert meta["total_steps"] == cfg.total_steps


def test_snapshot_roundtrip(tmp_path):
    cfg = small_cfg()
    writer = RunWriter(tmp_path / "run", cfg)
    z = np.random.default_rng(0).random((2, 16, 16))
    p = np.random.default_rng(1).random((2, 16, 16))
    writer.write_snapshot(42, z, p)
    reader = RunReader(tmp_path / "run")
    assert reader.snapshot_steps() == [42]
    z2, p2 = reader.load_snapshot(42)
    np.testing.assert_array_equal(z, z2)
    np.testing.assert_array_equal(p, p2)
    cfg2 = reader.config()
    assert cfg2 == cfg


def test_exact_ab3_resume(tmp_path):
    """Checkpoints carry the tendency history, so a resumed run is bit-exact
    vs an uninterrupted one (the reference cannot do this: it saves only
    time-level 1, SURVEY.md section 5)."""
    cfg = small_cfg()
    model = QGModel(cfg)
    rng = np.random.default_rng(2)
    psi0 = cfg.initial_kick * cfg.U * cfg.Ly * rng.random((2, 16, 16))

    # Uninterrupted 20 steps.
    s = model.init_state(psi_init=psi0)
    ref = model.run(s, 20)

    # 10 steps -> checkpoint -> reload -> 10 more.
    s = model.init_state(psi_init=psi0)
    mid = model.run(s, 10)
    writer = RunWriter(tmp_path / "ck", cfg)
    writer.write_checkpoint(mid)
    reloaded = RunReader(tmp_path / "ck").load_checkpoint()
    assert int(reloaded.step) == 10
    resumed = model.run(reloaded, 10)

    np.testing.assert_array_equal(np.asarray(resumed.zeta), np.asarray(ref.zeta))
    np.testing.assert_array_equal(np.asarray(resumed.psi), np.asarray(ref.psi))


def test_run_model_driver(tmp_path):
    """End-to-end driver parity with run_model (reference: src/run_model.jl:55-95):
    writes IC snapshot, periodic snapshots, and a final checkpoint."""
    from tpu_qg.run import run_model

    cfg = small_cfg(T=30 * 60.0 * MINUTES)  # 30 steps
    out = run_model(cfg, run_dir=str(tmp_path / "drv"), verbose=False,
                    sample_interval=10 * cfg.dt)
    reader = RunReader(tmp_path / "drv")
    assert reader.snapshot_steps() == [0, 10, 20, 30]
    assert reader.checkpoint_steps() == [30]
    assert int(out.step) == 30
