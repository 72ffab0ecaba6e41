"""Snapshot / checkpoint / metadata I/O.

Counterpart of the reference's JLD output path (reference: src/run_model.jl:70-91
writes ``zeta_$t`` / ``psi_$t`` keyed snapshots plus a metadata dict; readers in
src/plotting/animation.jl:6-17). Differences by design:

  * A run is a *directory* of npz files plus ``metadata.json`` instead of one
    append-only JLD/HDF5 file (append-friendly, trivially parallel-readable).
  * Keys keep the reference's ``{field}_{step}`` naming for tooling parity.
  * Full-state checkpoints additionally store the AB3 tendency history and step
    counter, enabling *exact* restart — the reference saves only time-level 1,
    so an exact AB3 resume is impossible there (SURVEY.md section 5).
"""

from __future__ import annotations

import dataclasses
import json
import pathlib
from typing import Dict, List, Optional, Tuple, Union

import numpy as np

from .config import ModelConfig
from .constants import DAY
from .models.core import State

PathLike = Union[str, pathlib.Path]


def create_metadata(cfg: ModelConfig, sample_interval: float = 1.0 * DAY) -> Dict:
    """Run metadata (reference: src/run_model.jl:6-20, ``create_metadata``)."""
    sample_timestep = int(sample_interval // cfg.dt)
    return {
        "dt": cfg.dt,
        "T": cfg.T,
        "sample_interval": sample_interval,
        "sample_timestep": sample_timestep,
        "total_steps": cfg.total_steps,
        "config": dataclasses.asdict(cfg),
    }


class RunWriter:
    """Streams snapshots and checkpoints of a run to a directory."""

    def __init__(self, run_dir: PathLike, cfg: ModelConfig,
                 sample_interval: float = 1.0 * DAY):
        self.dir = pathlib.Path(run_dir)
        self.dir.mkdir(parents=True, exist_ok=True)
        self.cfg = cfg
        meta = create_metadata(cfg, sample_interval)
        (self.dir / "metadata.json").write_text(json.dumps(meta, indent=2))

    def write_snapshot(self, step: int, zeta: np.ndarray, psi: np.ndarray) -> None:
        """Save the prognostic fields at a step under reference-parity keys
        (reference: src/run_model.jl:87-90)."""
        np.savez(
            self.dir / f"snap_{step:09d}.npz",
            **{f"zeta_{step}": np.asarray(zeta), f"psi_{step}": np.asarray(psi)},
        )

    def write_checkpoint(self, state: State) -> None:
        """Full-state checkpoint (zeta, psi, AB3 history, step) for exact resume."""
        step = int(state.step)
        np.savez(
            self.dir / f"checkpoint_{step:09d}.npz",
            zeta=np.asarray(state.zeta),
            psi=np.asarray(state.psi),
            f1=np.asarray(state.f1),
            f2=np.asarray(state.f2),
            step=np.asarray(step),
        )


class RunReader:
    """Reads a run directory (counterpart of the reference's ``load_matrix`` /
    ``get_metadata``, src/plotting/animation.jl:6-17)."""

    def __init__(self, run_dir: PathLike):
        self.dir = pathlib.Path(run_dir)
        self.metadata = json.loads((self.dir / "metadata.json").read_text())

    def snapshot_steps(self) -> List[int]:
        return sorted(int(p.stem.split("_")[1]) for p in self.dir.glob("snap_*.npz"))

    def load_snapshot(self, step: int) -> Tuple[np.ndarray, np.ndarray]:
        with np.load(self.dir / f"snap_{step:09d}.npz") as z:
            return z[f"zeta_{step}"], z[f"psi_{step}"]

    def checkpoint_steps(self) -> List[int]:
        return sorted(int(p.stem.split("_")[1])
                      for p in self.dir.glob("checkpoint_*.npz"))

    def load_checkpoint(self, step: Optional[int] = None) -> State:
        """Load a full-state checkpoint (latest by default) for exact resume."""
        import jax.numpy as jnp

        steps = self.checkpoint_steps()
        if not steps:
            raise FileNotFoundError(f"no checkpoints in {self.dir}")
        step = steps[-1] if step is None else step
        with np.load(self.dir / f"checkpoint_{step:09d}.npz") as z:
            return State(
                zeta=jnp.asarray(z["zeta"]),
                psi=jnp.asarray(z["psi"]),
                f1=jnp.asarray(z["f1"]),
                f2=jnp.asarray(z["f2"]),
                step=jnp.asarray(int(z["step"]), jnp.int32),
            )

    def config(self) -> ModelConfig:
        cfg_dict = dict(self.metadata["config"])
        return ModelConfig(**cfg_dict)
