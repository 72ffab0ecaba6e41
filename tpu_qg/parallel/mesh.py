"""Device mesh construction for 2-D spatial domain decomposition."""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np

import jax
from jax.sharding import Mesh


def _factor2(n: int) -> Tuple[int, int]:
    """Split n into the most-square (a, b) with a * b == n, a <= b."""
    a = int(np.floor(np.sqrt(n)))
    while n % a:
        a -= 1
    return a, n // a


def make_mesh(shape: Optional[Tuple[int, int]] = None,
              axis_names: Sequence[str] = ("x", "y"),
              devices=None) -> Mesh:
    """Build a 2-D ('x', 'y') device mesh over the available devices.

    ``shape=None`` uses all devices in the most-square arrangement; an
    explicit shape smaller than the device count takes the FIRST nx*ny
    devices (e.g. ``--mesh 4,1`` on an 8-device host). Axis 'x' shards the
    M (first spatial) dimension, 'y' the P dimension.
    """
    devices = jax.devices() if devices is None else devices
    n = len(devices)
    if shape is None:
        shape = _factor2(n)
    if shape[0] * shape[1] > n:
        raise ValueError(f"mesh shape {shape} needs more than the {n} "
                         "available devices")
    devices = devices[:shape[0] * shape[1]]
    dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, axis_names=tuple(axis_names))
