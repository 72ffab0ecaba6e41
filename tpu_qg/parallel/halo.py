"""Explicit halo exchange over the device mesh (shard_map path).

The distributed analog of the reference's ghost-ring refresh
(reference: src/schemes/boundary_conditions.jl:1-13): each device owns an
(m, p) tile of the global (M, P) grid; before a stencil sweep it receives
h-deep halo slabs from its four neighbors via ``jax.lax.ppermute`` ring shifts
(x-direction first, then y on the x-padded block, which fills the corner
halos with the correct diagonal-neighbor data in two hops).
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import Array, lax


def make_padded_shift(h: int):
    """Shift primitive over an h-halo-padded block: shift(u, di, dj)[i, j] =
    u_interior[i+di, j+dj] (a static slice — no data movement)."""
    def shift(u: Array, di: int, dj: int) -> Array:
        lo_x, hi_x = h + di, -(h - di) or None
        lo_y, hi_y = h + dj, -(h - dj) or None
        return u[..., lo_x:hi_x, lo_y:hi_y]
    return shift


def _ring_perm(n: int, direction: int):
    """(source, dest) pairs sending each rank's slab ``direction`` steps along
    a periodic ring (+1 = to the next rank)."""
    return [(i, (i + direction) % n) for i in range(n)]


def exchange_halo(u: Array, h: int, axis_x: str = "x", axis_y: str = "y") -> Array:
    """Pad a local (..., m, p) block to (..., m+2h, p+2h) with neighbor halos.

    Must be called inside shard_map over a mesh with axes (axis_x, axis_y).
    Two-phase exchange: x-slabs first, then y-slabs of the x-padded block so
    corners are correct (the distributed counterpart of the reference's
    diagonal corner copies, src/schemes/boundary_conditions.jl:8-12).
    """
    nx = lax.axis_size(axis_x)
    ny = lax.axis_size(axis_y)

    # --- x-direction: receive the last h rows of the left (x-1) neighbor and
    # the first h rows of the right (x+1) neighbor.
    top, bot = u[..., :h, :], u[..., -h:, :]
    if nx == 1:
        from_left, from_right = bot, top
    else:
        from_left = lax.ppermute(bot, axis_x, _ring_perm(nx, +1))
        from_right = lax.ppermute(top, axis_x, _ring_perm(nx, -1))
    u = jnp.concatenate([from_left, u, from_right], axis=-2)

    # --- y-direction on the x-padded block (fills corners).
    left, right = u[..., :, :h], u[..., :, -h:]
    if ny == 1:
        from_down, from_up = right, left
    else:
        from_down = lax.ppermute(right, axis_y, _ring_perm(ny, +1))
        from_up = lax.ppermute(left, axis_y, _ring_perm(ny, -1))
    return jnp.concatenate([from_down, u, from_up], axis=-1)
