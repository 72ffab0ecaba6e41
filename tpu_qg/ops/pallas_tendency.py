"""Fused two-layer tendency as a single Pallas TPU kernel.

The reference computes each tendency with six separate allocating array sweeps
per layer (laplace x2/x3, Arakawa, centred differences — reference:
src/model.jl:139-153 calling src/schemes/*), i.e. ~12 full-array HBM
round-trips per step. The pure-XLA roll path already fuses much of that; this
kernel goes the rest of the way: ONE pass over HBM computing both layers'
complete right-hand sides
    visc*lap(lap(psi)) - J(zeta, psi) - beta_l*d(psi)/dx - {U*d(zeta)/dx | r*lap(psi)}
with all intermediates resident in VMEM.

Strategy (see /opt/skills/guides/pallas_guide.md):
  * Grid over row (x) tiles; each program DMAs its tile plus halo rows
    (radius 2 for psi — the del^4 term, radius 1 for zeta) from row-wrap
    pre-padded HBM arrays into VMEM scratch.
  * Column (y) periodicity via in-VMEM lane rotations (pltpu.roll) — the last
    dimension stays exactly P (128-aligned), no column padding.
  * Both layers per program: the layer axis rides along in the DMA.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax import Array
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import ModelConfig


def _col_shift(u: Array, dj: int) -> Array:
    """Value at column j+dj with periodic wrap, as a lane rotation."""
    if dj == 0:
        return u
    return pltpu.roll(u, -dj % u.shape[-1], axis=u.ndim - 1)


# Halo rows carried on each side of a tile. Only 2 are needed numerically
# (del^4), but Mosaic requires 8-aligned (f32 sublane tiling) offsets and
# sizes for memref slices and DMA windows, so the halo is padded to 8.
_H = 8

# Scoped-VMEM limit for the step kernels (explicit CompilerParams on every
# pallas_call). The Mosaic default of 16 MB forces 8-32-row tiles at
# 2048^2-8192^2, paying the 16-halo-row fetch overhead (up to 3x read
# amplification at T = 8) and per-tile stage costs; v5e has 128 MB physical
# VMEM, so the kernels budget against 70% of an explicit 64 MB limit.
_VMEM_LIMIT = 64 * 1024 * 1024
_VMEM_BUDGET = int(0.70 * _VMEM_LIMIT)
_PARAMS = None  # set lazily: pltpu.CompilerParams(vmem_limit_bytes=...)


def _params():
    global _PARAMS
    if _PARAMS is None:
        _PARAMS = pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT)
    return _PARAMS


def _wind_rows(cfg: ModelConfig, T: int, P: int) -> Array:
    """Double-gyre wind PV forcing over a (T, P) tile, computed in-VMEM.

    Same F(y) = -(2 pi tau_0 / (rho_0 H_1 Ly)) sin(2 pi y / Ly) as
    models.core._wind_forcing (y = lane index * dx, constant along x), built
    from a lane iota so the kernel needs no extra operand; f32 sin on the VPU
    agrees with the XLA path's float64-constant row to ~1e-7 relative.
    """
    amp = 2.0 * math.pi * cfg.wind_tau0 / (cfg.rho0 * cfg.H_1 * cfg.Ly)
    coef = 2.0 * math.pi * cfg.dx / cfg.Ly
    # Mosaic's tpu.iota is integer-only; build int32 and convert.
    lane = jax.lax.broadcasted_iota(jnp.int32, (T, P), 1).astype(jnp.float32)
    return -amp * jnp.sin(coef * lane)


def _wind_layer(cfg: ModelConfig, layer: int) -> bool:
    """Wind forcing applies to the single layer or the top of two."""
    return cfg.wind_tau0 != 0.0 and (cfg.n_layers == 1 or layer == 0)


def _fetch_halo_blocking(T: int, M: int, n, i, hbm, vmem, sem_a, sem_b):
    """Blocking tile-halo fetch for the non-pipelined kernels (v1-v3): start
    every DMA for tile i's rows [i*T - H, i*T + T + H) (periodic wrap), then
    wait. Same windows, conditions, and lazily-built thunks as the streamed
    kernel's overlapped fetch — ``_make_halo_fetch_ops`` is the single
    implementation of the choreography."""
    for phase in ("start", "wait"):
        for cond, thunk in _make_halo_fetch_ops(T, M, n, i, hbm, vmem,
                                                sem_a, sem_b):
            if cond is None:
                for cp in thunk():
                    getattr(cp, phase)()
            else:
                @pl.when(cond)
                def _(thunk=thunk, phase=phase):
                    for cp in thunk():
                        getattr(cp, phase)()


def _fetch_center_start(T: int, i, hbm, vmem, sem):
    """Start the halo-free center fetch of tile i (history arrays); returns
    the descriptor for the caller to ``.wait()``."""
    cp = pltpu.make_async_copy(
        hbm.at[:, pl.ds(pl.multiple_of(i * T, 8), T), :], vmem, sem)
    cp.start()
    return cp


def _apply_update(cfg: ModelConfig, step_ref, tend: Array, zc: Array,
                  f1_t: Array, f2_t) -> tuple:
    """One layer's time update: (zeta_new, carry2) under cfg.time_scheme.

    euler_ab3 (reference: src/model.jl:155-170): Euler for steps 0-1 then
    AB3; carry2 is the tendency (the AB3 history entry). leapfrog_ra: f1_t
    holds the Robert-Asselin-filtered zeta^{n-1}, f2_t is unused (may be
    None); carry2 is the filtered current level. Mirrors the XLA branches in
    models.core.make_step_fn exactly.
    """
    dt = cfg.dt
    if cfg.time_scheme == "leapfrog_ra":
        is_first = step_ref[0] == 0
        zpf = jnp.where(is_first, zc, f1_t)
        zn = jnp.where(is_first, zc + dt * tend, zpf + 2.0 * dt * tend)
        filt = zc + cfg.ra_filter * (zpf - 2.0 * zc + zn)
        return zn, filt
    is_euler = step_ref[0] < 2
    ab3 = dt * ((23.0 / 12.0) * tend - (16.0 / 12.0) * f1_t
                + (5.0 / 12.0) * f2_t)
    zn = zc + jnp.where(is_euler, dt * tend, ab3)
    return zn, tend


def _tendency_kernel(cfg: ModelConfig, T: int, M: int, zeta_hbm, psi_hbm,
                     out_ref, zeta_vmem, psi_vmem, sems):
    i = pl.program_id(0)
    n = pl.num_programs(0)
    L = out_ref.shape[0]

    # DMA this tile plus halo rows for all layers at once, handling the
    # periodic row wrap in the copies themselves (no pre-padded HBM copy of
    # the inputs): body rows [i*T - H, i*T + T + H) are fetched as up to three
    # windows — top wrap (from the array's end), body, bottom wrap (from the
    # array's start). Only edge tiles pay the extra two small DMAs.
    _fetch_halo_blocking(T, M, n, i, zeta_hbm, zeta_vmem,
                         sems.at[0], sems.at[1])
    _fetch_halo_blocking(T, M, n, i, psi_hbm, psi_vmem,
                         sems.at[2], sems.at[3])

    for layer in range(L):
        out_ref[layer] = _layer_tendency_shared(
            cfg, T, layer, zeta_vmem[layer][:], psi_vmem[layer][:])


def _pick_tile(M: int, P: int, L: int, itemsize: int) -> int:
    """Largest row-tile T dividing M that fits VMEM (16 MB on v5e).

    Footprint model: 2 halo scratches of L*(T+2H) rows, a double-buffered
    out block of L*T rows, plus ~14 stencil temporaries of T rows per layer
    held on the Mosaic value stack (the Arakawa shifts dominate)."""
    budget = _VMEM_BUDGET
    T = M
    while T > 8:
        foot = P * itemsize * (L * (2 * (T + 2 * _H) + 2 * T) + 14 * T)
        if foot <= budget and M % T == 0:
            return T
        T //= 2
    return T


def pallas_supported(cfg: ModelConfig, dtype) -> bool:
    """The kernel requires 128-aligned columns and a row count that tiles."""
    return (cfg.P % 128 == 0 and cfg.M % 8 == 0
            and jnp.dtype(dtype).itemsize == 4
            and _pick_tile(cfg.M, cfg.P, cfg.n_layers, 4) >= 8)


@functools.partial(jax.jit, static_argnums=(0, 3, 4))
def fused_tendency(cfg: ModelConfig, zeta: Array, psi: Array,
                   interpret: bool = False, tile: int = 0) -> Array:
    """Both layers' d(zeta)/dt in one fused HBM pass.

    Drop-in replacement for the roll-based tendency in
    tpu_qg.models.core._tendencies (same math, same results to roundoff).
    ``tile=0`` auto-picks the row-tile size.
    """
    L, M, P = zeta.shape
    dtype = zeta.dtype
    T = tile or _pick_tile(M, P, L, dtype.itemsize)

    kernel = functools.partial(_tendency_kernel, cfg, T, M)
    return pl.pallas_call(
        kernel,
        grid=(M // T,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
        ],
        out_specs=pl.BlockSpec((L, T, P), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((L, M, P), dtype),
        scratch_shapes=[
            pltpu.VMEM((L, T + 2 * _H, P), dtype),
            pltpu.VMEM((L, T + 2 * _H, P), dtype),
            pltpu.SemaphoreType.DMA((4,)),
        ],
        interpret=interpret,
        compiler_params=_params(),
    )(zeta, psi)


# ---------------------------------------------------------------------------
# v2: tendency + AB3/Euler update + modal projection in one kernel.
# ---------------------------------------------------------------------------

def _pre_inversion_kernel(cfg: ModelConfig, T: int, M: int, step_ref,
                          zeta_hbm, psi_hbm, f1_hbm, f2_hbm,
                          zeta_new_ref, tend_ref, modes_ref,
                          zeta_vmem, psi_vmem, f1_vmem, f2_vmem, sems):
    i = pl.program_id(0)
    n = pl.num_programs(0)
    L = tend_ref.shape[0]

    # Start the halo-free history fetches, then the halo fetches (which wait).
    has_f2 = cfg.time_scheme == "euler_ab3"   # leapfrog_ra never reads f2
    cp_f1 = _fetch_center_start(T, i, f1_hbm, f1_vmem, sems.at[4])
    cp_f2 = (_fetch_center_start(T, i, f2_hbm, f2_vmem, sems.at[5])
             if has_f2 else None)
    _fetch_halo_blocking(T, M, n, i, zeta_hbm, zeta_vmem,
                         sems.at[0], sems.at[1])
    _fetch_halo_blocking(T, M, n, i, psi_hbm, psi_vmem,
                         sems.at[2], sems.at[3])

    tends = [
        _layer_tendency_shared(cfg, T, layer, zeta_vmem[layer][:],
                               psi_vmem[layer][:])
        for layer in range(L)
    ]

    cp_f1.wait()
    if has_f2:
        cp_f2.wait()
    z_new = []
    for layer in range(L):
        f1_t = f1_vmem[layer][:]
        f2_t = f2_vmem[layer][:] if has_f2 else None
        zc = zeta_vmem[layer][:][_H:_H + T, :]
        zn, carry = _apply_update(cfg, step_ref, tends[layer], zc, f1_t, f2_t)
        z_new.append(zn)
        zeta_new_ref[layer] = zn
        tend_ref[layer] = carry

    # Modal projection (reference: src/model.jl:179-182) fused in.
    if cfg.n_layers == 1:
        modes_ref[0] = z_new[0]
    else:
        (pi11, pi12), (pi21, pi22) = cfg.P_inv_matrix()
        modes_ref[0] = pi11 * z_new[0] + pi12 * z_new[1]
        modes_ref[1] = pi21 * z_new[0] + pi22 * z_new[1]


def _layer_tendency_shared(cfg: ModelConfig, T: int, layer: int,
                           z_w: Array, psi_w: Array) -> Array:
    """One layer's RHS over the body rows of (T+2H, P) VMEM tile values.

    ALIGNED formulation (round 4): every stencil neighbour is an explicit
    pltpu.roll of the FULL 8-aligned (T+2H, P) slab — sublane rolls for row
    (x) neighbours, lane rolls for column (y) neighbours, rolls of rolled
    slabs for corners — and the only slice is the final 8-aligned body
    window. The >= 8-row halo absorbs the rolls' circular wrap. Replaces
    the round-3 body built from sublane-MISALIGNED row slices (offset
    _H-1 = 7 and 0/1/2 within), each of which Mosaic lowered to a vector
    relayout per use: the ablation lab measured 0.4605 vs 0.4884 ms/step
    kernel-only at 2048^2 under the amortized 500-step protocol
    (results/stencil_lab_2048.json; the old body is kept as the lab's
    "legacy" variant). Values match the old body to ~5e-8 relative (pure
    roundoff reassociation, tests/test_stencil_lab.py).

    Arakawa three-term average (reference: src/schemes/arakawa.jl:7-62);
    layer terms reference: src/model.jl:139-153.
    """
    dx = cfg.dx
    inv_dx2 = 1.0 / (dx * dx)

    def rup(u):   # value at row r+1 (pltpu.roll shift must be >= 0)
        return pltpu.roll(u, u.shape[0] - 1, axis=0)

    def rdn(u):   # value at row r-1
        return pltpu.roll(u, 1, axis=0)

    def cup(u):   # value at column j+1
        return pltpu.roll(u, u.shape[1] - 1, axis=1)

    def cdn(u):   # value at column j-1
        return pltpu.roll(u, 1, axis=1)

    p, z = psi_w, z_w                        # (T+2H, P) full slabs
    p_up, p_dn = rup(p), rdn(p)
    pp, pm = cup(p), cdn(p)
    lap1 = (p_up + p_dn - 4.0 * p + pp + pm) * inv_dx2
    l_up, l_dn = rup(lap1), rdn(lap1)
    lp, lm = cup(lap1), cdn(lap1)
    visc_full = cfg.visc * ((l_up + l_dn - 4.0 * lap1 + lp + lm) * inv_dx2)

    z_up, z_dn = rup(z), rdn(z)
    zp, zm = cup(z), cdn(z)
    zp_up, zp_dn = rup(zp), rdn(zp)
    zm_up, zm_dn = rup(zm), rdn(zm)
    pp_up, pp_dn = rup(pp), rdn(pp)
    pm_up, pm_dn = rup(pm), rdn(pm)

    j_pp = (z_up - z_dn) * (pp - pm) - (zp - zm) * (p_up - p_dn)
    j_pt = (z_up * (pp_up - pm_up) - z_dn * (pp_dn - pm_dn)
            - zp * (pp_up - pp_dn) + zm * (pm_up - pm_dn))
    j_tp = (zp_up * (pp - p_up) - zm_dn * (p_dn - pm)
            - zp_dn * (pp - p_dn) + zm_up * (p_up - pm))
    jac_full = (j_pp + j_pt + j_tp) / (12.0 * dx * dx)

    dpsi_dx_full = (0.5 / dx) * (p_up - p_dn)
    betas = (cfg.beta,) if cfg.n_layers == 1 else (cfg.beta_1, cfg.beta_2)
    tend = visc_full - jac_full - betas[layer] * dpsi_dx_full

    if cfg.n_layers == 1:
        tend = tend - cfg.U * ((0.5 / dx) * (z_up - z_dn)) - cfg.r * lap1
    elif layer == 0:
        # Layer 1: mean-flow advection (reference: src/model.jl:143).
        tend = tend - cfg.U * ((0.5 / dx) * (z_up - z_dn))
    else:
        # Layer 2: bottom drag (reference: src/model.jl:151).
        tend = tend - cfg.r * lap1
    out = tend[_H:_H + T, :]                 # single 8-aligned body slice
    if _wind_layer(cfg, layer):
        out = out + _wind_rows(cfg, T, out.shape[-1])
    return out


def _step_pre_fft_kernel(cfg: ModelConfig, T: int, M: int, step_ref,
                         zeta_hbm, psi_hbm, f1_hbm, f2_hbm,
                         zeta_new_ref, tend_ref,
                         zeta_vmem, psi_vmem, f1_vmem, f2_vmem, sems):
    """v3: tendency + Euler/AB3 update, shared-rotation stencils, NO modal
    projection output — the PackedModalInverter folds P^{-1}, both elliptic
    solves, and the back-projection into the fft2/ifft2 pair downstream."""
    i = pl.program_id(0)
    n = pl.num_programs(0)
    L = tend_ref.shape[0]

    has_f2 = cfg.time_scheme == "euler_ab3"   # leapfrog_ra never reads f2
    cp_f1 = _fetch_center_start(T, i, f1_hbm, f1_vmem, sems.at[4])
    cp_f2 = (_fetch_center_start(T, i, f2_hbm, f2_vmem, sems.at[5])
             if has_f2 else None)
    _fetch_halo_blocking(T, M, n, i, zeta_hbm, zeta_vmem,
                         sems.at[0], sems.at[1])
    _fetch_halo_blocking(T, M, n, i, psi_hbm, psi_vmem,
                         sems.at[2], sems.at[3])

    tends = [
        _layer_tendency_shared(cfg, T, layer, zeta_vmem[layer][:],
                               psi_vmem[layer][:])
        for layer in range(L)
    ]

    cp_f1.wait()
    if has_f2:
        cp_f2.wait()
    for layer in range(L):
        f1_t = f1_vmem[layer][:]
        f2_t = f2_vmem[layer][:] if has_f2 else None
        zc = zeta_vmem[layer][:][_H:_H + T, :]
        zn, carry = _apply_update(cfg, step_ref, tends[layer], zc, f1_t, f2_t)
        zeta_new_ref[layer] = zn
        tend_ref[layer] = carry


def _make_halo_fetch_ops(T: int, M: int, n, j, hbm, vmem, sem_a, sem_b,
                         top_hbm=None, bot_hbm=None):
    """Build the (condition, copies_thunk) list for fetching tile j's rows
    [j*T - H, j*T + T + H) into ``vmem``. Thunks are built lazily inside the
    taken branch only (an AsyncCopyDescriptor constructed in an untaken
    pl.when branch logs a was-not-used error). The same list is built twice
    per tile — once to .start() the DMAs, once to .wait() them — which is
    what allows the fetch of tile j+1 to overlap tile j's compute.

    Halo source: with ``top_hbm``/``bot_hbm`` None the array is the full
    periodic extent and edge tiles wrap around within ``hbm``; with slab
    operands (the SHARDED form — ``hbm`` is one chip's row block) the edge
    tiles read their halo rows from the (L, H, P) neighbor slabs the caller
    exchanged via ppermute (tpu_qg.parallel.stepper)."""
    sharded = top_hbm is not None

    if n == 1:
        # Single tile covering the whole extent: both halos come from the
        # neighbor slabs (sharded) or wrap around within ``hbm`` (unsharded).
        # top and bot share sem_a — equal byte counts, so the two waits
        # consume exactly the two signals regardless of completion order.
        def single():
            top_src = top_hbm if sharded else hbm.at[:, pl.ds(M - _H, _H), :]
            bot_src = bot_hbm if sharded else hbm.at[:, pl.ds(0, _H), :]
            return [
                pltpu.make_async_copy(top_src, vmem.at[:, 0:_H, :], sem_a),
                pltpu.make_async_copy(hbm, vmem.at[:, _H:_H + T, :], sem_b),
                pltpu.make_async_copy(bot_src, vmem.at[:, T + _H:, :], sem_a),
            ]

        return [(None, single)]

    first, last = j == 0, j == n - 1

    def middle():
        start = pl.multiple_of(j * T - _H, 8)
        return [pltpu.make_async_copy(
            hbm.at[:, pl.ds(start, T + 2 * _H), :], vmem, sem_a)]

    def first_tile():
        top_src = top_hbm if sharded else hbm.at[:, pl.ds(M - _H, _H), :]
        return [
            pltpu.make_async_copy(top_src, vmem.at[:, 0:_H, :], sem_a),
            pltpu.make_async_copy(
                hbm.at[:, pl.ds(0, T + _H), :], vmem.at[:, _H:, :], sem_b),
        ]

    def last_tile():
        bot_src = bot_hbm if sharded else hbm.at[:, pl.ds(0, _H), :]
        return [
            pltpu.make_async_copy(
                hbm.at[:, pl.ds(M - T - _H, T + _H), :],
                vmem.at[:, 0:T + _H, :], sem_a),
            pltpu.make_async_copy(bot_src, vmem.at[:, T + _H:, :], sem_b),
        ]

    return [
        (jnp.logical_not(first | last), middle),
        (first, first_tile),
        (last, last_tile),
    ]


def _streamed_kernel(cfg: ModelConfig, T: int, M: int, sharded: bool,
                     step_ref, *args):
    """v4: v3's shared-rotation stencils + a double-buffered input pipeline.

    Two VMEM slots per input; at grid step i the fetch of tile i+1 (into slot
    (i+1) % 2) is started before waiting on tile i's fetch (started at step
    i-1), so HBM reads overlap the stencil compute of the previous tile.
    Requires grid >= 2 (the single-tile case uses the v3 kernel).

    ``sharded=True`` is the shard_map-local form: M is this chip's row count,
    four extra (L, H, P) operands carry the ppermute-exchanged neighbor row
    slabs, and edge tiles read their halos from those instead of wrapping
    (single-tile grids allowed — the halo is never local then).
    """
    if sharded:
        (zeta_hbm, psi_hbm, f1_hbm, f2_hbm, zt_hbm, zb_hbm, pt_hbm, pb_hbm,
         zeta_new_ref, tend_ref,
         zeta_buf, psi_buf, f1_buf, f2_buf, sems) = args
    else:
        (zeta_hbm, psi_hbm, f1_hbm, f2_hbm,
         zeta_new_ref, tend_ref,
         zeta_buf, psi_buf, f1_buf, f2_buf, sems) = args
        zt_hbm = zb_hbm = pt_hbm = pb_hbm = None
    i = pl.program_id(0)
    n = pl.num_programs(0)
    L = tend_ref.shape[0]

    def halo_ops(j, slot, fld):
        hbm, buf = (zeta_hbm, zeta_buf) if fld == 0 else (psi_hbm, psi_buf)
        top, bot = (zt_hbm, zb_hbm) if fld == 0 else (pt_hbm, pb_hbm)
        return _make_halo_fetch_ops(T, M, n, j, hbm, buf.at[slot],
                                    sems.at[slot, 2 * fld],
                                    sems.at[slot, 2 * fld + 1],
                                    top_hbm=top, bot_hbm=bot)

    def center_ops(j, slot, fld):
        hbm, buf = (f1_hbm, f1_buf) if fld == 0 else (f2_hbm, f2_buf)
        return [(None, lambda: [pltpu.make_async_copy(
            hbm.at[:, pl.ds(pl.multiple_of(j * T, 8), T), :],
            buf.at[slot], sems.at[slot, 4 + fld])])]

    has_f2 = cfg.time_scheme == "euler_ab3"   # leapfrog_ra never reads f2

    def all_ops(j, slot):
        ops = (halo_ops(j, slot, 0) + halo_ops(j, slot, 1)
               + center_ops(j, slot, 0))
        if has_f2:
            ops += center_ops(j, slot, 1)
        return ops

    def _foreach(j, slot, action):
        # Descriptors are (re)built lazily inside each taken branch — the same
        # construction at start and wait time is what lets the two sites pair
        # up on the same semaphores.
        for cond, thunk in all_ops(j, slot):
            if cond is None:
                for cp in thunk():
                    action(cp)
            else:
                @pl.when(cond)
                def _(thunk=thunk):
                    for cp in thunk():
                        action(cp)

    def start_fetch(j, slot):
        _foreach(j, slot, lambda cp: cp.start())

    def wait_fetch(j, slot):
        _foreach(j, slot, lambda cp: cp.wait())

    two = jnp.asarray(2, i.dtype)
    slot = jax.lax.rem(i, two)

    @pl.when(i == 0)
    def _():
        start_fetch(0, 0)

    @pl.when(i + 1 < n)
    def _():
        start_fetch(i + 1, jax.lax.rem(i + 1, two))

    wait_fetch(i, slot)

    def load(buf, layer):
        return buf[pl.ds(slot, 1), layer][0]

    tends = [
        _layer_tendency_shared(cfg, T, layer, load(zeta_buf, layer),
                               load(psi_buf, layer))
        for layer in range(L)
    ]

    for layer in range(L):
        f1_t = load(f1_buf, layer)
        f2_t = load(f2_buf, layer) if has_f2 else None
        zc = load(zeta_buf, layer)[_H:_H + T, :]
        zn, carry = _apply_update(cfg, step_ref, tends[layer], zc, f1_t, f2_t)
        zeta_new_ref[layer] = zn
        tend_ref[layer] = carry


def _pick_tile_v4(M: int, P: int, L: int, itemsize: int) -> int:
    """Tile picker for the streamed kernel: two input slots per array."""
    budget = _VMEM_BUDGET
    T = M
    while T > 8:
        foot = P * itemsize * (
            L * (4 * (T + 2 * _H) + 4 * T + 4 * T) + 16 * T)
        if foot <= budget and M % T == 0:
            return T
        T //= 2
    return T


@functools.partial(jax.jit, static_argnums=(0, 6, 7))
def fused_step_streamed(cfg: ModelConfig, zeta: Array, psi: Array,
                        f1: Array, f2: Array, step: Array,
                        interpret: bool = False, tile: int = 0):
    """Tendency + Euler/AB3 update with a double-buffered HBM input pipeline
    (kernel v4). Same outputs as ``fused_step_pre_fft``; falls back to it when
    the grid has fewer than two tiles."""
    L, M, P = zeta.shape
    dtype = zeta.dtype
    T = tile or _pick_tile_v4(M, P, L, dtype.itemsize)
    if M // T < 2:
        return fused_step_pre_fft(cfg, zeta, psi, f1, f2, step,
                                  interpret, tile)

    kernel = functools.partial(_streamed_kernel, cfg, T, M, False)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(M // T,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM)] * 4,
        out_specs=[
            pl.BlockSpec((L, T, P), lambda i, s: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((L, T, P), lambda i, s: (0, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, L, T + 2 * _H, P), dtype),
            pltpu.VMEM((2, L, T + 2 * _H, P), dtype),
            pltpu.VMEM((2, L, T, P), dtype),
            pltpu.VMEM((2, L, T, P), dtype),
            pltpu.SemaphoreType.DMA((2, 6)),
        ],
    )
    zeta_new, tend = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((L, M, P), dtype),
            jax.ShapeDtypeStruct((L, M, P), dtype),
        ),
        interpret=interpret,
        compiler_params=_params(),
    )(jnp.asarray(step, jnp.int32).reshape(1), zeta, psi, f1, f2)
    return zeta_new, tend


def sharded_pallas_supported(L: int, m: int, P: int, itemsize: int) -> bool:
    """Shape gate for the shard_map-local streamed kernel: 128-aligned lanes,
    8-aligned local rows with at least one full tile, f32."""
    return (P % 128 == 0 and m % 8 == 0 and itemsize == 4
            and _pick_tile_v4(m, P, L, itemsize) >= 8)


@functools.partial(jax.jit, static_argnums=(0, 10, 11))
def fused_step_streamed_sharded(cfg: ModelConfig, zeta: Array, psi: Array,
                                f1: Array, f2: Array, step: Array,
                                zeta_top: Array, zeta_bot: Array,
                                psi_top: Array, psi_bot: Array,
                                interpret: bool = False, tile: int = 0):
    """Shard_map-local form of the v4 streamed step kernel.

    ``zeta``/``psi``/``f1``/``f2`` are one chip's (L, m, P) row blocks of the
    row-sharded global grid; ``*_top``/``*_bot`` are the (L, H, P) neighbor
    row slabs the caller exchanged via ppermute (top = the x-neighbor's LAST
    H rows, bot = the next neighbor's FIRST H rows — the distributed
    counterpart of the unsharded kernel's periodic wrap fetches). Outputs
    (zeta_new, tend) for the local block, identical per point to the
    unsharded kernel on the gathered grid. Single-tile local grids are
    allowed (unlike the unsharded form, the halo is never local)."""
    L, m, P = zeta.shape
    dtype = zeta.dtype
    T = tile or _pick_tile_v4(m, P, L, dtype.itemsize)

    kernel = functools.partial(_streamed_kernel, cfg, T, m, True)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(m // T,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM)] * 8,
        out_specs=[
            pl.BlockSpec((L, T, P), lambda i, s: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((L, T, P), lambda i, s: (0, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, L, T + 2 * _H, P), dtype),
            pltpu.VMEM((2, L, T + 2 * _H, P), dtype),
            pltpu.VMEM((2, L, T, P), dtype),
            pltpu.VMEM((2, L, T, P), dtype),
            pltpu.SemaphoreType.DMA((2, 6)),
        ],
    )
    zeta_new, tend = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((L, m, P), dtype),
            jax.ShapeDtypeStruct((L, m, P), dtype),
        ),
        interpret=interpret,
        compiler_params=_params(),
    )(jnp.asarray(step, jnp.int32).reshape(1), zeta, psi, f1, f2,
      zeta_top, zeta_bot, psi_top, psi_bot)
    return zeta_new, tend


# ---------------------------------------------------------------------------
# v5: v4 + the inversion's y-direction transforms folded in. The psi input
# arrives in PERMUTED y-SPECTRAL form (the symbol+inverse-x kernel's output,
# i.e. the inversion minus its final inverse-y pass) and is inverse-y
# transformed in-VMEM before the stencils; the updated zeta tile is
# forward-y transformed in-VMEM into a third output, feeding the forward-x
# kernel directly. With the fused symbol stage this makes the whole step
# THREE kernel HBM passes (step+y-transforms, forward-x, symbol+inverse-x)
# instead of five — the standalone forward-y and inverse-y field passes
# disappear. Rows transform independently in y, so the halo rows fetched for
# the stencils are inverse-transformed by the same op sequence the standalone
# y-kernel would apply — results are identical per row.
# ---------------------------------------------------------------------------

_VMEM_LIMIT_YF = 96 * 1024 * 1024
_PARAMS_YF = None


def _params_yf():
    global _PARAMS_YF
    if _PARAMS_YF is None:
        _PARAMS_YF = pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT_YF)
    return _PARAMS_YF


def _yfused_kernel(cfg: ModelConfig, T: int, M: int, sharded: bool,
                   ytrans_inv, ytrans_fwd, step_ref,
                   gyi_r_hbm, gyi_i_hbm, gyf_r_hbm, gyf_i_hbm,
                   *args):
    """``sharded=True`` is the shard_map-local form (see _streamed_kernel):
    M is this chip's row count and four extra (L/2, H, P) operands carry the
    ppermute-exchanged neighbor row slabs — zeta slabs in natural space, psi
    slabs in the SAME y-spectral form as the psi operand (the y-transform is
    row-local, so spectral halo rows inverse-transform exactly like body
    rows)."""
    if sharded:
        (zeta_hbm, psi_hbm, f1_hbm, f2_hbm, zt_hbm, zb_hbm, pt_hbm, pb_hbm,
         zeta_new_ref, tend_ref, zys_ref,
         zeta_buf, psi_buf, f1_buf, f2_buf,
         gyi_r_s, gyi_i_s, gyf_r_s, gyf_i_s, sems, gsems) = args
    else:
        (zeta_hbm, psi_hbm, f1_hbm, f2_hbm,
         zeta_new_ref, tend_ref, zys_ref,
         zeta_buf, psi_buf, f1_buf, f2_buf,
         gyi_r_s, gyi_i_s, gyf_r_s, gyf_i_s, sems, gsems) = args
        zt_hbm = zb_hbm = pt_hbm = pb_hbm = None
    i = pl.program_id(0)
    n = pl.num_programs(0)
    L = tend_ref.shape[0]

    # The G constant stacks are DMA'd ONCE (grid steps run sequentially on
    # the core, so VMEM scratch persists) — a BlockSpec operand would re-fetch
    # ~4 MB from HBM on every tile.
    g_pairs = ((gyi_r_hbm, gyi_r_s), (gyi_i_hbm, gyi_i_s),
               (gyf_r_hbm, gyf_r_s), (gyf_i_hbm, gyf_i_s))

    @pl.when(i == 0)
    def _():
        cps = [pltpu.make_async_copy(hbm, vmem, gsems.at[k])
               for k, (hbm, vmem) in enumerate(g_pairs)]
        for cp in cps:
            cp.start()
        for cp in cps:
            cp.wait()

    def halo_ops(j, slot, fld):
        hbm, buf = (zeta_hbm, zeta_buf) if fld == 0 else (psi_hbm, psi_buf)
        top, bot = (zt_hbm, zb_hbm) if fld == 0 else (pt_hbm, pb_hbm)
        return _make_halo_fetch_ops(T, M, n, j, hbm, buf.at[slot],
                                    sems.at[slot, 2 * fld],
                                    sems.at[slot, 2 * fld + 1],
                                    top_hbm=top, bot_hbm=bot)

    def center_ops(j, slot, fld):
        hbm, buf = (f1_hbm, f1_buf) if fld == 0 else (f2_hbm, f2_buf)
        return [(None, lambda: [pltpu.make_async_copy(
            hbm.at[:, pl.ds(pl.multiple_of(j * T, 8), T), :],
            buf.at[slot], sems.at[slot, 4 + fld])])]

    has_f2 = cfg.time_scheme == "euler_ab3"

    def all_ops(j, slot):
        ops = (halo_ops(j, slot, 0) + halo_ops(j, slot, 1)
               + center_ops(j, slot, 0))
        if has_f2:
            ops += center_ops(j, slot, 1)
        return ops

    def _foreach(j, slot, action):
        for cond, thunk in all_ops(j, slot):
            if cond is None:
                for cp in thunk():
                    action(cp)
            else:
                @pl.when(cond)
                def _(thunk=thunk):
                    for cp in thunk():
                        action(cp)

    two = jnp.asarray(2, i.dtype)
    slot = jax.lax.rem(i, two)

    @pl.when(i == 0)
    def _():
        _foreach(0, 0, lambda cp: cp.start())

    @pl.when(i + 1 < n)
    def _():
        _foreach(i + 1, jax.lax.rem(i + 1, two), lambda cp: cp.start())

    _foreach(i, slot, lambda cp: cp.wait())

    def load(buf, plane):
        return buf[pl.ds(slot, 1), plane][0]

    # psi arrives y-spectral (planes = Re, Im of the packed psi_1 + i psi_2
    # field); inverse-y it in-VMEM — halo rows included — to the natural
    # per-layer streamfunction the stencils consume.
    psi_nat = ytrans_inv(load(psi_buf, 0), load(psi_buf, 1),
                         gyi_r_s, gyi_i_s)

    tends = [
        _layer_tendency_shared(cfg, T, layer, load(zeta_buf, layer),
                               psi_nat[layer])
        for layer in range(L)
    ]

    z_new = []
    for layer in range(L):
        f1_t = load(f1_buf, layer)
        f2_t = load(f2_buf, layer) if has_f2 else None
        zc = load(zeta_buf, layer)[_H:_H + T, :]
        zn, carry = _apply_update(cfg, step_ref, tends[layer], zc, f1_t, f2_t)
        z_new.append(zn)
        zeta_new_ref[layer] = zn
        tend_ref[layer] = carry

    # Forward-y the updated packed field w = zeta_1 + i zeta_2 in-VMEM: the
    # third output IS the inversion's y-spectrum, feeding the forward-x
    # kernel without a standalone forward-y field pass.
    zr, zi = ytrans_fwd(z_new[0], z_new[1], gyf_r_s, gyf_i_s)
    zys_ref[0] = zr
    zys_ref[1] = zi


def _pick_tile_yfused(M: int, P: int, L: int, itemsize: int) -> int:
    """Tile picker for the y-fused kernel: v4's footprint plus the in-VMEM
    y-transform temporaries (live chunk pairs + outputs, ~8 plane-rows each
    direction), the third double-buffered output, and the G constant stacks
    (DMA'd once into scratch)."""
    n2y = P // 128
    g_bytes = 4 * n2y * 128 * 128 * 4
    budget = int(0.70 * _VMEM_LIMIT_YF) - g_bytes
    T = M
    while T > 8:
        rows = (L * (4 * (T + 2 * _H) + 4 * T + 6 * T)
                + 16 * T + 8 * (T + 2 * _H) + 8 * T)
        # The streamed double-buffer pipeline needs at least two tiles.
        if P * itemsize * rows <= budget and M % T == 0 and M // T >= 2:
            return T
        T //= 2
    return T


def yfused_supported(cfg: ModelConfig, dtype) -> bool:
    """The y-fused step kernel needs the two-layer planar packing, f32,
    Pallas-FFT-supported y extent, and a multi-tile streamed grid."""
    from .pallas_fft import pallas_fft_supported
    if cfg.n_layers != 2 or jnp.dtype(dtype).itemsize != 4:
        return False
    if cfg.P % 128 != 0 or cfg.M % 8 != 0:
        return False
    if not pallas_fft_supported(cfg.P):
        return False
    T = _pick_tile_yfused(cfg.M, cfg.P, cfg.n_layers, 4)
    return T >= 8 and cfg.M // T >= 2


@functools.partial(jax.jit, static_argnums=(0, 6, 7, 8))
def fused_step_streamed_yspec(cfg: ModelConfig, zeta: Array, psi_ys: Array,
                              f1: Array, f2: Array, step: Array,
                              mxu: str = "highest",
                              interpret: bool = False, tile: int = 0):
    """v5 kernel dispatch: tendency + time update with the psi input consumed
    in permuted y-spectral form and the updated zeta emitted both natural and
    y-spectral. Returns (zeta_new, tend, zeta_ys)."""
    from .pallas_fft import make_y_tile_transform, y_plan_arrays

    L, M, P = zeta.shape
    dtype = zeta.dtype
    assert L == 2
    T = tile or _pick_tile_yfused(M, P, L, dtype.itemsize)
    n2y = P // 128

    ytrans_inv = make_y_tile_transform(P, inverse=True, mxu=mxu)
    ytrans_fwd = make_y_tile_transform(P, inverse=False, mxu=mxu)

    gyi_r, gyi_i = y_plan_arrays(P, True)
    gyf_r, gyf_i = y_plan_arrays(P, False)

    kernel = functools.partial(_yfused_kernel, cfg, T, M, False,
                               ytrans_inv, ytrans_fwd)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(M // T,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM)] * 8,
        out_specs=[
            pl.BlockSpec((L, T, P), lambda i, s: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((L, T, P), lambda i, s: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((L, T, P), lambda i, s: (0, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, L, T + 2 * _H, P), dtype),
            pltpu.VMEM((2, L, T + 2 * _H, P), dtype),
            pltpu.VMEM((2, L, T, P), dtype),
            pltpu.VMEM((2, L, T, P), dtype),
            pltpu.VMEM((n2y, 128, 128), dtype),
            pltpu.VMEM((n2y, 128, 128), dtype),
            pltpu.VMEM((n2y, 128, 128), dtype),
            pltpu.VMEM((n2y, 128, 128), dtype),
            pltpu.SemaphoreType.DMA((2, 6)),
            pltpu.SemaphoreType.DMA((4,)),
        ],
    )
    zeta_new, tend, zeta_ys = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((L, M, P), dtype),
            jax.ShapeDtypeStruct((L, M, P), dtype),
            jax.ShapeDtypeStruct((L, M, P), dtype),
        ),
        interpret=interpret,
        compiler_params=_params_yf(),
    )(jnp.asarray(step, jnp.int32).reshape(1),
      gyi_r, gyi_i, gyf_r, gyf_i, zeta, psi_ys, f1, f2)
    return zeta_new, tend, zeta_ys


def sharded_yfused_supported(L: int, m: int, P: int, itemsize: int) -> bool:
    """Shape gate for the shard_map-local v5 kernel: two-layer f32,
    Pallas-FFT-supported y extent, 8-aligned local rows with at least one
    full tile (single-tile local grids allowed — the halo comes from slabs)."""
    from .pallas_fft import pallas_fft_supported
    return (L == 2 and itemsize == 4 and P % 128 == 0 and m % 8 == 0
            and pallas_fft_supported(P)
            and _pick_tile_yfused(m, P, L, itemsize) >= 8)


@functools.partial(jax.jit, static_argnums=(0, 10, 11, 12))
def fused_step_streamed_yspec_sharded(cfg: ModelConfig, zeta: Array,
                                      psi_ys: Array, f1: Array, f2: Array,
                                      step: Array,
                                      zeta_top: Array, zeta_bot: Array,
                                      psi_top: Array, psi_bot: Array,
                                      mxu: str = "highest",
                                      interpret: bool = False,
                                      tile: int = 0):
    """Shard_map-local v5 dispatch: the chain's step kernel on one chip's
    (L, m, P) row block. zeta/f1/f2 slabs are natural-space rows; psi slabs
    are rows of the y-SPECTRAL psi operand (ppermute the internal-form psi —
    the y-transform is row-local). Returns (zeta_new, carry, zeta_ys) for
    the local block, identical per point to the unsharded v5 kernel."""
    from .pallas_fft import make_y_tile_transform, y_plan_arrays

    L, m, P = zeta.shape
    dtype = zeta.dtype
    assert L == 2
    T = tile or _pick_tile_yfused(m, P, L, dtype.itemsize)
    n2y = P // 128

    ytrans_inv = make_y_tile_transform(P, inverse=True, mxu=mxu)
    ytrans_fwd = make_y_tile_transform(P, inverse=False, mxu=mxu)
    gyi_r, gyi_i = y_plan_arrays(P, True)
    gyf_r, gyf_i = y_plan_arrays(P, False)

    kernel = functools.partial(_yfused_kernel, cfg, T, m, True,
                               ytrans_inv, ytrans_fwd)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(m // T,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM)] * 12,
        out_specs=[
            pl.BlockSpec((L, T, P), lambda i, s: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((L, T, P), lambda i, s: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((L, T, P), lambda i, s: (0, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, L, T + 2 * _H, P), dtype),
            pltpu.VMEM((2, L, T + 2 * _H, P), dtype),
            pltpu.VMEM((2, L, T, P), dtype),
            pltpu.VMEM((2, L, T, P), dtype),
            pltpu.VMEM((n2y, 128, 128), dtype),
            pltpu.VMEM((n2y, 128, 128), dtype),
            pltpu.VMEM((n2y, 128, 128), dtype),
            pltpu.VMEM((n2y, 128, 128), dtype),
            pltpu.SemaphoreType.DMA((2, 6)),
            pltpu.SemaphoreType.DMA((4,)),
        ],
    )
    zeta_new, tend, zeta_ys = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((L, m, P), dtype),
            jax.ShapeDtypeStruct((L, m, P), dtype),
            jax.ShapeDtypeStruct((L, m, P), dtype),
        ),
        interpret=interpret,
        compiler_params=_params_yf(),
    )(jnp.asarray(step, jnp.int32).reshape(1),
      gyi_r, gyi_i, gyf_r, gyf_i, zeta, psi_ys, f1, f2,
      zeta_top, zeta_bot, psi_top, psi_bot)
    return zeta_new, tend, zeta_ys


def _pick_tile_v3(M: int, P: int, L: int, itemsize: int) -> int:
    """Tile picker for the v3 kernel: v2's footprint minus the modes output,
    plus the six column-rotated slabs held live per layer."""
    budget = _VMEM_BUDGET
    T = M
    while T > 8:
        foot = P * itemsize * (
            L * (2 * (T + 2 * _H) + 2 * T + 4 * T) + 16 * T)
        if foot <= budget and M % T == 0:
            return T
        T //= 2
    return T


@functools.partial(jax.jit, static_argnums=(0, 6, 7))
def fused_step_pre_fft(cfg: ModelConfig, zeta: Array, psi: Array,
                       f1: Array, f2: Array, step: Array,
                       interpret: bool = False, tile: int = 0):
    """Tendency + Euler/AB3 zeta update in one HBM pass (kernel v3).

    Returns (zeta_new, tend). Unlike ``fused_pre_inversion`` (v2) there is no
    modal-projection output: pairing with
    tpu_qg.ops.spectral.PackedModalInverter moves the projection and
    back-projection into the spectral symbols, saving one (K, M, P) HBM write
    + read per step and the physical-space projection arithmetic.
    """
    L, M, P = zeta.shape
    dtype = zeta.dtype
    T = tile or _pick_tile_v3(M, P, L, dtype.itemsize)

    kernel = functools.partial(_step_pre_fft_kernel, cfg, T, M)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(M // T,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM)] * 4,
        out_specs=[
            pl.BlockSpec((L, T, P), lambda i, s: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((L, T, P), lambda i, s: (0, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((L, T + 2 * _H, P), dtype),
            pltpu.VMEM((L, T + 2 * _H, P), dtype),
            pltpu.VMEM((L, T, P), dtype),
            pltpu.VMEM((L, T, P), dtype),
            pltpu.SemaphoreType.DMA((6,)),
        ],
    )
    zeta_new, tend = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((L, M, P), dtype),
            jax.ShapeDtypeStruct((L, M, P), dtype),
        ),
        interpret=interpret,
        compiler_params=_params(),
    )(jnp.asarray(step, jnp.int32).reshape(1), zeta, psi, f1, f2)
    return zeta_new, tend


def _pick_tile_v2(M: int, P: int, L: int, itemsize: int) -> int:
    """Tile picker for the fused pre-inversion kernel: adds f1/f2 scratches and
    three double-buffered outputs to the v1 footprint model."""
    budget = _VMEM_BUDGET
    T = M
    while T > 8:
        foot = P * itemsize * (
            L * (2 * (T + 2 * _H) + 2 * T + 6 * T) + 14 * T)
        if foot <= budget and M % T == 0:
            return T
        T //= 2
    return T


@functools.partial(jax.jit, static_argnums=(0, 6, 7))
def fused_pre_inversion(cfg: ModelConfig, zeta: Array, psi: Array,
                        f1: Array, f2: Array, step: Array,
                        interpret: bool = False, tile: int = 0):
    """Tendency + Euler/AB3 zeta update + modal projection in one HBM pass.

    Returns (zeta_new, tend, modes): everything the step needs before the
    spectral inversion. Replaces the separate tendency kernel plus ~5 XLA
    elementwise passes (reference counterparts: src/model.jl:123-136 update and
    :179-182 projection).
    """
    L, M, P = zeta.shape
    dtype = zeta.dtype
    T = tile or _pick_tile_v2(M, P, L, dtype.itemsize)
    K = 1 if cfg.n_layers == 1 else 2

    kernel = functools.partial(_pre_inversion_kernel, cfg, T, M)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(M // T,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM)] * 4,
        out_specs=[
            pl.BlockSpec((L, T, P), lambda i, s: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((L, T, P), lambda i, s: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, T, P), lambda i, s: (0, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((L, T + 2 * _H, P), dtype),
            pltpu.VMEM((L, T + 2 * _H, P), dtype),
            pltpu.VMEM((L, T, P), dtype),
            pltpu.VMEM((L, T, P), dtype),
            pltpu.SemaphoreType.DMA((6,)),
        ],
    )
    zeta_new, tend, modes = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((L, M, P), dtype),
            jax.ShapeDtypeStruct((L, M, P), dtype),
            jax.ShapeDtypeStruct((K, M, P), dtype),
        ),
        interpret=interpret,
        compiler_params=_params(),
    )(jnp.asarray(step, jnp.int32).reshape(1), zeta, psi, f1, f2)
    return zeta_new, tend, modes
