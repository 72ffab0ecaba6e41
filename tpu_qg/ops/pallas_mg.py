"""Pallas fused smoother for the multigrid V-cycle (round 5).

The XLA V(2,2) cycle at 2048^2 costs ~14 field passes of HBM traffic as
separate fused-expression sweeps (measured 0.30 ms per Jacobi sweep vs a
0.13 ms floor, plus per-op overheads at every level —
results/mg_probe_2048_c500.json). This kernel streams row tiles once and
performs ``nu`` damped-Jacobi sweeps IN VMEM (plus, optionally, the
residual for restriction), so the fine level's pre-smooth + residual
becomes ONE pass over u and f (4 planes in, 4 out for K = 2 modes) instead
of nu+1 passes.

Same choreography as the v4 streamed step kernel
(ops/pallas_tendency.py): double-buffered manual DMA of (K, T+2H, P)
windows with _H = 8 halo rows fetched circularly; row neighbors are
pltpu.roll of the 8-aligned slab (the >= 8-row halo absorbs the circular
wrap for the <= 3 rows of validity each sweep consumes — the ALIGNED-body
trick), column neighbors are lane rolls (periodic: single-device form).

Arithmetic: the cancellation-robust difference form of ops/multigrid.py
(sum of (neighbor - center)); the V-cycle's fixed point is set by the
fine-level residual, so kernel-vs-XLA rounding differences wash out of the
converged answer (tests compare at f32 roundoff).

Reference counterpart: the backsolve part of the per-step elliptic solve
(src/schemes/laplacian.jl:60-75) — this is its communication-avoiding
TPU-native replacement's hot loop.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import Array
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_tendency import _H, _make_halo_fetch_ops

_MAX_NU_RES = _H - 1            # validity rows consumed: nu sweeps + residual

# The MG smoother budgets against a 96 MB scoped-VMEM limit (v5e has
# 128 MB physical; the step kernels use 64 MB — pallas_tendency._VMEM_LIMIT).
# At 8192^2 the 64 MB budget forced T=32 tiles whose 2x8 halo rows triple
# the u-read amplification: the measured marginal V-cycle was 46.2 ms
# (2.7x the 2048^2 area scaling, results/decomp_r5_mgk_8192.json); the
# 96 MB budget admits T=64 (25% amplification).
_VMEM_LIMIT_MG = 96 * 1024 * 1024
_VMEM_BUDGET_MG = int(0.70 * _VMEM_LIMIT_MG)
_PARAMS_MG = None


def _params():
    global _PARAMS_MG
    if _PARAMS_MG is None:
        _PARAMS_MG = pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT_MG)
    return _PARAMS_MG


def mg_smooth_supported(K: int, M: int, P: int, nu: int,
                        residual: bool, restrict: bool = False) -> bool:
    """Shape gate: 128-lane columns, 8-aligned rows with at least two
    tiles, and enough halo validity for nu sweeps (+ residual). The
    in-kernel restriction form additionally needs P % 256 (paired-block
    lane selection) and T % 16 (8-aligned half-row output tiles)."""
    if P % 128 or M % 8 or M < 128:
        return False
    if nu + (1 if residual else 0) > _MAX_NU_RES:
        return False
    T = _pick_tile_mg(M, P, K)
    if T <= 0:
        return False
    if restrict and (P % 256 or T % 16 or not residual):
        return False
    return True


def mg_prolong_supported(K: int, M: int, P: int, nu: int) -> bool:
    """Gate for the fused coarse-correction + post-smooth kernel."""
    if not mg_smooth_supported(K, M, P, nu, False):
        return False
    T = _pick_tile_mg(M, P, K)
    return P % 256 == 0 and T % 16 == 0


def _footprint_mg(T: int, P: int, K: int) -> int:
    """Scoped-VMEM estimate: double-buffered u/f windows, two output
    buffers each for u_out and r, ~5 slab temporaries per mode pass."""
    slab = (T + 2 * _H) * P * 4
    bufs = 2 * K * slab * 2                 # u + f, 2 slots each
    outs = 2 * 2 * K * T * P * 4            # <= 2 outputs, double-buffered
    temps = 5 * slab
    return bufs + outs + temps


def _pick_tile_mg(M: int, P: int, K: int) -> int:
    for T in (256, 128, 64, 32, 16, 8):
        if (M % T == 0 and M // T >= 2
                and _footprint_mg(T, P, K) <= _VMEM_BUDGET_MG):
            return T
    return 0


def _rup(u):
    return pltpu.roll(u, u.shape[0] - 1, axis=0)    # value at row r+1


def _rdn(u):
    return pltpu.roll(u, 1, axis=0)                 # value at row r-1


def _cup(u):
    return pltpu.roll(u, u.shape[1] - 1, axis=1)    # value at column j+1


def _cdn(u):
    return pltpu.roll(u, 1, axis=1)                 # value at column j-1


def _lap_alpha_slab(w, inv_dx2, alpha):
    """(lap + alpha) w over the full slab (difference form), valid on all
    rows except the outermost (circular-wrap) ring."""
    lap = (((_rup(w) - w) + (_rdn(w) - w))
           + ((_cup(w) - w) + (_cdn(w) - w))) * inv_dx2
    return lap + alpha * w


def _restrict_tile(r_full, T: int, P: int):
    """Full-weighting restriction of the slab's center rows, in-VMEM:
    separable [1,2,1] filters as rolls, then even-index selection as
    iota-built MXU matmuls — rows via a (T/2, T+2H) left selector, lanes
    via a (256, 128) paired-block selector (pairing two 128-lane source
    blocks keeps every store 128-lane aligned). Exact (0/1 selectors at
    HIGHEST precision); kills the separate XLA restrict pass whose
    relayouts cost 16.7 ms at 8192^2 (results/mg_probe_8192_c60.json)."""
    hi = jax.lax.Precision.HIGHEST
    r_w = 0.25 * _rup(r_full) + 0.5 * r_full + 0.25 * _rdn(r_full)
    rows = r_full.shape[0]                         # T + 2H
    ri = jax.lax.broadcasted_iota(jnp.int32, (T // 2, rows), 0)
    rb = jax.lax.broadcasted_iota(jnp.int32, (T // 2, rows), 1)
    rsel = (rb == _H + 2 * ri).astype(r_full.dtype)
    rh = jax.lax.dot(rsel, r_w, precision=hi)      # (T/2, P)
    rh = 0.25 * _cdn(rh) + 0.5 * rh + 0.25 * _cup(rh)
    cb = jax.lax.broadcasted_iota(jnp.int32, (256, 128), 0)
    cj = jax.lax.broadcasted_iota(jnp.int32, (256, 128), 1)
    csel = (cb == 2 * cj).astype(r_full.dtype)
    cols = [jax.lax.dot(rh[:, c * 256:(c + 1) * 256], csel, precision=hi)
            for c in range(P // 256)]
    return jnp.concatenate(cols, axis=1)           # (T/2, P/2)


def _mg_kernel(K: int, T: int, M: int, P: int, nu: int, residual: bool,
               restrict: bool, inv_dx2: float, alphas: Tuple[float, ...],
               omega: float, step_ref, *args):
    if residual:
        (u_hbm, f_hbm, u_out, r_out, u_buf, f_buf, sems) = args
    else:
        (u_hbm, f_hbm, u_out, u_buf, f_buf, sems) = args
    i = pl.program_id(0)
    n = pl.num_programs(0)

    def ops(j, slot):
        return (_make_halo_fetch_ops(T, M, n, j, u_hbm, u_buf.at[slot],
                                     sems.at[slot, 0], sems.at[slot, 1])
                + _make_halo_fetch_ops(T, M, n, j, f_hbm, f_buf.at[slot],
                                       sems.at[slot, 2], sems.at[slot, 3]))

    def _foreach(j, slot, action):
        for cond, thunk in ops(j, slot):
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

    for k in range(K):
        w = u_buf[pl.ds(slot, 1), k][0]            # (T+2H, P)
        fv = f_buf[pl.ds(slot, 1), k][0]
        a = alphas[k]
        diag = -4.0 * inv_dx2 + a
        for _ in range(nu):
            r_s = fv - _lap_alpha_slab(w, inv_dx2, a)
            w = w + (omega / diag) * r_s
        u_out[k] = w[_H:_H + T, :]
        if residual:
            r_full = fv - _lap_alpha_slab(w, inv_dx2, a)
            if restrict:
                r_out[k] = _restrict_tile(r_full, T, P)
            else:
                r_out[k] = r_full[_H:_H + T, :]


def _prolong_tile(ec_slab, T: int, P: int, dtype):
    """Bilinear prolongation of the coarse slab onto THIS tile's full
    fine slab rows [jT - H, jT + T + H), in-VMEM: rows via an iota-built
    (T+2H, T/2+2H) expansion matmul (fine slab row r maps to coarse
    q = floor((r - H)/2) relative rows, all within the 8-row coarse
    halo), lanes via the block-diagonal even/odd expansion selectors
    (exact mirrors of the restriction's halving selectors)."""
    hi = jax.lax.Precision.HIGHEST
    rows_f = T + 2 * _H
    rows_c = T // 2 + 2 * _H
    rb = jax.lax.broadcasted_iota(jnp.int32, (rows_f, rows_c), 0)
    cb = jax.lax.broadcasted_iota(jnp.int32, (rows_f, rows_c), 1)
    g = rb - _H                       # fine row relative to tile start
    q = (g - (g % 2)) // 2            # floor(g / 2)
    even = (g % 2) == 0
    hit0 = cb == _H + q
    hit1 = cb == _H + q + 1
    er = (jnp.where(even & hit0, 1.0, 0.0)
          + jnp.where(~even & (hit0 | hit1), 0.5, 0.0)).astype(dtype)
    v = jax.lax.dot(er, ec_slab, precision=hi)     # (T+2H, P/2)
    h = 0.5 * (v + _cup(v))
    b2 = jax.lax.broadcasted_iota(jnp.int32, (128, 256), 0)
    j2 = jax.lax.broadcasted_iota(jnp.int32, (128, 256), 1)
    e_even = (j2 == 2 * b2).astype(dtype)
    e_odd = (j2 == 2 * b2 + 1).astype(dtype)
    blocks = [
        jax.lax.dot(v[:, c * 128:(c + 1) * 128], e_even, precision=hi)
        + jax.lax.dot(h[:, c * 128:(c + 1) * 128], e_odd, precision=hi)
        for c in range(P // 256)
    ]
    return jnp.concatenate(blocks, axis=1)         # (T+2H, P)


def _mg_prolong_kernel(K: int, T: int, M: int, P: int, nu: int,
                       inv_dx2: float, alphas: Tuple[float, ...],
                       omega: float, step_ref, *args):
    (u_hbm, f_hbm, ec_hbm, u_out, u_buf, f_buf, ec_buf, sems) = args
    i = pl.program_id(0)
    n = pl.num_programs(0)

    def ops(j, slot):
        return (_make_halo_fetch_ops(T, M, n, j, u_hbm, u_buf.at[slot],
                                     sems.at[slot, 0], sems.at[slot, 1])
                + _make_halo_fetch_ops(T, M, n, j, f_hbm, f_buf.at[slot],
                                       sems.at[slot, 2], sems.at[slot, 3])
                + _make_halo_fetch_ops(T // 2, M // 2, n, j, ec_hbm,
                                       ec_buf.at[slot],
                                       sems.at[slot, 4], sems.at[slot, 5]))

    def _foreach(j, slot, action):
        for cond, thunk in ops(j, slot):
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

    for k in range(K):
        w = u_buf[pl.ds(slot, 1), k][0]
        fv = f_buf[pl.ds(slot, 1), k][0]
        ec = ec_buf[pl.ds(slot, 1), k][0]          # (T/2 + 2H, P/2)
        a = alphas[k]
        diag = -4.0 * inv_dx2 + a
        w = w + _prolong_tile(ec, T, P, w.dtype)
        for _ in range(nu):
            r_s = fv - _lap_alpha_slab(w, inv_dx2, a)
            w = w + (omega / diag) * r_s
        u_out[k] = w[_H:_H + T, :]


@functools.partial(jax.jit, static_argnums=(3, 4, 5, 6, 7))
def mg_prolong_smooth(u2: Array, ec: Array, f: Array, dx: float,
                      alphas: Tuple[float, ...], nu: int = 2,
                      omega: float = 0.8, interpret: bool = False):
    """Coarse-correction + ``nu`` post-smooth sweeps in ONE streamed HBM
    pass: u_out = smooth^nu(u2 + prolong(ec), f). The prolonged
    correction is built per tile in VMEM (see _prolong_tile) so the
    full-resolution e never touches HBM (the XLA prolong pass measured
    11.6 ms at 8192^2, results/mg_probe_8192_c60.json)."""
    K, M, P = u2.shape
    assert ec.shape == (K, M // 2, P // 2)
    dtype = u2.dtype
    T = _pick_tile_mg(M, P, K)
    assert T > 0 and T % 16 == 0 and P % 256 == 0
    assert nu <= _MAX_NU_RES

    kernel = functools.partial(
        _mg_prolong_kernel, K, T, M, P, nu, float(1.0 / (dx * dx)),
        tuple(float(a) for a in alphas), float(omega))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(M // T,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM)] * 3,
        out_specs=[pl.BlockSpec((K, T, P), lambda i, s: (0, i, 0),
                                memory_space=pltpu.MemorySpace.VMEM)],
        scratch_shapes=[
            pltpu.VMEM((2, K, T + 2 * _H, P), dtype),
            pltpu.VMEM((2, K, T + 2 * _H, P), dtype),
            pltpu.VMEM((2, K, T // 2 + 2 * _H, P // 2), dtype),
            pltpu.SemaphoreType.DMA((2, 6)),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(jax.ShapeDtypeStruct((K, M, P), dtype),),
        interpret=interpret or jax.default_backend() != "tpu",
        compiler_params=_params(),
    )(jnp.zeros((1,), jnp.int32), u2, f, ec)[0]


@functools.partial(jax.jit,
                   static_argnums=(2, 3, 4, 5, 6, 7, 8))
def mg_smooth(u: Array, f: Array, dx: float, alphas: Tuple[float, ...],
              nu: int = 2, residual: bool = True, omega: float = 0.8,
              interpret: bool = False, restrict: bool = False):
    """``nu`` damped-Jacobi sweeps of (lap + alpha_k) u_k = f_k in ONE
    streamed HBM pass; returns (u_smoothed, residual_or_None).
    ``restrict=True`` (requires residual) returns the FULL-WEIGHTING
    RESTRICTED residual (K, M/2, P/2) instead — the whole pre-smooth +
    residual + restriction stage in one pass (see _restrict_tile)."""
    K, M, P = u.shape
    assert alphas and len(alphas) == K
    assert not restrict or residual
    dtype = u.dtype
    T = _pick_tile_mg(M, P, K)
    assert T > 0 and nu + (1 if residual else 0) <= _MAX_NU_RES
    assert not restrict or (P % 256 == 0 and T % 16 == 0)

    kernel = functools.partial(
        _mg_kernel, K, T, M, P, nu, residual, restrict,
        float(1.0 / (dx * dx)),
        tuple(float(a) for a in alphas), float(omega))
    out_specs = [pl.BlockSpec((K, T, P), lambda i, s: (0, i, 0),
                              memory_space=pltpu.MemorySpace.VMEM)]
    out_shape = [jax.ShapeDtypeStruct((K, M, P), dtype)]
    if residual:
        if restrict:
            out_specs = out_specs + [pl.BlockSpec(
                (K, T // 2, P // 2), lambda i, s: (0, i, 0),
                memory_space=pltpu.MemorySpace.VMEM)]
            out_shape = out_shape + [
                jax.ShapeDtypeStruct((K, M // 2, P // 2), dtype)]
        else:
            out_specs = out_specs * 2
            out_shape = out_shape * 2
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(M // T,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM)] * 2,
        out_specs=out_specs,
        scratch_shapes=[
            pltpu.VMEM((2, K, T + 2 * _H, P), dtype),
            pltpu.VMEM((2, K, T + 2 * _H, P), dtype),
            pltpu.SemaphoreType.DMA((2, 4)),
        ],
    )
    outs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=tuple(out_shape),
        interpret=interpret or jax.default_backend() != "tpu",
        compiler_params=_params(),
    )(jnp.zeros((1,), jnp.int32), u, f)
    if residual:
        return outs[0], outs[1]
    return outs[0], None
