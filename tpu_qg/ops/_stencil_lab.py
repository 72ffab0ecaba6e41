"""Stencil-kernel ablation lab (round 4, NOT a production path).

The v4 streamed step kernel measures 0.9385 ms/step at 2048^2 (kernel-only,
50-step protocol, results/decomp_r4_2048_c50.json) against a 0.245 ms HBM
floor — ~3.8x off. The compute body (_layer_tendency_shared) is built from
lane rotations (pltpu.roll) and SUBLANE-MISALIGNED row slices (the halo
slabs are sliced at offset _H-1 = 7 and again at 0/1/2 within), each of
which Mosaic lowers to vector relayouts. This module reimplements the
streamed kernel with a pluggable tendency body so the relayout cost can be
measured by ablation on the real chip (scripts/stencil_lab.py):

  base     the production body (_layer_tendency_shared, the ALIGNED form
           since round 4) — parity anchor
  norot    the aligned body with every pltpu.roll replaced by identity
           (WRONG results; times the body minus all sublane+lane
           rotations). ADVICE r4: the previous norot monkey-patched
           _col_shift around the production body, which no longer calls
           it — it silently timed the full body. Rebuilt from the
           aligned body's roll helpers.
  noslice  row-neighbor slices replaced by the center slice (WRONG
           results; times the legacy body minus the misaligned-slice
           relayouts)
  nojac    Arakawa term dropped (removes 4 of 6 rotations + ~1/2 the VPU
           arithmetic; still uses misaligned slices for visc)
  aligned  CORRECT body restructured so every slice is 8-aligned: row
           (sublane) neighbors come from pltpu.roll(axis=0) on the full
           (T+2H, P) slab (the >= 8-row halo makes the circular wrap
           harmless for body rows), corners from rolls of rolled slabs —
           20 explicit rolls per layer, zero misaligned slices.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import Array
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import ModelConfig
from .pallas_tendency import (_H, _apply_update, _layer_tendency_shared,
                              _make_halo_fetch_ops, _params,
                              _pick_tile_v4)


def _body_base(cfg, T, layer, z_w, psi_w):
    return _layer_tendency_shared(cfg, T, layer, z_w, psi_w)


def _body_legacy(cfg, T, layer, z_w, psi_w):
    """The round-3 production body (verbatim): stencil neighbours as
    sublane-misaligned row slices of six column-rotated slabs. Kept for
    on-chip comparison after the aligned body became production
    (_layer_tendency_shared) — measured 0.4884 vs 0.4605 ms/step
    kernel-only at 2048^2, c500 protocol."""
    from .pallas_tendency import _col_shift, _wind_layer, _wind_rows
    dx = cfg.dx
    inv_dx2 = 1.0 / (dx * dx)

    zc = z_w[_H - 1:_H + T + 1, :]          # (T+2, P) 1-row-halo slabs
    pc = psi_w[_H - 1:_H + T + 1, :]
    zp, zm = _col_shift(zc, 1), _col_shift(zc, -1)
    pp, pm = _col_shift(pc, 1), _col_shift(pc, -1)

    lap1 = (psi_w[_H:_H + T + 2, :] + psi_w[_H - 2:_H + T, :] - 4.0 * pc
            + pp + pm) * inv_dx2            # (T+2, P)
    lp, lm = _col_shift(lap1, 1), _col_shift(lap1, -1)
    visc_term = cfg.visc * ((lap1[2:T + 2, :] + lap1[0:T, :]
                             - 4.0 * lap1[1:T + 1, :]
                             + lp[1:T + 1, :] + lm[1:T + 1, :]) * inv_dx2)
    lap_psi = lap1[1:T + 1, :]

    def S(a, di):
        return a[1 + di:1 + di + T, :]

    z_xp, z_xm, z_yp, z_ym = S(zc, 1), S(zc, -1), S(zp, 0), S(zm, 0)
    p_xp, p_xm, p_yp, p_ym = S(pc, 1), S(pc, -1), S(pp, 0), S(pm, 0)
    z_xpyp, z_xpym, z_xmyp, z_xmym = S(zp, 1), S(zm, 1), S(zp, -1), S(zm, -1)
    p_xpyp, p_xpym, p_xmyp, p_xmym = S(pp, 1), S(pm, 1), S(pp, -1), S(pm, -1)

    j_pp = (z_xp - z_xm) * (p_yp - p_ym) - (z_yp - z_ym) * (p_xp - p_xm)
    j_pt = (z_xp * (p_xpyp - p_xpym) - z_xm * (p_xmyp - p_xmym)
            - z_yp * (p_xpyp - p_xmyp) + z_ym * (p_xpym - p_xmym))
    j_tp = (z_xpyp * (p_yp - p_xp) - z_xmym * (p_xm - p_ym)
            - z_xmyp * (p_yp - p_xm) + z_xpym * (p_xp - p_ym))
    jac = (j_pp + j_pt + j_tp) / (12.0 * dx * dx)

    dpsi_dx = (0.5 / dx) * (S(pc, 1) - S(pc, -1))
    betas = (cfg.beta,) if cfg.n_layers == 1 else (cfg.beta_1, cfg.beta_2)
    tend = visc_term - jac - betas[layer] * dpsi_dx

    if cfg.n_layers == 1:
        dzeta_dx = (0.5 / dx) * (S(zc, 1) - S(zc, -1))
        tend = tend - cfg.U * dzeta_dx - cfg.r * lap_psi
    elif layer == 0:
        dzeta_dx = (0.5 / dx) * (S(zc, 1) - S(zc, -1))
        tend = tend - cfg.U * dzeta_dx
    else:
        tend = tend - cfg.r * lap_psi
    if _wind_layer(cfg, layer):
        tend = tend + _wind_rows(cfg, T, tend.shape[-1])
    return tend


def _body_noslice(cfg, T, layer, z_w, psi_w):
    """Row-neighbor slices -> center slice (ablates the misaligned-slice
    relayouts; arithmetic count unchanged, results WRONG)."""
    from .pallas_tendency import _col_shift, _wind_layer, _wind_rows
    dx = cfg.dx
    inv_dx2 = 1.0 / (dx * dx)
    zc = z_w[_H:_H + T, :]              # 8-aligned center slices only
    pc = psi_w[_H:_H + T, :]
    zp, zm = _col_shift(zc, 1), _col_shift(zc, -1)
    pp, pm = _col_shift(pc, 1), _col_shift(pc, -1)
    lap1 = (pc + pc - 4.0 * pc + pp + pm) * inv_dx2
    lp, lm = _col_shift(lap1, 1), _col_shift(lap1, -1)
    visc_term = cfg.visc * ((lap1 + lap1 - 4.0 * lap1 + lp + lm) * inv_dx2)
    lap_psi = lap1

    z_xp, z_xm, z_yp, z_ym = zc, zc, zp, zm
    p_xp, p_xm, p_yp, p_ym = pc, pc, pp, pm
    z_xpyp, z_xpym, z_xmyp, z_xmym = zp, zm, zp, zm
    p_xpyp, p_xpym, p_xmyp, p_xmym = pp, pm, pp, pm

    j_pp = (z_xp - z_xm) * (p_yp - p_ym) - (z_yp - z_ym) * (p_xp - p_xm)
    j_pt = (z_xp * (p_xpyp - p_xpym) - z_xm * (p_xmyp - p_xmym)
            - z_yp * (p_xpyp - p_xmyp) + z_ym * (p_xpym - p_xmym))
    j_tp = (z_xpyp * (p_yp - p_xp) - z_xmym * (p_xm - p_ym)
            - z_xmyp * (p_yp - p_xm) + z_xpym * (p_xp - p_ym))
    jac = (j_pp + j_pt + j_tp) / (12.0 * dx * dx)

    dpsi_dx = (0.5 / dx) * (pc - pc)
    betas = (cfg.beta,) if cfg.n_layers == 1 else (cfg.beta_1, cfg.beta_2)
    tend = visc_term - jac - betas[layer] * dpsi_dx
    if layer == 0 and cfg.n_layers == 2:
        tend = tend - cfg.U * ((0.5 / dx) * (zc - zc))
    else:
        tend = tend - cfg.r * lap_psi
    if _wind_layer(cfg, layer):
        tend = tend + _wind_rows(cfg, T, tend.shape[-1])
    return tend


def _body_nojac(cfg, T, layer, z_w, psi_w):
    from .pallas_tendency import _col_shift, _wind_layer, _wind_rows
    dx = cfg.dx
    inv_dx2 = 1.0 / (dx * dx)
    pc = psi_w[_H - 1:_H + T + 1, :]
    pp, pm = _col_shift(pc, 1), _col_shift(pc, -1)
    lap1 = (psi_w[_H:_H + T + 2, :] + psi_w[_H - 2:_H + T, :] - 4.0 * pc
            + pp + pm) * inv_dx2
    lp, lm = _col_shift(lap1, 1), _col_shift(lap1, -1)
    visc_term = cfg.visc * ((lap1[2:T + 2, :] + lap1[0:T, :]
                             - 4.0 * lap1[1:T + 1, :]
                             + lp[1:T + 1, :] + lm[1:T + 1, :]) * inv_dx2)
    lap_psi = lap1[1:T + 1, :]

    def S(a, di):
        return a[1 + di:1 + di + T, :]

    dpsi_dx = (0.5 / dx) * (S(pc, 1) - S(pc, -1))
    betas = (cfg.beta,) if cfg.n_layers == 1 else (cfg.beta_1, cfg.beta_2)
    tend = visc_term - betas[layer] * dpsi_dx
    if layer == 0 and cfg.n_layers == 2:
        zc = z_w[_H - 1:_H + T + 1, :]
        tend = tend - cfg.U * ((0.5 / dx) * (S(zc, 1) - S(zc, -1)))
    else:
        tend = tend - cfg.r * lap_psi
    if _wind_layer(cfg, layer):
        tend = tend + _wind_rows(cfg, T, tend.shape[-1])
    return tend


def _body_aligned(cfg, T, layer, z_w, psi_w, roll=pltpu.roll):
    """CORRECT restructured body: row neighbors via sublane rolls on the
    full 8-aligned slab, 8-aligned slices everywhere. Produces the same
    values as _layer_tendency_shared (the >= 8-row halo absorbs the
    circular wrap). ``roll`` is pluggable so the norot ablation can
    replace every rotation with identity while keeping the arithmetic."""
    from .pallas_tendency import _wind_layer, _wind_rows
    dx = cfg.dx
    inv_dx2 = 1.0 / (dx * dx)

    def rup(u):   # value at row r+1 (shift must be non-negative)
        return roll(u, u.shape[0] - 1, axis=0)

    def rdn(u):   # value at row r-1
        return roll(u, 1, axis=0)

    def cup(u):   # value at column j+1
        return roll(u, u.shape[1] - 1, axis=1)

    def cdn(u):
        return roll(u, 1, axis=1)

    p, z = psi_w, z_w                    # (T+2H, P) full slabs
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
        tend = tend - cfg.U * ((0.5 / dx) * (z_up - z_dn)) \
            - cfg.r * lap1
    elif layer == 0:
        tend = tend - cfg.U * ((0.5 / dx) * (z_up - z_dn))
    else:
        tend = tend - cfg.r * lap1
    out = tend[_H:_H + T, :]             # single 8-aligned body slice
    if _wind_layer(cfg, layer):
        out = out + _wind_rows(cfg, T, out.shape[-1])
    return out


def _body_norot(cfg, T, layer, z_w, psi_w):
    """Aligned body with every rotation ablated to identity (WRONG
    results — times the body minus all sublane+lane rolls)."""
    return _body_aligned(cfg, T, layer, z_w, psi_w,
                         roll=lambda u, shift, axis: u)


BODIES = {
    "base": _body_base,        # the production body (aligned since round 4)
    "legacy": _body_legacy,    # the round-3 slice-based body
    "norot": _body_norot,
    "noslice": _body_noslice,
    "nojac": _body_nojac,
    "aligned": _body_aligned,
}


def _lab_kernel(cfg: ModelConfig, T: int, M: int, body, step_ref, *args):
    (zeta_hbm, psi_hbm, f1_hbm, f2_hbm,
     zeta_new_ref, tend_ref,
     zeta_buf, psi_buf, f1_buf, f2_buf, sems) = args
    i = pl.program_id(0)
    n = pl.num_programs(0)
    L = tend_ref.shape[0]

    def halo_ops(j, slot, fld):
        hbm, buf = (zeta_hbm, zeta_buf) if fld == 0 else (psi_hbm, psi_buf)
        return _make_halo_fetch_ops(T, M, n, j, hbm, buf.at[slot],
                                    sems.at[slot, 2 * fld],
                                    sems.at[slot, 2 * fld + 1])

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

    def load(buf, layer):
        return buf[pl.ds(slot, 1), layer][0]

    tends = [
        body(cfg, T, layer, load(zeta_buf, layer), load(psi_buf, layer))
        for layer in range(L)
    ]

    for layer in range(L):
        f1_t = load(f1_buf, layer)
        f2_t = load(f2_buf, layer) if has_f2 else None
        zc = load(zeta_buf, layer)[_H:_H + T, :]
        zn, carry = _apply_update(cfg, step_ref, tends[layer], zc, f1_t,
                                  f2_t)
        zeta_new_ref[layer] = zn
        tend_ref[layer] = carry


@functools.partial(jax.jit, static_argnums=(0, 6, 7, 8))
def lab_step(cfg: ModelConfig, zeta: Array, psi: Array, f1: Array,
             f2: Array, step: Array, variant: str = "base",
             interpret: bool = False, tile: int = 0):
    """The v4 streamed step with the tendency body swapped per ``variant``
    (see BODIES). Returns (zeta_new, carry)."""
    L, M, P = zeta.shape
    dtype = zeta.dtype
    T = tile or _pick_tile_v4(M, P, L, dtype.itemsize)
    assert M // T >= 2

    kernel = functools.partial(_lab_kernel, cfg, T, M, BODIES[variant])
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
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((L, M, P), dtype),
            jax.ShapeDtypeStruct((L, M, P), dtype),
        ),
        interpret=interpret or jax.default_backend() != "tpu",
        compiler_params=_params(),
    )(jnp.asarray(step, jnp.int32).reshape(1), zeta, psi, f1, f2)
