"""The ENTIRE model step as ONE Pallas kernel launch (kernel v6).

Round-3 evidence: the default step is FOUR kernel launches (v4 streamed
tendency+update, forward-y, mirror-pair x-stage, inverse-y), is compute- not
HBM-bound at 2048^2, and runs ~12% below the repo's own 4096^2 per-point rate
— consistent with a fixed per-launch cost that 4096^2 amortizes 4x better
(VERDICT round 3 items 1, 5). The monolithic inversion kernel
(pallas_fft._build_mono_kernel) already shows the whole inversion fits one
launch at 2048^2-class sizes; this module goes the rest of the way: the
stencil phase AND the inversion share one launch, one grid, one VMEM
residency.

Structure (grid = (M // T,) row tiles, sequential on the core):

  every invocation i (stencil phase — v4's double-buffered input pipeline):
      fetch tile i's zeta/psi/f1/f2 (+ periodic halo wraps) while tile i-1
      computes; shared-rotation stencils (pallas_tendency
      ._layer_tendency_shared) + Euler/AB3/leapfrog update
      (._apply_update); write zeta_new and carry tiles (BlockSpec outputs);
      forward-y transform the packed tile w = zeta_1 + i zeta_2 in-VMEM
      (pallas_fft.make_y_tile_transform — rows transform independently) and
      deposit it into a VMEM-persistent (2, M, P) field scratch.
  last invocation (inversion phase, all VMEM-resident):
      mirror-pair x-stage (forward-x both strips of each pair, packed
      symbols from iotas, inverse-x — identical per-block op sequence to
      _build_mono_kernel / _build_pair_x_kernel, so psi matches the 3-pass
      path EXACTLY) via fori_loop over the n2y//2+1 pairs; inverse-y via
      fori_loop over row tiles; one DMA of the field to the psi output.

HBM traffic per step: read zeta+psi+f1(+f2) + write zeta_new+carry+psi = 14
planes (~235 MB at 2048^2) vs ~26 plane-passes for the 4-launch default; and
exactly ONE kernel launch per model step.

Reference counterpart: the whole of evolve_zeta! + evolve_psi!
(/root/reference/src/model.jl:123-199) per step.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import Array
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import ModelConfig
from .pallas_fft import (_N1, _cdot, _chunk_dft, _pdot, _perm_matrices,
                         _pick_rows, _plan, _symbols_for_block,
                         make_y_tile_transform, pallas_fft_supported,
                         y_plan_arrays)
from .pallas_tendency import (_H, _apply_update, _layer_tendency_shared,
                              _make_halo_fetch_ops)

# The kernel manages every buffer explicitly and keeps the whole packed
# field VMEM-resident; budget against the 128 MB physical VMEM with
# headroom for Mosaic's own scratch.
_VMEM_LIMIT_FULL = 112 * 1024 * 1024
_VMEM_TARGET_FULL = int(0.80 * _VMEM_LIMIT_FULL)
_PARAMS_FULL = None


def _params_full():
    global _PARAMS_FULL
    if _PARAMS_FULL is None:
        _PARAMS_FULL = pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT_FULL)
    return _PARAMS_FULL


def _footprint_full(M: int, P: int, T: int) -> int:
    """Explicit VMEM model: resident field + v4-style double-buffered input
    pipeline + double-buffered BlockSpec outputs + the 8 G constant stacks +
    the larger of the two inversion phases' live sets (x-pair: ~8
    strip-equivalents; y: ~8 row-tile plane-rows) + y-transform temporaries
    of the stencil phase (~8 plane-rows of T)."""
    L = 2
    field = 2 * M * P * 4
    in_bufs = 2 * L * (2 * (T + 2 * _H) + 2 * T) * P * 4
    out_bufs = 2 * 2 * L * T * P * 4
    g = 2 * 2 * ((M // _N1) + (P // _N1)) * _N1 * _N1 * 4
    strip = 2 * M * _N1 * 4
    ylive = 8 * max(_pick_rows(M, P), T) * P * 4
    stencil_tmp = 16 * T * P * 4
    return (field + in_bufs + out_bufs + g
            + max(8 * strip, ylive) + stencil_tmp)


def _pick_tile_full(M: int, P: int) -> int:
    """Largest row tile T dividing M with a >= 2-tile grid (the input
    pipeline needs it) whose footprint fits the budget."""
    T = M // 2
    while T > 8:
        if _footprint_full(M, P, T) <= _VMEM_TARGET_FULL and M % T == 0:
            return T
        T //= 2
    return T


def fullstep_fits(M: int, P: int) -> bool:
    """Shape gate for the one-launch step kernel: two-layer f32 packing,
    Pallas-FFT-supported extents, whole 128-lane strips, and the resident
    field + working sets inside the explicit VMEM budget (2048^2-class —
    the field alone is 134 MB at 4096^2)."""
    if not (pallas_fft_supported(M) and pallas_fft_supported(P)):
        return False
    if P % _N1 != 0 or M % 8 != 0:
        return False
    T = _pick_tile_full(M, P)
    return T >= 8 and M // T >= 2 and \
        _footprint_full(M, P, T) <= _VMEM_TARGET_FULL


def fullstep_supported(cfg: ModelConfig, dtype) -> bool:
    return (cfg.n_layers == 2 and cfg.poisson_gauge == "zero_mean"
            and jnp.dtype(dtype).itemsize == 4
            and fullstep_fits(cfg.M, cfg.P))


def _fullstep_kernel(cfg: ModelConfig, T: int, M: int, P: int, consts,
                     mxu: str, R: int, step_ref,
                     gyf_r_hbm, gyf_i_hbm, gyi_r_hbm, gyi_i_hbm,
                     gxf_r_hbm, gxf_i_hbm, gxi_r_hbm, gxi_i_hbm,
                     zeta_hbm, psi_hbm, f1_hbm, f2_hbm,
                     zeta_new_ref, tend_ref, psi_out_hbm,
                     zeta_buf, psi_buf, f1_buf, f2_buf, field,
                     gyf_r, gyf_i, gyi_r, gyi_i,
                     gxf_r, gxf_i, gxi_r, gxi_i,
                     sems, gsems, osem):
    i = pl.program_id(0)
    n = pl.num_programs(0)
    L = 2
    N2x, _, _, _ = _plan(M, "x", False)
    n2y = P // _N1
    ytrans_fwd = make_y_tile_transform(P, inverse=False, mxu=mxu)
    ytrans_inv = make_y_tile_transform(P, inverse=True, mxu=mxu)

    # G constant stacks: DMA'd ONCE (grid invocations run sequentially, so
    # VMEM scratch persists) — BlockSpec operands would re-fetch ~8 MB per
    # tile (see pallas_tendency._yfused_kernel).
    g_pairs = ((gyf_r_hbm, gyf_r), (gyf_i_hbm, gyf_i),
               (gyi_r_hbm, gyi_r), (gyi_i_hbm, gyi_i),
               (gxf_r_hbm, gxf_r), (gxf_i_hbm, gxf_i),
               (gxi_r_hbm, gxi_r), (gxi_i_hbm, gxi_i))

    @pl.when(i == 0)
    def _():
        cps = [pltpu.make_async_copy(hbm, vmem, gsems.at[k])
               for k, (hbm, vmem) in enumerate(g_pairs)]
        for cp in cps:
            cp.start()
        for cp in cps:
            cp.wait()

    # ---- stencil phase: v4's double-buffered input pipeline ----
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
        _layer_tendency_shared(cfg, T, layer, load(zeta_buf, layer),
                               load(psi_buf, layer))
        for layer in range(L)
    ]

    z_new = []
    for layer in range(L):
        f1_t = load(f1_buf, layer)
        f2_t = load(f2_buf, layer) if has_f2 else None
        zc = load(zeta_buf, layer)[_H:_H + T, :]
        zn, carry = _apply_update(cfg, step_ref, tends[layer], zc, f1_t,
                                  f2_t)
        z_new.append(zn)
        zeta_new_ref[layer] = zn
        tend_ref[layer] = carry

    # Forward-y the packed tile in-VMEM into the resident field: plane 0/1
    # hold Re/Im of fft_y(zeta_1 + i zeta_2) for these rows.
    yr, yi = ytrans_fwd(z_new[0], z_new[1], gyf_r, gyf_i)
    r0 = pl.multiple_of(i * T, 8)
    field[0, pl.ds(r0, T), :] = yr
    field[1, pl.ds(r0, T), :] = yi

    # ---- inversion phase (last invocation; everything VMEM-resident) ----
    @pl.when(i == n - 1)
    def _():
        jflip, jroll = _perm_matrices()

        def load_strip(j):
            off = pl.multiple_of(j * _N1, _N1)
            return (field[0, :, pl.ds(off, _N1)],
                    field[1, :, pl.ds(off, _N1)])

        def blk(arr, c):
            return arr[c * _N1:(c + 1) * _N1, :]

        def fwd(xr, xi):
            smalls = _chunk_dft([(blk(xr, s), blk(xi, s))
                                 for s in range(N2x)], -1)
            return [
                _cdot(sr, si, gxf_r[c], gxf_i[c], left=True, mxu=mxu)
                for c, (sr, si) in enumerate(smalls)
            ]

        def invert(W, Wm, jstrip):
            jlane = jnp.where(jstrip == 0, jroll, jflip)
            WmL = [(_pdot(wr, jlane), _pdot(wi, jlane)) for wr, wi in Wm]
            pairs = []
            for c in range(N2x):
                r = (-c) % N2x
                jrow = jroll if c == 0 else jflip
                wnr = _pdot(WmL[r][0], jrow, left=True)
                wni = _pdot(WmL[r][1], jrow, left=True)
                ar, ai, br, bi = _symbols_for_block(M, P, c, jstrip, consts)
                wr_, wi_ = W[c]
                vr = ar * wr_ - ai * wi_ + br * wnr + bi * wni
                vi = ai * wr_ + ar * wi_ + bi * wnr - br * wni
                pairs.append(_cdot(vr, vi, gxi_r[c], gxi_i[c], left=True,
                                   mxu=mxu))
            return _chunk_dft(pairs, +1, 1.0 / N2x)

        def store_strip(V, j):
            off = pl.multiple_of(j * _N1, _N1)
            for c in range(N2x):
                sr, si = V[c]
                field[0, c * _N1:(c + 1) * _N1, pl.ds(off, _N1)] = sr
                field[1, c * _N1:(c + 1) * _N1, pl.ds(off, _N1)] = si

        def pair_body(p, carry):
            a = p
            b = jax.lax.rem(jnp.asarray(n2y, p.dtype) - p,
                            jnp.asarray(n2y, p.dtype))
            Wa = fwd(*load_strip(a))
            Wb = fwd(*load_strip(b))
            Va = invert(Wa, Wb, a)
            Vb = invert(Wb, Wa, b)
            store_strip(Va, a)

            @pl.when(b != a)
            def _():
                store_strip(Vb, b)

            return carry

        jax.lax.fori_loop(0, n2y // 2 + 1, pair_body, 0)

        def yrow_body(t, carry):
            r0 = pl.multiple_of(t * R, 8)
            vr, vi = ytrans_inv(field[0, pl.ds(r0, R), :],
                                field[1, pl.ds(r0, R), :], gyi_r, gyi_i)
            field[0, pl.ds(r0, R), :] = vr
            field[1, pl.ds(r0, R), :] = vi
            return carry

        jax.lax.fori_loop(0, M // R, yrow_body, 0)

        cp = pltpu.make_async_copy(field, psi_out_hbm, osem.at[0])
        cp.start()
        cp.wait()


@functools.partial(jax.jit, static_argnums=(0, 6, 7, 8))
def fused_step_full(cfg: ModelConfig, zeta: Array, psi: Array,
                    f1: Array, f2: Array, step: Array,
                    mxu: str = "highest", interpret: bool = False,
                    tile: int = 0):
    """One model step — tendency, time update, AND the whole zeta -> psi
    inversion — in ONE kernel launch. Returns (zeta_new, carry, psi_new);
    identical per point to fused_step_streamed followed by the pair-x packed
    inversion (the same op sequence per block). Caller must check
    ``fullstep_supported``."""
    from ..ops.matmul_fft import split_factor

    L, M, P = zeta.shape
    dtype = zeta.dtype
    assert L == 2
    T = tile or _pick_tile_full(M, P)
    R = _pick_rows(M, P)
    n2y = P // _N1

    # Packed-inversion symbol constants (as ops.spectral builds them).
    from ..ops.spectral import PackedModalInverter
    tmp = PackedModalInverter(M, P, cfg.dx, cfg.S_eig, cfg.P_inv_matrix(),
                              cfg.back_projection_matrix())
    consts = (split_factor(M)[1], split_factor(P)[1],
              1.0 / (cfg.dx * cfg.dx), float(cfg.S_eig),
              tmp.a1, tmp.a2, tmp.b1, tmp.b2)

    gyf_r, gyf_i = y_plan_arrays(P, False)
    gyi_r, gyi_i = y_plan_arrays(P, True)
    _, _, gxf_r, gxf_i = _plan(M, "x", False)
    _, _, gxi_r, gxi_i = _plan(M, "x", True)
    gxf_r, gxf_i = jnp.asarray(gxf_r), jnp.asarray(gxf_i)
    gxi_r, gxi_i = jnp.asarray(gxi_r), jnp.asarray(gxi_i)
    n2x = gxf_r.shape[0]

    kernel = functools.partial(_fullstep_kernel, cfg, T, M, P, consts, mxu,
                               R)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(M // T,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM)] * 12,
        out_specs=[
            pl.BlockSpec((L, T, P), lambda i, s: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((L, T, P), lambda i, s: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, L, T + 2 * _H, P), dtype),
            pltpu.VMEM((2, L, T + 2 * _H, P), dtype),
            pltpu.VMEM((2, L, T, P), dtype),
            pltpu.VMEM((2, L, T, P), dtype),
            pltpu.VMEM((2, M, P), dtype),
            pltpu.VMEM((n2y, _N1, _N1), dtype),
            pltpu.VMEM((n2y, _N1, _N1), dtype),
            pltpu.VMEM((n2y, _N1, _N1), dtype),
            pltpu.VMEM((n2y, _N1, _N1), dtype),
            pltpu.VMEM((n2x, _N1, _N1), dtype),
            pltpu.VMEM((n2x, _N1, _N1), dtype),
            pltpu.VMEM((n2x, _N1, _N1), dtype),
            pltpu.VMEM((n2x, _N1, _N1), dtype),
            pltpu.SemaphoreType.DMA((2, 6)),
            pltpu.SemaphoreType.DMA((8,)),
            pltpu.SemaphoreType.DMA((1,)),
        ],
    )
    zeta_new, tend, psi_new = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((L, M, P), dtype),
            jax.ShapeDtypeStruct((L, M, P), dtype),
            jax.ShapeDtypeStruct((L, M, P), dtype),
        ),
        interpret=interpret or jax.default_backend() != "tpu",
        compiler_params=_params_full(),
    )(jnp.asarray(step, jnp.int32).reshape(1),
      gyf_r, gyf_i, gyi_r, gyi_i, gxf_r, gxf_i, gxi_r, gxi_i,
      zeta, psi, f1, f2)
    return zeta_new, tend, psi_new
