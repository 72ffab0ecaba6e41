"""Paired-strip distributed packed inversion: 2/3 of the companion scheme's
all_to_all traffic, no redundant mirror forward.

The companion scheme (tpu_qg.parallel.packed) ships the y-spectrum AND a
pre-mirrored copy through the transpose (4 planes out + 2 back = 6 planes of
ICI traffic per inversion) because the mirror strip of a chip's local strip
generally lives on another chip. The scaling projection
(scripts/weak_scaling_projection.py) shows the transposes own the multi-chip
budget, so this module removes the companion: a LOCAL pre-permutation of the
128-lane strips orders them as mirror PAIRS

    [0, n2y/2 | 1, n2y-1 | 2, n2y-2 | ...]

so the standard ``lax.all_to_all`` hands each chip whole pair-groups. The
x-stage kernel then pairs strips locally exactly like the single-chip
mirror-pair kernel (pallas_fft._build_pair_x_kernel), with the global strip
indices delivered by scalar prefetch (the symbols need them) — each strip is
forward-transformed ONCE, nothing mirrors over the wire, and the transposes
carry 2 planes out + 2 back.

Group 0 packs the two SELF-mirror strips (0 and n2y/2): each is its own
mirror, selected in-kernel with a traced flag (mirror(a) == a).

Constraints: P % (nx * 256) == 0 (each chip must receive whole pairs) on top
of the packed scheme's divisibility; supported in both the BlockSpec form
and a manual-DMA streaming form (M = 8192).

Reference counterpart: the same ``evolve_psi!`` solve
(/root/reference/src/model.jl:172-199) the packed inverter distributes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import Array, lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ops.pallas_fft import (_N1, _VMEM_LIMIT, _VMEM_LIMIT_STREAM_PAIR,
                              _VMEM_TARGET, _VMEM_TARGET_STREAM_PAIR,
                              _cdot, _chunk_dft, _pdot, _perm_matrices,
                              _plan, _symbols_for_block, _x_blockspec_fits,
                              planar_fft2_fits)
from ..ops.spectral import PackedModalInverter


def strip_pair_order(n2y: int) -> np.ndarray:
    """Permuted strip order grouping mirrors: [0, n2y/2, 1, n2y-1, 2,
    n2y-2, ...] (n2y even). Position 2g/2g+1 hold group g's strips."""
    assert n2y % 2 == 0, n2y
    order = [0, n2y // 2]
    for j in range(1, n2y // 2):
        order += [j, n2y - j]
    return np.asarray(order)


def paired_supported(M: int, P: int, nx: int, itemsize: int = 4) -> bool:
    """Shape gate: the packed divisibility plus whole PAIRS per chip
    (P % (nx * 256) == 0), and the BlockSpec kernel form for the
    (2, M, 256) group blocks. The STREAMING form (M = 8192) is gated OFF
    on hardware evidence: its per-group live set (two strips' worth of
    forward/mirror/combine values) exceeds v5e VMEM at compile
    (results/stream_probe_8192_nx8.json — paired_stream fails while the
    companion scheme's one-strip streaming kernel compiles fine, so 8192^2
    pods ride tpu_qg.parallel.packed). The interpret-mode kernel and tests
    remain; re-enable only with a passing on-chip probe."""
    if itemsize != 4 or M % nx != 0 or P % (nx * 2 * _N1) != 0:
        return False
    if (M // nx) % 8 != 0 or not planar_fft2_fits(M, P):
        return False
    if not _x_blockspec_fits(M, P):
        return False
    # Same live-set class as pair_x_fits, on (2, M, 256) blocks.
    strip = 2 * M * _N1 * 4
    g_plane = (M // _N1) * _N1 * _N1 * 4
    return 16 * strip + 8 * g_plane <= _VMEM_TARGET


def _pair_group_body(M, P, N2, consts, mxu, gfr, gfi, gir, gii,
                     a, b, xa, xb):
    """Forward both strips of one mirror group, apply the packed symbols
    with each as the other's mirror (or itself for the self-mirror group),
    inverse-transform. Returns (Va, Vb) as lists of (real, imag) blocks.
    Same per-block op sequence as pallas_fft._build_pair_x_kernel."""
    jflip, jroll = _perm_matrices()
    is_self = ((jnp.asarray(P // _N1, a.dtype) - a)
               % jnp.asarray(P // _N1, a.dtype)) == a

    def blk(arr, c):
        return arr[c * _N1:(c + 1) * _N1, :]

    def fwd(xr, xi):
        smalls = _chunk_dft([(blk(xr, s), blk(xi, s))
                             for s in range(N2)], -1)
        return [
            _cdot(sr, si, gfr[c], gfi[c], left=True, mxu=mxu)
            for c, (sr, si) in enumerate(smalls)
        ]

    Wa = fwd(*xa)
    Wb = fwd(*xb)
    # Mirror spectra: group partner, or self for the self-mirror group.
    WmA = [(jnp.where(is_self, ar, br), jnp.where(is_self, ai, bi))
           for (ar, ai), (br, bi) in zip(Wa, Wb)]
    WmB = [(jnp.where(is_self, br, ar), jnp.where(is_self, bi, ai))
           for (ar, ai), (br, bi) in zip(Wa, Wb)]

    def invert(W, Wm, jstrip):
        jlane = jnp.where(jstrip == 0, jroll, jflip)
        WmL = [(_pdot(wr, jlane), _pdot(wi, jlane)) for wr, wi in Wm]
        pairs = []
        for c in range(N2):
            r = (-c) % N2
            jrow = jroll if c == 0 else jflip
            wnr = _pdot(WmL[r][0], jrow, left=True)
            wni = _pdot(WmL[r][1], jrow, left=True)
            ar, ai, br, bi = _symbols_for_block(M, P, c, jstrip, consts)
            wr_, wi_ = W[c]
            vr = ar * wr_ - ai * wi_ + br * wnr + bi * wni
            vi = ai * wr_ + ar * wi_ + bi * wnr - br * wni
            pairs.append(_cdot(vr, vi, gir[c], gii[c], left=True, mxu=mxu))
        return _chunk_dft(pairs, +1, 1.0 / N2)

    return invert(Wa, WmA, a), invert(Wb, WmB, b)


def _build_paired_kernel(M: int, P: int, consts, mxu: str = "highest"):
    """BlockSpec form: grid over local pair groups; block = (2, M, 256)
    (the group's two strips, adjacent in the permuted layout); global strip
    indices via scalar prefetch."""
    N2, _, _, _ = _plan(M, "x", False)

    def kernel(idx_ref, gfr, gfi, gir, gii, x_ref, o_ref):
        i = pl.program_id(0)
        a = idx_ref[2 * i]
        b = idx_ref[2 * i + 1]
        xa = (x_ref[0, :, 0:_N1], x_ref[1, :, 0:_N1])
        xb = (x_ref[0, :, _N1:2 * _N1], x_ref[1, :, _N1:2 * _N1])
        Va, Vb = _pair_group_body(M, P, N2, consts, mxu, gfr, gfi,
                                  gir, gii, a, b, xa, xb)
        for c in range(N2):
            o_ref[0, c * _N1:(c + 1) * _N1, 0:_N1] = Va[c][0]
            o_ref[1, c * _N1:(c + 1) * _N1, 0:_N1] = Va[c][1]
            o_ref[0, c * _N1:(c + 1) * _N1, _N1:2 * _N1] = Vb[c][0]
            o_ref[1, c * _N1:(c + 1) * _N1, _N1:2 * _N1] = Vb[c][1]

    return kernel


def _build_paired_kernel_stream(M: int, P: int, consts,
                                mxu: str = "highest"):
    """Streaming form (M = 8192): manual single-buffered DMA of each
    (2, M, 256) group block; staged output DMA overlapped with the next
    group's compute."""
    N2, _, _, _ = _plan(M, "x", False)
    W2 = 2 * _N1

    def kernel(idx_ref, gfr, gfi, gir, gii, x_hbm, o_ref, in_buf, stage,
               sems):
        i = pl.program_id(0)
        n = pl.num_programs(0)
        a = idx_ref[2 * i]
        b = idx_ref[2 * i + 1]

        cp_in = pltpu.make_async_copy(
            x_hbm.at[:, :, pl.ds(i * W2, W2)], in_buf, sems.at[0])
        cp_in.start()
        cp_in.wait()

        @pl.when(i > 0)
        def _():
            pltpu.make_async_copy(
                stage, o_ref.at[:, :, pl.ds((i - 1) * W2, W2)],
                sems.at[1]).wait()

        xa = (in_buf[0, :, 0:_N1], in_buf[1, :, 0:_N1])
        xb = (in_buf[0, :, _N1:W2], in_buf[1, :, _N1:W2])
        Va, Vb = _pair_group_body(M, P, N2, consts, mxu, gfr, gfi,
                                  gir, gii, a, b, xa, xb)
        for c in range(N2):
            stage[0, c * _N1:(c + 1) * _N1, 0:_N1] = Va[c][0]
            stage[1, c * _N1:(c + 1) * _N1, 0:_N1] = Va[c][1]
            stage[0, c * _N1:(c + 1) * _N1, _N1:W2] = Vb[c][0]
            stage[1, c * _N1:(c + 1) * _N1, _N1:W2] = Vb[c][1]

        cp_o = pltpu.make_async_copy(
            stage, o_ref.at[:, :, pl.ds(i * W2, W2)], sems.at[1])
        cp_o.start()

        @pl.when(i == n - 1)
        def _():
            cp_o.wait()

    return kernel


class PairedDistributedInverter(PackedModalInverter):
    """Sharded zeta -> psi inversion shipping mirror PAIRS instead of a
    companion (see module docstring). Same constructor contract as
    DistributedPackedInverter; call inside shard_map on an (nx, 1) mesh."""

    def __init__(self, M: int, P: int, dx: float, alpha2: float,
                 P_inv, P_back, axis_x: str = "x",
                 interpret: bool = False, mxu: str = "highest",
                 stream_x: bool = None):
        super().__init__(M, P, dx, alpha2, P_inv, P_back)
        from ..ops.matmul_fft import split_factor
        from ..ops.pallas_fft import PlanarFFT2
        self._pfft = PlanarFFT2(M, P, interpret=interpret, mxu=mxu,
                                stream_x=stream_x)
        self._mxu = mxu
        self._sym_consts = (
            split_factor(M)[1], split_factor(P)[1],
            1.0 / (dx * dx), float(alpha2),
            self.a1, self.a2, self.b1, self.b2)
        self.ax = axis_x
        n2y = P // _N1
        self._order = strip_pair_order(n2y)
        self._inv_order = np.argsort(self._order)
        self._kern_cache = {}

    def _call_paired_kernel(self, X: Array, groups_idx: Array) -> Array:
        """Run the pair-group x-stage on a local (2, M, 2*128*g) block in
        permuted pair order; ``groups_idx`` (2g,) int32 holds the global
        strip index of each local strip."""
        M = self.M
        cols = X.shape[2]
        ngroups = cols // (2 * _N1)
        gfr, gfi = self._pfft._G[("x", False)]
        gir, gii = self._pfft._G[("x", True)]
        n2x = gfr.shape[0]
        stream = self._pfft._stream_x
        key = ("paired", stream)
        if key not in self._kern_cache:
            build = (_build_paired_kernel_stream if stream
                     else _build_paired_kernel)
            self._kern_cache[key] = build(M, self.P, self._sym_consts,
                                          mxu=self._mxu)
        if stream:
            gspec = pl.BlockSpec((n2x, _N1, _N1), lambda i, s: (0, 0, 0))
            hspec = pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM)
            grid_spec = pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(ngroups,),
                in_specs=[gspec, gspec, gspec, gspec, hspec],
                out_specs=hspec,
                scratch_shapes=[
                    pltpu.VMEM((2, M, 2 * _N1), X.dtype),
                    pltpu.VMEM((2, M, 2 * _N1), X.dtype),
                    pltpu.SemaphoreType.DMA((2,)),
                ],
            )
            return pl.pallas_call(
                self._kern_cache[key],
                grid_spec=grid_spec,
                out_shape=jax.ShapeDtypeStruct(X.shape, X.dtype),
                interpret=self._pfft.interpret,
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=_VMEM_LIMIT_STREAM_PAIR),
            )(jnp.asarray(groups_idx, jnp.int32), gfr, gfi, gir, gii, X)
        gspec = pl.BlockSpec((n2x, _N1, _N1), lambda i, s: (0, 0, 0))
        bspec = pl.BlockSpec((2, M, 2 * _N1), lambda i, s: (0, 0, i))
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(ngroups,),
            in_specs=[gspec, gspec, gspec, gspec, bspec],
            out_specs=bspec,
        )
        return pl.pallas_call(
            self._kern_cache[key],
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct(X.shape, X.dtype),
            interpret=self._pfft.interpret,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=_VMEM_LIMIT),
        )(jnp.asarray(groups_idx, jnp.int32), gfr, gfi, gir, gii, X)

    def x_stage(self, Zy: Array) -> Array:
        ax = self.ax
        nx = lax.axis_size(ax)
        n2y = self.P // _N1
        if nx == 1:
            from ..ops.pallas_fft import pair_x_fits
            if not self._pfft._stream_x and pair_x_fits(self.M, self.P):
                return self._pfft.pair_x_symbols(Zy, self._sym_consts)
            W = self._pfft._call_x(Zy, False)
            return self._pfft._call_x_symbols(W, self._sym_consts)
        rows = Zy.shape[1]
        # Local strip pre-permutation into pair order (a gather on the
        # strip axis — no communication).
        v = Zy.reshape(2, rows, n2y, _N1)
        Zp = v[:, :, self._order, :].reshape(Zy.shape)
        X = lax.all_to_all(Zp, ax, split_axis=2, concat_axis=1,
                           tiled=True)                    # (2, M, P/nx)
        strips = X.shape[2] // _N1
        k = lax.axis_index(ax)
        # Global strip indices of this chip's local strips (the permuted
        # order is a compile-time constant; slice it at the chip index).
        idx_all = jnp.asarray(self._order, jnp.int32)
        idx = lax.dynamic_slice(idx_all, (k * strips,), (strips,))
        V = self._call_paired_kernel(X, idx)
        V = lax.all_to_all(V, ax, split_axis=1, concat_axis=2,
                           tiled=True)                    # (2, m, P) permuted
        w = V.reshape(2, rows, n2y, _N1)
        return w[:, :, self._inv_order, :].reshape(V.shape)

    def __call__(self, zeta: Array) -> Array:
        Zy = self._pfft._call_y(zeta, False)
        V = self.x_stage(Zy)
        return self._pfft._call_y(V, True).astype(zeta.dtype)
