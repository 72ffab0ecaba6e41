"""Pallas fused factored-DFT: both Cooley-Tukey stages VMEM-resident.

The matmul-factorized DFT (tpu_qg.ops.matmul_fft) expresses an N-point DFT as
two batched GEMMs + a twiddle, but at the XLA level every stage round-trips
HBM (and complex64 dots decompose into real dots with extra copies), leaving
the inversion ~3.5x off the HBM floor. This module performs an entire 1-D
transform — small-radix stage, twiddle, large-radix stage — inside one Pallas
kernel while the tile sits in VMEM, so each 1-D transform costs exactly one
HBM read + one HBM write of the field.

Conventions (identical to matmul_fft.FactoredFFT so the permuted-order
spectral symbols and negate-spectrum logic are shared):

  * N = N1 * N2 with N1 = 128 (MXU-sized), decimation n = n1 + N1*n2.
  * Forward: natural order -> permuted order (slot k2*N1 + k1 holds frequency
    k2 + N2*k1); inverse consumes permuted order, emits natural, scales 1/N.
  * Complex fields are PLANAR: a leading axis of size 2 holds (real, imag)
    float32 planes — complex64 never appears, so Mosaic sees pure f32 tiles
    and the packed two-layer state (zeta_1, zeta_2) IS already the planar
    packing of w = zeta_1 + i zeta_2.

TPU mapping (no transposes, no unaligned slices anywhere):

  * small stage (radix N2 <= 16): per destination block, a sum of N2
    scalar-weighted 128-wide chunk FMAs on the VPU. Chunk slices fall on
    N1 = 128 lane (y-kernel) / sublane (x-kernel) boundaries.
  * large stage (radix 128): one 128x128 MXU dot per block (4 real dots per
    complex dot), contracting the minor (y) / intra-block-row (x) axis.
  * twiddle: fused VPU multiply between the stages.

Reference counterpart: the cached sparse Cholesky backsolves the reference
performs every step (src/schemes/laplacian.jl:60-75, src/model.jl:184-192);
this is the speed-of-light TPU form of the same diagonalization.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import Array
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .matmul_fft import _PREC, _dft, _twiddle, split_factor

_N1 = 128  # large-radix size == MXU tile edge

# Mosaic's dot lowering supports only DEFAULT and HIGHEST; map the module
# default (HIGH = bf16x3) up to HIGHEST (full f32 emulation) — the MXU stage
# is a small fraction of the kernel's cost, and full f32 keeps the fused
# transform at least as accurate as the XLA-level matmul DFT.
_KPREC = (jax.lax.Precision.HIGHEST if _PREC == jax.lax.Precision.HIGH
          else _PREC)


# Scoped-VMEM budget for the kernels. The Mosaic default limit is 16 MB, which
# the 2048^2 kernel exceeded in round 1 (20.41 MB measured at compile —
# BENCH_r01.json); v5e/v5p cores have 128 MB of physical VMEM, so we raise the
# per-kernel scoped limit explicitly and size tiles against an honest model.
_VMEM_LIMIT = 64 * 1024 * 1024
_VMEM_TARGET = int(0.70 * _VMEM_LIMIT)   # headroom for Mosaic's own scratch


def _footprint(block_bytes: int, N2: int) -> int:
    """Honest scoped-VMEM model for one transform kernel.

    in + out blocks double-buffered (4 block-equivalents) plus kernel
    temporaries (the live chunk-pair lists and small-stage accumulators
    materialize ~4 more block-equivalents — calibrated against the compiler's
    measured 20.41 MB at (2, 2048, 2048) with 2 MB blocks and N2 = 16), plus
    the twiddle-folded G constant stacks (2 planes, double-buffered)."""
    g_plane = N2 * _N1 * _N1 * 4
    return 8 * block_bytes + 4 * g_plane


def pallas_fft_supported(N: int) -> bool:
    """The fused kernel handles N = 128 * N2 with N2 in [1, 64] (the small
    stage factors recursively, so per-element VPU work grows like the sum of
    N2's radix factors, not N2 itself)."""
    n1, n2 = split_factor(N)
    return n1 == _N1 and 1 <= n2 <= 64


def planar_fft2_fits(M: int, P: int) -> bool:
    """True iff PlanarFFT2(M, P) is shape-supported AND both direction
    kernels fit the scoped-VMEM budget at their smallest legal tile
    (R = 8 rows for y, C = 128 columns for x)."""
    if not (pallas_fft_supported(M) and pallas_fft_supported(P)):
        return False
    n2_y = P // _N1
    n2_x = M // _N1
    y_min = _footprint(8 * 8 * P, n2_y)        # (2, 8, P) f32 block
    x_min = _footprint(8 * M * 128, n2_x)      # (2, M, 128) f32 block
    return y_min <= _VMEM_TARGET and x_min <= _VMEM_TARGET


def symbol_inverse_fits(M: int, P: int) -> bool:
    """Scoped-VMEM bound for the fused symbol+inverse-x kernel: per 128-column
    strip it holds wj, wm, out (2 strips each), 4 symbol strips — double
    buffered — plus the lane-negated mirror, the live MXU chunk pairs and
    small-stage outputs (~6 strip-equivalents) and the G constants."""
    strip = M * _N1 * 4
    g_plane = (M // _N1) * _N1 * _N1 * 4
    return 26 * strip + 4 * g_plane <= _VMEM_TARGET


def _plan(N: int, axis: str, inverse: bool):
    """Numpy constants for one transform direction.

    Returns (N2, F2, Gr, Gi): F2 (dst, src) holds the small-stage scalar
    weights; G (N2, N1, N1) the per-block MXU matrices with the twiddle
    FOLDED IN (diagonal twiddle absorbed into the large-stage DFT matrix on
    its contraction side), split into float32 real/imag stacks.
    """
    N1, N2 = split_factor(N)
    assert N1 == _N1 and N2 <= 16, (N, N1, N2)
    if not inverse:
        F2 = _dft(N2, -1, np.complex128)             # (k2, n2)
        F1 = _dft(N1, -1, np.complex128)             # (k1, n1)
        tw = _twiddle(N2, N1, -1, np.complex128)     # (k2, n1)
        if axis == "y":
            # out_b = (small_b * tw_b) @ F1^T  ==  small_b @ (diag(tw_b) F1^T)
            G = tw[:, :, None] * F1.T[None, :, :]            # (b, n1, k1)
        else:
            # out_b = F1 @ (small_b * tw_b[:, None])
            G = F1[None, :, :] * tw[:, None, :]              # (b, k1, n1)
    else:
        F2 = _dft(N2, +1, np.complex128).T / N2      # (n2, c): dst=n2, src=c
        F1 = _dft(N1, +1, np.complex128) / N1        # (n1, k1)
        tw = _twiddle(N2, N1, +1, np.complex128)     # (c, n1)
        if axis == "y":
            # chunk_c = (X_c @ F1^T) * tw_c  ==  X_c @ (F1^T diag(tw_c))
            G = F1.T[None, :, :] * tw[:, None, :]            # (c, k1, n1out)
        else:
            # chunk_c = diag(tw_c) F1 @ X_c
            G = tw[:, :, None] * F1[None, :, :]              # (c, n1out, k1)
    Gr = np.ascontiguousarray(G.real.astype(np.float32))
    Gi = np.ascontiguousarray(G.imag.astype(np.float32))
    return N2, F2, Gr, Gi


def _wsum(pairs, weights):
    """Scalar-complex-weighted sum of (real, imag) tile pairs on the VPU."""
    sr = si = None
    for (cr, ci), w in zip(pairs, weights):
        wr, wi = float(w.real), float(w.imag)
        tr = cr * wr - ci * wi
        ti = cr * wi + ci * wr
        sr = tr if sr is None else sr + tr
        si = ti if si is None else si + ti
    return sr, si


# Largest radix evaluated naively (O(radix^2) scalar FMAs); composites above
# this split recursively. 8 balances FMA count against live-value pressure.
_NAIVE_RADIX = 8


def _chunk_dft(pairs, sign: int, scale: float = 1.0):
    """All N outputs of the N-point DFT over a list of (real, imag) tile
    pairs, with compile-time scalar weights W_N^{sign*d*s} * scale.

    Recursive decimation-in-time: N = A*B splits into A interleaved B-point
    DFTs plus an N*A-term combine, so per-element VPU work is
    sum-of-radix-factors (e.g. 8 complex FMAs at N=16, 16 at N=64) instead of
    the naive N. The scale rides on the top-level combine weights only.
    """
    N = len(pairs)
    if N == 1:
        (cr, ci) = pairs[0]
        return [(cr * scale, ci * scale)] if scale != 1.0 else [pairs[0]]
    A = next((a for a in range(2, _NAIVE_RADIX + 1) if N % a == 0), None)
    if N <= _NAIVE_RADIX or A is None:
        # Naive for small N, or N with no small factor (prime-ish).
        W = scale * np.exp(sign * 2j * np.pi
                           * np.outer(np.arange(N), np.arange(N)) / N)
        return [_wsum(pairs, W[d]) for d in range(N)]
    B = N // A
    subs = [_chunk_dft(pairs[a::A], sign) for a in range(A)]
    out = []
    for k in range(N):
        w = scale * np.exp(sign * 2j * np.pi * np.arange(A) * k / N)
        out.append(_wsum([subs[a][k % B] for a in range(A)], w))
    return out


def _cdot(ar, ai, br_c, bi_c, left: bool):
    """Complex matmul with a compile-time constant matrix (4 real MXU dots).

    left=False: (rows, K) @ const (K, K) — y-direction (contract minor axis).
    left=True:  const (K, K) @ (K, cols) — x-direction (contract block rows).
    """
    dot = functools.partial(jnp.dot, precision=_KPREC,
                            preferred_element_type=jnp.float32)
    if left:
        return (dot(br_c, ar) - dot(bi_c, ai), dot(br_c, ai) + dot(bi_c, ar))
    return (dot(ar, br_c) - dot(ai, bi_c), dot(ar, bi_c) + dot(ai, br_c))


def _build_kernel(N: int, *, axis: str, inverse: bool):
    """Kernel body for one 1-D transform along ``axis`` ('y' = minor lanes,
    'x' = rows). Operands: (Gr, Gi, x) -> o; tile shapes y (2, R, N),
    x (2, N, C); G (N2, N1, N1) twiddle-folded MXU matrices."""
    N2, F2, _, _ = _plan(N, axis, inverse)

    def blk(arr, j):
        if axis == "y":
            return arr[:, j * _N1:(j + 1) * _N1]
        return arr[j * _N1:(j + 1) * _N1, :]

    def kernel(gr_ref, gi_ref, x_ref, o_ref):
        xr, xi = x_ref[0], x_ref[1]
        if not inverse:
            # small stage (recursive DFT over the natural-order chunks) ->
            # MXU stage (twiddle folded into the per-block matrix).
            pairs = [(blk(xr, s), blk(xi, s)) for s in range(N2)]
            smalls = _chunk_dft(pairs, -1)
            for b in range(N2):
                sr, si = smalls[b]
                orr, oii = _cdot(sr, si, gr_ref[b], gi_ref[b],
                                 left=(axis == "x"))
                if axis == "y":
                    o_ref[0, :, b * _N1:(b + 1) * _N1] = orr
                    o_ref[1, :, b * _N1:(b + 1) * _N1] = oii
                else:
                    o_ref[0, b * _N1:(b + 1) * _N1, :] = orr
                    o_ref[1, b * _N1:(b + 1) * _N1, :] = oii
        else:
            # MXU stage per permuted block (twiddle folded in) -> small stage
            # (inverse recursive DFT, scaled 1/N2) back to natural order.
            pairs = [
                _cdot(blk(xr, c), blk(xi, c), gr_ref[c], gi_ref[c],
                      left=(axis == "x"))
                for c in range(N2)
            ]
            outs = _chunk_dft(pairs, +1, 1.0 / N2)
            for b in range(N2):
                sr, si = outs[b]
                if axis == "y":
                    o_ref[0, :, b * _N1:(b + 1) * _N1] = sr
                    o_ref[1, :, b * _N1:(b + 1) * _N1] = si
                else:
                    o_ref[0, b * _N1:(b + 1) * _N1, :] = sr
                    o_ref[1, b * _N1:(b + 1) * _N1, :] = si

    return kernel


def _perm_matrices():
    """The two 128x128 lane/sublane negation matrices as exact 0/1 f32
    constants built from integer iotas (Mosaic's tpu.iota is integer-only):
    Jflip for blocks k2 > 0 (k1 -> N1-1-k1) and Jroll for the k2 == 0 block
    (k1 -> (-k1) % N1). Both are symmetric, so one matrix serves row
    (left-multiply) and column (right-multiply) permutation. Permutation
    matmuls are exact at any precision: each output element is a sum with a
    single nonzero product of a 0/1 weight."""
    r = jax.lax.broadcasted_iota(jnp.int32, (_N1, _N1), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (_N1, _N1), 1)
    jflip = (r + c == _N1 - 1).astype(jnp.float32)
    jroll = ((r + c) % _N1 == 0).astype(jnp.float32)
    return jflip, jroll


def _build_symbol_inv_x_kernel(M: int):
    """Inverse-x kernel with the packed-inversion symbol stage fused in.

    Operands (per 128-column strip j of the permuted spectrum W):
      gr, gi — twiddle-folded inverse MXU matrices (as _build_kernel);
      wj     — W strip j (2, M, 128);
      wm     — W strip (N2y - j) % N2y, the strip holding the y-negated
               frequencies (the negation maps 128-blocks to 128-blocks);
      ar, ai, br, bi — the inversion symbols A(k), B(k) restricted to strip j
               ((M, 128) f32 planes, permuted order).
    Body: lane-permute wm (y-negation within the block), then per x-row-block
    c: sublane-permute the mirror row block (x-negation), form
    V = A W + B conj(W(-k)) pointwise, and feed straight into the inverse MXU
    stage + recursive small stage. Replaces the XLA-level negate_spectrum +
    symbol multiply (ops/spectral.py PackedModalInverter.__call__), saving
    two full-field HBM round-trips per inversion.
    """
    N2, _, _, _ = _plan(M, "x", True)
    pdot = functools.partial(jnp.dot, precision=jax.lax.Precision.DEFAULT,
                             preferred_element_type=jnp.float32)

    def kernel(gr_ref, gi_ref, wj_ref, wm_ref, ar_ref, ai_ref, br_ref,
               bi_ref, o_ref):
        j = pl.program_id(0)
        jflip, jroll = _perm_matrices()
        # y-direction (lane) negation of the mirror strip: strip 0 is its own
        # mirror and uses the roll-flip mapping, all others plain flip.
        jlane = jnp.where(j == 0, jroll, jflip)
        wmr = pdot(wm_ref[0], jlane)        # (M, 128), lanes permuted
        wmi = pdot(wm_ref[1], jlane)

        wjr, wji = wj_ref[0], wj_ref[1]
        ar, ai = ar_ref[:], ai_ref[:]
        br, bi = br_ref[:], bi_ref[:]

        def blk(a, c):
            return a[c * _N1:(c + 1) * _N1, :]

        pairs = []
        for c in range(N2):
            # x-direction (sublane) negation: dest row-block c sources block
            # (-c) % N2 with an intra-block flip (roll-flip for block 0).
            r = (-c) % N2
            jrow = jroll if c == 0 else jflip
            wnr = pdot(jrow, blk(wmr, r))
            wni = pdot(jrow, blk(wmi, r))
            # V = A W + B conj(W(-k)) on the planes (same expansion as
            # ops/spectral.py PackedModalInverterPallasFFT.__call__).
            wr_, wi_ = blk(wjr, c), blk(wji, c)
            arb, aib, brb, bib = blk(ar, c), blk(ai, c), blk(br, c), blk(bi, c)
            vr = arb * wr_ - aib * wi_ + brb * wnr + bib * wni
            vi = aib * wr_ + arb * wi_ + bib * wnr - brb * wni
            pairs.append(_cdot(vr, vi, gr_ref[c], gi_ref[c], left=True))

        outs = _chunk_dft(pairs, +1, 1.0 / N2)
        for b in range(N2):
            sr, si = outs[b]
            o_ref[0, b * _N1:(b + 1) * _N1, :] = sr
            o_ref[1, b * _N1:(b + 1) * _N1, :] = si

    return kernel


def _pick_rows(M: int, P: int) -> int:
    """Row-tile size for the y-kernel: largest divisor of M (multiple of 8,
    <= 256) whose honest footprint stays under the scoped-VMEM target."""
    n2 = P // _N1
    r = 8
    for cand in range(8, min(M, 256) + 1, 8):
        if M % cand == 0 and _footprint(8 * cand * P, n2) <= _VMEM_TARGET:
            r = cand
    return r


def _pick_cols(M: int, P: int) -> int:
    """Column-strip width for the x-kernel: multiple of 128 (<= 512) whose
    honest footprint stays under the scoped-VMEM target."""
    n2 = M // _N1
    c = 128
    for cand in range(128, min(P, 512) + 1, 128):
        if P % cand == 0 and _footprint(8 * M * cand, n2) <= _VMEM_TARGET:
            c = cand
    return c


class PlanarFFT2:
    """2-D DFT over the trailing (M, P) axes of a planar (2, M, P) float32
    field, permuted spectral order on both axes (matmul_fft conventions).

    forward: natural -> permuted spectrum; inverse: permuted -> natural, 1/N.
    Each direction is one fused Pallas kernel (one HBM read+write per 1-D
    transform); x- and y-transforms commute so fft2 is y then x.
    """

    def __init__(self, M: int, P: int, interpret: bool = False):
        if not planar_fft2_fits(M, P):
            raise ValueError(f"PlanarFFT2 unsupported for {(M, P)}: each "
                             "extent must be 128 * N2 with N2 <= 16 and the "
                             "kernels must fit the scoped-VMEM budget")
        self.M, self.P = M, P
        # Mosaic only targets TPU; everywhere else run the kernels in
        # interpret mode (tests, CPU oracles).
        self.interpret = interpret or jax.default_backend() != "tpu"
        self._R = _pick_rows(M, P)
        self._C = _pick_cols(M, P)
        self._kern, self._G = {}, {}
        for inv in (False, True):
            self._kern[("y", inv)] = _build_kernel(P, axis="y", inverse=inv)
            self._kern[("x", inv)] = _build_kernel(M, axis="x", inverse=inv)
            _, _, gry, giy = _plan(P, "y", inv)
            _, _, grx, gix = _plan(M, "x", inv)
            self._G[("y", inv)] = (jnp.asarray(gry), jnp.asarray(giy))
            self._G[("x", inv)] = (jnp.asarray(grx), jnp.asarray(gix))
        self._kern_sym_x = _build_symbol_inv_x_kernel(M)

    def _call_y(self, z: Array, inverse: bool) -> Array:
        M, P, R = self.M, self.P, self._R
        gr, gi = self._G[("y", inverse)]
        n2 = gr.shape[0]
        gspec = pl.BlockSpec((n2, _N1, _N1), lambda i: (0, 0, 0))
        return pl.pallas_call(
            self._kern[("y", inverse)],
            grid=(M // R,),
            in_specs=[gspec, gspec,
                      pl.BlockSpec((2, R, P), lambda i: (0, i, 0))],
            out_specs=pl.BlockSpec((2, R, P), lambda i: (0, i, 0)),
            out_shape=jax.ShapeDtypeStruct((2, M, P), z.dtype),
            interpret=self.interpret,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=_VMEM_LIMIT),
        )(gr, gi, z)

    def _call_x(self, z: Array, inverse: bool) -> Array:
        M, P, C = self.M, self.P, self._C
        gr, gi = self._G[("x", inverse)]
        n2 = gr.shape[0]
        gspec = pl.BlockSpec((n2, _N1, _N1), lambda j: (0, 0, 0))
        return pl.pallas_call(
            self._kern[("x", inverse)],
            grid=(P // C,),
            in_specs=[gspec, gspec,
                      pl.BlockSpec((2, M, C), lambda j: (0, 0, j))],
            out_specs=pl.BlockSpec((2, M, C), lambda j: (0, 0, j)),
            out_shape=jax.ShapeDtypeStruct((2, M, P), z.dtype),
            interpret=self.interpret,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=_VMEM_LIMIT),
        )(gr, gi, z)

    def _call_x_symbols(self, Z: Array, syms) -> Array:
        """Fused symbol multiply + inverse-x transform: one kernel computing
        ifft_x(A * W + B * conj(W(-k))) per 128-column strip, with the mirror
        strip delivered by the BlockSpec index map."""
        M, P = self.M, self.P
        gr, gi = self._G[("x", True)]
        n2x = gr.shape[0]
        n2y = P // _N1
        gspec = pl.BlockSpec((n2x, _N1, _N1), lambda j: (0, 0, 0))
        wspec = pl.BlockSpec((2, M, _N1), lambda j: (0, 0, j))
        mspec = pl.BlockSpec((2, M, _N1), lambda j: (0, 0, (n2y - j) % n2y))
        sspec = pl.BlockSpec((M, _N1), lambda j: (0, j))
        ar, ai, br, bi = (jnp.asarray(s) for s in syms)
        return pl.pallas_call(
            self._kern_sym_x,
            grid=(n2y,),
            in_specs=[gspec, gspec, wspec, mspec,
                      sspec, sspec, sspec, sspec],
            out_specs=pl.BlockSpec((2, M, _N1), lambda j: (0, 0, j)),
            out_shape=jax.ShapeDtypeStruct((2, M, P), Z.dtype),
            interpret=self.interpret,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=_VMEM_LIMIT),
        )(gr, gi, Z, Z, ar, ai, br, bi)

    def forward(self, z: Array) -> Array:
        """Planar (2, M, P) natural order -> planar permuted spectrum."""
        return self._call_x(self._call_y(z, False), False)

    def inverse(self, Z: Array) -> Array:
        """Planar permuted spectrum -> planar natural order (scaled 1/MP)."""
        return self._call_y(self._call_x(Z, True), True)

    def inverse_with_symbols(self, Z: Array, syms) -> Array:
        """Planar permuted spectrum W -> ifft2(A W + B conj(W(-k))), natural
        order: the packed modal inversion's entire spectral stage fused into
        the inverse-x kernel. ``syms`` = (Ar, Ai, Br, Bi) permuted-order
        (M, P) f32 planes."""
        return self._call_y(self._call_x_symbols(Z, syms), True)
