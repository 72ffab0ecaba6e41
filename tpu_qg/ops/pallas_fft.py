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

  * small stage (radix N2 <= 64): a recursive Cooley-Tukey DFT over the
    128-wide chunks with compile-time scalar weights on the VPU (per-element
    cost ~ sum of N2's radix factors). Chunk slices fall on N1 = 128 lane
    (y-kernel) / sublane (x-kernel) boundaries.
  * large stage (radix 128): one 128x128 MXU dot per block (4 real dots per
    complex dot), contracting the minor (y) / intra-block-row (x) axis.
  * twiddle: fused VPU multiply between the stages.

Reference counterpart: the cached sparse Cholesky backsolves the reference
performs every step (src/schemes/laplacian.jl:60-75, src/model.jl:184-192);
this is the speed-of-light TPU form of the same diagonalization.
"""

from __future__ import annotations

import functools
import math

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

# The streaming x-kernels manage their own buffers (manual DMA, no BlockSpec
# double-buffering), so their accounting is explicit and they may use more of
# the 128 MB physical VMEM.
_VMEM_LIMIT_STREAM = 96 * 1024 * 1024
_VMEM_TARGET_STREAM = int(0.70 * _VMEM_LIMIT_STREAM)


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


def _stream_x_footprint(M: int) -> int:
    """Explicit VMEM model for the streaming x-kernels: 2 input strip slots
    (2, M, 128) + (for the symbol-inverse) a second mirror-strip pair + one
    output stage + live chunk pairs / small-stage values (~2 strips) + G."""
    strip = 2 * M * _N1 * 4
    g = 2 * (M // _N1) * _N1 * _N1 * 4
    return 2 * strip + 2 * strip + strip + 2 * strip + g


def _x_blockspec_fits(M: int, P: int) -> bool:
    return _footprint(8 * M * 128, M // _N1) <= _VMEM_TARGET


def planar_fft2_fits(M: int, P: int) -> bool:
    """True iff PlanarFFT2(M, P) is shape-supported AND each direction has a
    kernel form that fits its scoped-VMEM budget: the y-kernel at its
    smallest row tile, the x-kernel either as a BlockSpec pipeline
    ((2, M, 128) blocks) or as the manually-DMA'd streaming form."""
    if not (pallas_fft_supported(M) and pallas_fft_supported(P)):
        return False
    y_min = _footprint(8 * 8 * P, P // _N1)    # (2, 8, P) f32 block
    x_ok = (_x_blockspec_fits(M, P)
            or _stream_x_footprint(M) <= _VMEM_TARGET_STREAM)
    return y_min <= _VMEM_TARGET and x_ok


def symbol_inverse_fits(M: int, P: int) -> bool:
    """Scoped-VMEM bound for the fused symbol+inverse-x kernel. BlockSpec
    form: per 128-column strip it holds wj, wm, out (2 plane-strips each,
    double buffered by the pipeline) plus the lane-negated mirror, the live
    MXU chunk pairs and small-stage outputs (~6 plane-strips) and the G
    constants (symbols are computed from iotas — no VMEM footprint). When
    the plain x-kernel already needs the streaming form, the fused variant
    streams too and is bounded by _stream_x_footprint."""
    strip = M * _N1 * 4
    g_plane = (M // _N1) * _N1 * _N1 * 4
    if _x_blockspec_fits(M, P):
        return 18 * strip + 4 * g_plane <= _VMEM_TARGET
    return _stream_x_footprint(M) <= _VMEM_TARGET_STREAM


def _plan(N: int, axis: str, inverse: bool):
    """Numpy constants for one transform direction.

    Returns (N2, F2, Gr, Gi): F2 (dst, src) holds the small-stage scalar
    weights; G (N2, N1, N1) the per-block MXU matrices with the twiddle
    FOLDED IN (diagonal twiddle absorbed into the large-stage DFT matrix on
    its contraction side), split into float32 real/imag stacks.
    """
    N1, N2 = split_factor(N)
    assert N1 == _N1 and N2 <= 64, (N, N1, N2)
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
    # Largest radix <= _NAIVE_RADIX: fewest recursion levels, so the fewest
    # rounding-accumulation stages (N = 64 is one combine over 8-point naive
    # DFTs rather than three radix-2 levels).
    A = max((a for a in range(2, _NAIVE_RADIX + 1) if N % a == 0),
            default=None)
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


def _split_bf16(x):
    """Exact two-term bf16 split x ~= hi + lo (hi = bf16(x), lo = bf16 of the
    residual). The dropped part is ~2^-16 relative — the same error model as
    XLA's HIGH (bf16x3) dot strategy."""
    hi = x.astype(jnp.bfloat16)
    lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _pdot(x, p, left: bool = False):
    """Permutation matmul (compile-time 0/1 matrix ``p``) with a PINNED,
    Mosaic-default-independent error model: two single-pass bf16 dots over an
    exact hi/lo bf16 split of x (``_split_bf16``). 0/1 weights are exact in
    bf16 and every output element has a single nonzero product, so the result
    is perm(hi) + perm(lo) with relative error ~2^-16 from the dropped split
    residual — the same budget as the kernels' bf16x3 MXU stage. (A plain
    bf16 dot is NOT exact for permutations: it rounds the *values* to 8
    mantissa bits, ~2^-9 relative; leaving precision=DEFAULT made the default
    inversion path's accuracy depend on Mosaic's default dot lowering —
    ADVICE.md round 2.)"""
    hi, lo = _split_bf16(x)
    pb = p.astype(jnp.bfloat16)
    dot = functools.partial(jnp.dot, preferred_element_type=jnp.float32)
    if left:
        return dot(pb, hi) + dot(pb, lo)
    return dot(hi, pb) + dot(lo, pb)


def _cdot(ar, ai, br_c, bi_c, left: bool, mxu: str = "highest"):
    """Complex matmul with a compile-time constant matrix (4 real MXU dots).

    left=False: (rows, K) @ const (K, K) — y-direction (contract minor axis).
    left=True:  const (K, K) @ (K, cols) — x-direction (contract block rows).

    mxu="highest": full f32 emulation (6 MXU passes per real dot).
    mxu="bf16x3": manual 3-term bf16 decomposition (3 single-pass bf16 dots
    per real dot — the in-kernel equivalent of XLA Precision.HIGH, which
    Mosaic's dot lowering does not offer natively). Halves MXU time; error
    ~2^-16 relative, matching the matmul-DFT tier's validated accuracy.
    """
    if mxu == "bf16x3":
        dot = functools.partial(jnp.dot, preferred_element_type=jnp.float32)
        arh, arl = _split_bf16(ar)
        aih, ail = _split_bf16(ai)
        brh, brl = _split_bf16(br_c)
        bih, bil = _split_bf16(bi_c)

        def d3(xh, xl, yh, yl):
            # x @ y ~= xh yh + xl yh + xh yl (xl yl dropped).
            if left:
                return dot(yh, xh) + dot(yl, xh) + dot(yh, xl)
            return dot(xh, yh) + dot(xl, yh) + dot(xh, yl)

        rr = d3(arh, arl, brh, brl) - d3(aih, ail, bih, bil)
        ri = d3(arh, arl, bih, bil) + d3(aih, ail, brh, brl)
        return rr, ri
    dot = functools.partial(jnp.dot, precision=_KPREC,
                            preferred_element_type=jnp.float32)
    if left:
        return (dot(br_c, ar) - dot(bi_c, ai), dot(br_c, ai) + dot(bi_c, ar))
    return (dot(ar, br_c) - dot(ai, bi_c), dot(ar, bi_c) + dot(ai, br_c))


def _build_kernel(N: int, *, axis: str, inverse: bool, mxu: str = "highest"):
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
                                 left=(axis == "x"), mxu=mxu)
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
                      left=(axis == "x"), mxu=mxu)
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


def make_y_tile_transform(N: int, *, inverse: bool, mxu: str = "highest"):
    """In-kernel y-direction (lane-axis) factored DFT over VALUE tiles.

    Returns ``transform(xr, xi, gr_ref, gi_ref) -> (yr, yi)`` applying the
    same small-stage + twiddle-folded-MXU-stage 1-D transform as
    ``_build_kernel(N, axis="y")``, but on (R, N) float32 plane values held
    live in a surrounding kernel (the fused step kernel transforms its psi
    input / zeta output tiles without an extra HBM pass). Identical op
    sequence per lane block to the standalone y-kernel, so results match it
    exactly. G refs/arrays as produced by ``y_plan_arrays``.
    """
    N2, _, _, _ = _plan(N, "y", inverse)

    def blk(arr, j):
        return arr[:, j * _N1:(j + 1) * _N1]

    def transform(xr, xi, gr_ref, gi_ref):
        if not inverse:
            smalls = _chunk_dft([(blk(xr, s), blk(xi, s))
                                 for s in range(N2)], -1)
            outs = [
                _cdot(sr, si, gr_ref[b], gi_ref[b], left=False, mxu=mxu)
                for b, (sr, si) in enumerate(smalls)
            ]
        else:
            pairs = [
                _cdot(blk(xr, c), blk(xi, c), gr_ref[c], gi_ref[c],
                      left=False, mxu=mxu)
                for c in range(N2)
            ]
            outs = _chunk_dft(pairs, +1, 1.0 / N2)
        return (jnp.concatenate([r for r, _ in outs], axis=-1),
                jnp.concatenate([im for _, im in outs], axis=-1))

    return transform


def y_plan_arrays(N: int, inverse: bool):
    """(Gr, Gi) twiddle-folded MXU constant stacks for a y-direction
    transform, as jnp arrays (shape (N2, 128, 128) float32)."""
    _, _, gr, gi = _plan(N, "y", inverse)
    return jnp.asarray(gr), jnp.asarray(gi)


def _perm_matrices():
    """The two 128x128 lane/sublane negation matrices as exact 0/1 f32
    constants built from integer iotas (Mosaic's tpu.iota is integer-only):
    Jflip for blocks k2 > 0 (k1 -> N1-1-k1) and Jroll for the k2 == 0 block
    (k1 -> (-k1) % N1). Both are symmetric, so one matrix serves row
    (left-multiply) and column (right-multiply) permutation. Permutation
    matmuls go through ``_pdot`` (two-pass exact-split bf16) so their ~2^-16
    error budget is pinned rather than inherited from Mosaic's default dot
    lowering."""
    r = jax.lax.broadcasted_iota(jnp.int32, (_N1, _N1), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (_N1, _N1), 1)
    jflip = (r + c == _N1 - 1).astype(jnp.float32)
    jroll = ((r + c) % _N1 == 0).astype(jnp.float32)
    return jflip, jroll


def _symbols_for_block(M: int, P: int, c, j, consts):
    """The packed-inversion symbols A, B on row-block c of column strip j,
    computed in-kernel from iotas — no operands, no HBM reads.

    Permuted order: sublane s of row-block c holds x-frequency c + N2x*s,
    lane l of strip j holds y-frequency j + N2y*l. The discrete eigenvalue
    uses the cancellation-free form 2cos(2 pi k/N) - 2 == -4 sin^2(pi k/N)
    (f32-accurate at small k where the subtractive form loses ~all bits;
    ops/spectral.py builds the same values in float64 numpy). consts =
    (n2x, n2y, inv_dx2, alpha2, a1, a2, b1, b2) with complex a*/b* scalars.

    ``c`` may be a Python int (BlockSpec path) or a traced scalar (streaming
    path); ``j`` is the traced grid index.
    """
    n2x, n2y, inv_dx2, alpha2, a1, a2, b1, b2 = consts
    s = jax.lax.broadcasted_iota(jnp.int32, (_N1, _N1), 0)
    ll = jax.lax.broadcasted_iota(jnp.int32, (_N1, _N1), 1)
    fx = (c + n2x * s).astype(jnp.float32)
    fy = (j + n2y * ll).astype(jnp.float32)
    # sin(pi k/N) == sin(pi (N-k)/N): fold k onto [0, N/2] so the f32 sin
    # argument stays <= pi/2 — near pi the argument rounding alone costs
    # ~1e-5 relative in the small sin values.
    sx = jnp.sin((math.pi / M) * jnp.minimum(fx, M - fx))
    sy = jnp.sin((math.pi / P) * jnp.minimum(fy, P - fy))
    lam = (-4.0 * inv_dx2) * (sx * sx + sy * sy)
    # Zero-mean gauge: inv1 = 1/lam except the k == 0 slot (slot (0, 0) of
    # block 0 / strip 0), which is 0.
    is_zero = (fx + fy) == 0.0
    inv1 = jnp.where(is_zero, 0.0, 1.0 / jnp.where(is_zero, 1.0, lam))
    inv2 = 1.0 / (lam + alpha2)
    ar = float(a1.real) * inv1 + float(a2.real) * inv2
    ai = float(a1.imag) * inv1 + float(a2.imag) * inv2
    br = float(b1.real) * inv1 + float(b2.real) * inv2
    bi = float(b1.imag) * inv1 + float(b2.imag) * inv2
    return ar, ai, br, bi


def _build_symbol_inv_x_kernel(M: int, P: int, consts, mxu: str = "highest"):
    """Inverse-x kernel with the packed-inversion symbol stage fused in.

    Operands (per 128-column strip j of the permuted spectrum W):
      gr, gi — twiddle-folded inverse MXU matrices (as _build_kernel);
      wj     — W strip j (2, M, 128);
      wm     — W strip (N2y - j) % N2y, the strip holding the y-negated
               frequencies (the negation maps 128-blocks to 128-blocks).
    Body: lane-permute wm (y-negation within the block), then per x-row-block
    c: sublane-permute the mirror row block (x-negation), evaluate the
    symbols A, B from iotas (_symbols_for_block — no HBM reads), form
    V = A W + B conj(W(-k)) pointwise, and feed straight into the inverse MXU
    stage + recursive small stage. Replaces the XLA-level negate_spectrum +
    symbol multiply (ops/spectral.py PackedModalInverter.__call__), saving
    two full-field HBM round-trips plus the four symbol-plane reads per
    inversion.
    """
    N2, _, _, _ = _plan(M, "x", True)

    def kernel(gr_ref, gi_ref, wj_ref, wm_ref, o_ref):
        j = pl.program_id(0)
        jflip, jroll = _perm_matrices()
        # y-direction (lane) negation of the mirror strip: strip 0 is its own
        # mirror and uses the roll-flip mapping, all others plain flip.
        jlane = jnp.where(j == 0, jroll, jflip)
        wmr = _pdot(wm_ref[0], jlane)       # (M, 128), lanes permuted
        wmi = _pdot(wm_ref[1], jlane)

        wjr, wji = wj_ref[0], wj_ref[1]

        def blk(a, c):
            return a[c * _N1:(c + 1) * _N1, :]

        pairs = []
        for c in range(N2):
            # x-direction (sublane) negation: dest row-block c sources block
            # (-c) % N2 with an intra-block flip (roll-flip for block 0).
            r = (-c) % N2
            jrow = jroll if c == 0 else jflip
            wnr = _pdot(blk(wmr, r), jrow, left=True)
            wni = _pdot(blk(wmi, r), jrow, left=True)
            # V = A W + B conj(W(-k)) on the planes (same expansion as
            # ops/spectral.py PackedModalInverterPallasFFT.__call__).
            arb, aib, brb, bib = _symbols_for_block(M, P, c, j, consts)
            wr_, wi_ = blk(wjr, c), blk(wji, c)
            vr = arb * wr_ - aib * wi_ + brb * wnr + bib * wni
            vi = aib * wr_ + arb * wi_ + bib * wnr - brb * wni
            pairs.append(_cdot(vr, vi, gr_ref[c], gi_ref[c], left=True,
                               mxu=mxu))

        outs = _chunk_dft(pairs, +1, 1.0 / N2)
        for b in range(N2):
            sr, si = outs[b]
            o_ref[0, b * _N1:(b + 1) * _N1, :] = sr
            o_ref[1, b * _N1:(b + 1) * _N1, :] = si

    return kernel


def pair_x_fits(M: int, P: int) -> bool:
    """Scoped-VMEM bound for the mirror-pair fused x-kernel: 2 input strips
    (pipeline-double-buffered), 2 output stages, ~8 strip-equivalents of live
    forward/mirror/inverse values, plus BOTH direction's G constant stacks."""
    strip = 2 * M * _N1 * 4
    g_plane = (M // _N1) * _N1 * _N1 * 4
    return (_x_blockspec_fits(M, P)
            and 14 * strip + 8 * g_plane <= _VMEM_TARGET)


def _build_pair_x_kernel(M: int, P: int, consts, mxu: str = "highest"):
    """Forward-x + packed-inversion symbols + inverse-x for a MIRROR PAIR of
    128-lane strips in ONE kernel pass.

    The fused symbol stage needs strip j and its y-mirror (n2y - j) % n2y of
    the spectrum W; since the mirror relation is an involution, processing
    the PAIR jointly means each invocation can forward-transform both strips
    of the y-spectrum, use each as the other's mirror, and inverse-transform
    both — the spectrum W never touches HBM. Replaces the separate forward-x
    (_build_kernel) + symbol+inverse-x (_build_symbol_inv_x_kernel) passes:
    the chain step becomes TWO kernel HBM passes, the packed inversion three.

    Grid: i in [0, n2y//2] with a = i, b = (n2y - i) % n2y. Invocations 0
    (and n2y/2 for even n2y) are self-mirrors: the b-half compute is
    redundant there (~2/(n2y+2) of this kernel's work) and its store is
    suppressed with pl.when.

    Operands: gfr/gfi (forward G), gir/gii (inverse G), xa/xb (BlockSpec
    strips a and b of the y-spectral field, natural x order); output is an
    HBM-space (2, M, P) buffer written via staged DMA (two pallas outputs
    cannot alias one array's disjoint columns through BlockSpecs).
    """
    N2, _, _, _ = _plan(M, "x", False)
    n2y = P // _N1

    def kernel(gfr, gfi, gir, gii, xa_ref, xb_ref, o_hbm,
               stage_a, stage_b, sems):
        i = pl.program_id(0)
        a = i
        b = jax.lax.rem(jnp.asarray(n2y, i.dtype) - i,
                        jnp.asarray(n2y, i.dtype))
        jflip, jroll = _perm_matrices()

        def blk(arr, c):
            return arr[c * _N1:(c + 1) * _N1, :]

        def fwd(x_ref):
            xr, xi = x_ref[0], x_ref[1]
            smalls = _chunk_dft([(blk(xr, s), blk(xi, s))
                                 for s in range(N2)], -1)
            return [
                _cdot(sr, si, gfr[c], gfi[c], left=True, mxu=mxu)
                for c, (sr, si) in enumerate(smalls)
            ]

        Wa = fwd(xa_ref)
        Wb = fwd(xb_ref)

        def invert(W, Wm, jstrip, stage):
            """V = A W + B conj(W(-k)) -> inverse-x, into ``stage``. Wm is
            the mirror strip's spectrum blocks; lane negation (y within the
            128-block) + per-block sublane negation (x) as in
            _build_symbol_inv_x_kernel."""
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
                pairs.append(_cdot(vr, vi, gir[c], gii[c], left=True,
                                   mxu=mxu))
            outs = _chunk_dft(pairs, +1, 1.0 / N2)
            for c in range(N2):
                sr, si = outs[c]
                stage[0, c * _N1:(c + 1) * _N1, :] = sr
                stage[1, c * _N1:(c + 1) * _N1, :] = si

        invert(Wa, Wb, a, stage_a)
        invert(Wb, Wa, b, stage_b)

        cp_a = pltpu.make_async_copy(
            stage_a, o_hbm.at[:, :, pl.ds(a * _N1, _N1)], sems.at[0])
        cp_a.start()

        @pl.when(b != a)
        def _():
            pltpu.make_async_copy(
                stage_b, o_hbm.at[:, :, pl.ds(b * _N1, _N1)],
                sems.at[1]).start()

        cp_a.wait()

        @pl.when(b != a)
        def _():
            pltpu.make_async_copy(
                stage_b, o_hbm.at[:, :, pl.ds(b * _N1, _N1)],
                sems.at[1]).wait()

    return kernel


def mono_fits(M: int, P: int) -> bool:
    """Scoped-VMEM bound for the monolithic single-pass inversion kernel:
    the whole packed planar field (2, M, P) f32 resident in VMEM, the 8
    twiddle-folded G operand stacks, plus the larger of the two stage
    working sets. Unlike the pair-x kernel's 14-strip model (which counts
    pipeline-double-buffered BlockSpec input strips and two staged output
    buffers), the mono x-stage reads its two strips as VALUES from the
    VMEM-resident field and stores back in place — its live set is the
    forward spectra of the pair + the lane/sublane-negated mirror copies +
    the combine outputs, ~8 strip-equivalents (the round-3 model's borrowed
    14-strip figure over-counted by the in/out buffers the mono form does
    not have, silently rejecting the kernel's own 2048^2 design point —
    ADVICE.md round 3; the round-4 hardware smoke must show mono ENGAGED
    (rec["engaged"]["mono"] is True in the smoke JSON) compiling and
    matching the oracle at 2048^2 before any default routes through it)."""
    if not (pallas_fft_supported(M) and pallas_fft_supported(P)
            and _x_blockspec_fits(M, P)):
        return False
    field = 2 * M * P * 4
    g_ops = 2 * ((M // _N1) + (P // _N1)) * 2 * _N1 * _N1 * 4
    strip = 2 * M * _N1 * 4
    ytile = 8 * _pick_rows(M, P) * P * 4
    return field + g_ops + max(8 * strip, ytile) <= _VMEM_TARGET_STREAM


def _build_mono_kernel(M: int, P: int, consts, R: int,
                       mxu: str = "highest"):
    """The ENTIRE packed modal inversion as ONE kernel HBM pass.

    At 2048^2 the packed planar field is 33.6 MB — it fits in v5e VMEM
    (128 MB physical), so instead of three kernel passes (forward-y, pair-x,
    inverse-y) each paying an HBM read+write of the field, a single kernel
    DMAs the field in ONCE, runs all three stages on the VMEM-resident
    array in place, and DMAs psi out ONCE: 4 planes of HBM traffic for the
    whole inversion instead of 12.

    Exploits the TPU grid's sequential execution (scratch persists across
    grid invocations — the same property the streaming kernels'
    double-buffering relies on): grid = (n2y//2 + 1,) mirror pairs exactly
    as _build_pair_x_kernel; invocation 0 additionally performs the input
    DMA + forward-y (fori_loop over row tiles), the last invocation the
    inverse-y + output DMA. The x-stage reads its two strips as values
    before overwriting them, and distinct pairs touch disjoint strips, so
    the in-place update is race-free.

    Same math as forward-y + pair-x + inverse-y (the composition the
    equality test asserts): identical per-block op sequence, so results
    match the 3-pass path exactly.
    """
    N2, _, _, _ = _plan(M, "x", False)
    n2y = P // _N1
    yf = make_y_tile_transform(P, inverse=False, mxu=mxu)
    yb = make_y_tile_transform(P, inverse=True, mxu=mxu)

    def kernel(gyfr, gyfi, gybr, gybi, gxfr, gxfi, gxir, gxii,
               z_hbm, o_hbm, field, sems):
        i = pl.program_id(0)
        nprog = pl.num_programs(0)

        def row_tiles(transform, gr, gi):
            def body(t, carry):
                r0 = pl.multiple_of(t * R, 8)
                yr, yi = transform(field[0, pl.ds(r0, R), :],
                                   field[1, pl.ds(r0, R), :], gr, gi)
                field[0, pl.ds(r0, R), :] = yr
                field[1, pl.ds(r0, R), :] = yi
                return carry
            jax.lax.fori_loop(0, M // R, body, 0)

        @pl.when(i == 0)
        def _():
            cp = pltpu.make_async_copy(z_hbm, field, sems.at[0])
            cp.start()
            cp.wait()
            row_tiles(yf, gyfr, gyfi)

        # --- mirror-pair x-stage on the VMEM-resident y-spectrum ---
        a = i
        b = jax.lax.rem(jnp.asarray(n2y, i.dtype) - i,
                        jnp.asarray(n2y, i.dtype))
        jflip, jroll = _perm_matrices()

        def load_strip(j):
            off = pl.multiple_of(j * _N1, _N1)
            return (field[0, :, pl.ds(off, _N1)],
                    field[1, :, pl.ds(off, _N1)])

        def blk(arr, c):
            return arr[c * _N1:(c + 1) * _N1, :]

        def fwd(xr, xi):
            smalls = _chunk_dft([(blk(xr, s), blk(xi, s))
                                 for s in range(N2)], -1)
            return [
                _cdot(sr, si, gxfr[c], gxfi[c], left=True, mxu=mxu)
                for c, (sr, si) in enumerate(smalls)
            ]

        Wa = fwd(*load_strip(a))
        Wb = fwd(*load_strip(b))

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
                pairs.append(_cdot(vr, vi, gxir[c], gxii[c], left=True,
                                   mxu=mxu))
            return _chunk_dft(pairs, +1, 1.0 / N2)

        Va = invert(Wa, Wb, a)
        Vb = invert(Wb, Wa, b)

        def store_strip(V, j):
            off = pl.multiple_of(j * _N1, _N1)
            for c in range(N2):
                sr, si = V[c]
                field[0, c * _N1:(c + 1) * _N1, pl.ds(off, _N1)] = sr
                field[1, c * _N1:(c + 1) * _N1, pl.ds(off, _N1)] = si

        store_strip(Va, a)

        @pl.when(b != a)
        def _():
            store_strip(Vb, b)

        @pl.when(i == nprog - 1)
        def _():
            row_tiles(yb, gybr, gybi)
            cp = pltpu.make_async_copy(field, o_hbm, sems.at[1])
            cp.start()
            cp.wait()

    return kernel


def _build_fwd_symbol_inv_x_kernel_offset(M: int, P: int, consts,
                                          mxu: str = "highest"):
    """Sharded single-pass x-stage: forward-x of the local y-spectrum strip
    AND its pre-mirrored companion, symbol stage, inverse-x — one kernel.

    The distributed packed inverter (tpu_qg.parallel.packed) already carries
    a pre-mirrored companion block through the transpose (strip j = y-mirror
    strip of the y-spectrum); forwarding both here and using fwd(companion)
    as the mirror spectrum collapses its three x-stage kernel passes
    (fwd-x(Z), fwd-x(Zm), offset symbol+inverse-x) into one, so neither W
    nor Wm ever touches HBM. Global strip index = off_ref[0] + program_id
    (scalar prefetch), as in _build_symbol_inv_x_kernel_offset.
    """
    N2, _, _, _ = _plan(M, "x", False)

    def kernel(off_ref, gfr, gfi, gir, gii, za_ref, zm_ref, o_ref):
        j = off_ref[0] + pl.program_id(0)      # global strip index
        jflip, jroll = _perm_matrices()

        def blk(arr, c):
            return arr[c * _N1:(c + 1) * _N1, :]

        def fwd(x_ref):
            xr, xi = x_ref[0], x_ref[1]
            smalls = _chunk_dft([(blk(xr, s), blk(xi, s))
                                 for s in range(N2)], -1)
            return [
                _cdot(sr, si, gfr[c], gfi[c], left=True, mxu=mxu)
                for c, (sr, si) in enumerate(smalls)
            ]

        W = fwd(za_ref)
        Wm = fwd(zm_ref)

        jlane = jnp.where(j == 0, jroll, jflip)
        WmL = [(_pdot(wr, jlane), _pdot(wi, jlane)) for wr, wi in Wm]
        pairs = []
        for c in range(N2):
            r = (-c) % N2
            jrow = jroll if c == 0 else jflip
            wnr = _pdot(WmL[r][0], jrow, left=True)
            wni = _pdot(WmL[r][1], jrow, left=True)
            ar, ai, br, bi = _symbols_for_block(M, P, c, j, consts)
            wr_, wi_ = W[c]
            vr = ar * wr_ - ai * wi_ + br * wnr + bi * wni
            vi = ai * wr_ + ar * wi_ + bi * wnr - br * wni
            pairs.append(_cdot(vr, vi, gir[c], gii[c], left=True, mxu=mxu))

        outs = _chunk_dft(pairs, +1, 1.0 / N2)
        for c in range(N2):
            sr, si = outs[c]
            o_ref[0, c * _N1:(c + 1) * _N1, :] = sr
            o_ref[1, c * _N1:(c + 1) * _N1, :] = si

    return kernel


def stream_pair_x_footprint(M: int) -> int:
    """Explicit VMEM model for the streaming fwd+symbol+inverse-x pair
    kernel (_build_streaming_fwd_sym_inv_x_pair): 2 single-buffered input
    strips (Zy, Zm) + 1 output stage + ~4 strip-equivalents of live values
    (W, lane-negated Wm, combine pairs, small-stage outputs) + both
    directions' G stacks."""
    strip = 2 * M * _N1 * 4
    g = 2 * 2 * (M // _N1) * _N1 * _N1 * 4
    return 2 * strip + strip + 4 * strip + g


# The streaming pair kernel manages every buffer explicitly (single-buffered
# inputs, one staged output) so it budgets closer to the 128 MB physical
# VMEM than the generic-stream target. Mosaic's stack accounting for the
# M = 8192 form measured 114.97 MB at compile (r4 phase J) — ~1.5x the
# naive buffers+live-set model (the unrolled N2 = 64 combine keeps more
# values live than the model counts) — so the limit sits near physical
# VMEM and the 8192 form is validated by an on-chip compile probe
# (scripts/stream_probe.py), not by the model alone.
_VMEM_LIMIT_STREAM_PAIR = 124 * 1024 * 1024
_VMEM_TARGET_STREAM_PAIR = int(0.80 * _VMEM_LIMIT_STREAM_PAIR)


def _build_streaming_fwd_sym_inv_x_pair(M: int, P: int, consts,
                                        mxu: str = "highest",
                                        mirror_from_self: bool = False):
    """Streaming form of ``_build_fwd_symbol_inv_x_kernel_offset`` (the
    distributed packed inversion's single-pass x-stage) for extents where
    the (2, M, 128) BlockSpec pipeline does not fit (M = 8192).

    Grid over the LOCAL 128-lane strips of the transposed column block;
    per strip i: blocking manual DMA of the y-spectrum strip (za) and its
    pre-mirrored companion strip (zm) into single-buffered VMEM, forward-x
    of both (fwd(companion) IS the mirror spectrum, as in the BlockSpec
    form), symbols at GLOBAL strip index off + i built from iotas, inverse
    MXU + recursive small stage, staged output DMA overlapped with the next
    strip's compute. Single-buffered inputs: the kernel is MXU/VPU-bound
    (two forwards + one inverse per strip), so input-fetch overlap matters
    less than staying inside the explicit VMEM budget
    (``stream_pair_x_footprint``).

    ``mirror_from_self=True`` is the SINGLE-CHIP form: both operands are
    the full y-spectral field and the companion DMA fetches the y-mirror
    strip (n2y - j) % n2y of the SAME array — the whole inversion becomes
    three kernel HBM passes (forward-y, this, inverse-y) at extents where
    the BlockSpec mirror-pair kernel does not fit (4096^2, 8192^2; round
    4 — previously those ran a 4-pass form, paying one extra full-field
    HBM round trip for the spectrum)."""
    N2, _, _, _ = _plan(M, "x", False)
    n2y_g = P // _N1

    def kernel(off_ref, gfr, gfi, gir, gii, za_hbm, zm_hbm, o_ref,
               za_buf, zm_buf, stage, sems):
        i = pl.program_id(0)
        n = pl.num_programs(0)
        j = off_ref[0] + i              # global strip index
        jflip, jroll = _perm_matrices()

        if mirror_from_self:
            m_idx = jax.lax.rem(jnp.asarray(n2y_g, j.dtype) - j,
                                jnp.asarray(n2y_g, j.dtype))
        else:
            m_idx = i
        cp_a = pltpu.make_async_copy(
            za_hbm.at[:, :, pl.ds(i * _N1, _N1)], za_buf, sems.at[0])
        cp_m = pltpu.make_async_copy(
            zm_hbm.at[:, :, pl.ds(m_idx * _N1, _N1)], zm_buf, sems.at[1])
        cp_a.start()
        cp_m.start()
        cp_a.wait()
        cp_m.wait()

        # The single output stage is reused every strip: strip i-1's store
        # must have drained before we overwrite it.
        @pl.when(i > 0)
        def _():
            pltpu.make_async_copy(
                stage, o_ref.at[:, :, pl.ds((i - 1) * _N1, _N1)],
                sems.at[2]).wait()

        def blk(a, c):
            return a[c * _N1:(c + 1) * _N1, :]

        def fwd(buf):
            xr, xi = buf[0], buf[1]
            smalls = _chunk_dft([(blk(xr, s), blk(xi, s))
                                 for s in range(N2)], -1)
            return [
                _cdot(sr, si, gfr[c], gfi[c], left=True, mxu=mxu)
                for c, (sr, si) in enumerate(smalls)
            ]

        W = fwd(za_buf)
        Wm = fwd(zm_buf)

        jlane = jnp.where(j == 0, jroll, jflip)
        WmL = [(_pdot(wr, jlane), _pdot(wi, jlane)) for wr, wi in Wm]
        pairs = []
        for c in range(N2):
            r = (-c) % N2
            jrow = jroll if c == 0 else jflip
            wnr = _pdot(WmL[r][0], jrow, left=True)
            wni = _pdot(WmL[r][1], jrow, left=True)
            ar, ai, br, bi = _symbols_for_block(M, P, c, j, consts)
            wr_, wi_ = W[c]
            vr = ar * wr_ - ai * wi_ + br * wnr + bi * wni
            vi = ai * wr_ + ar * wi_ + bi * wnr - br * wni
            pairs.append(_cdot(vr, vi, gir[c], gii[c], left=True, mxu=mxu))

        outs = _chunk_dft(pairs, +1, 1.0 / N2)
        for c in range(N2):
            sr, si = outs[c]
            stage[0, c * _N1:(c + 1) * _N1, :] = sr
            stage[1, c * _N1:(c + 1) * _N1, :] = si

        cp_o = pltpu.make_async_copy(
            stage, o_ref.at[:, :, pl.ds(i * _N1, _N1)], sems.at[2])
        cp_o.start()

        @pl.when(i == n - 1)
        def _():
            cp_o.wait()

    return kernel


def _build_streaming_x(M: int, P: int, *, inverse: bool, consts=None,
                       mxu: str = "highest"):
    """Streaming x-transform kernel: grid over 128-column strips with manual
    HBM DMA — input strips double-buffered (strip i+1's fetch overlaps strip
    i's compute), output staged through one VMEM buffer whose store-DMA
    overlaps the next strip's work. The (2, M, 128) strips never enter the
    BlockSpec pipeline, so the footprint is explicit and fits at M = 8192
    (where the BlockSpec form's 4x-buffered 8 MB blocks cannot).

    consts != None additionally fuses the packed-inversion symbol stage
    (inverse only): a second DMA stream delivers the mirror strip
    (N2y - j) % N2y straight from the same HBM operand.
    """
    N2, _, _, _ = _plan(M, "x", inverse)
    fuse = consts is not None
    assert not fuse or inverse
    n2y = P // _N1

    def kernel(gr_ref, gi_ref, x_hbm, o_ref, in_buf, wm_buf, stage, sems):
        i = pl.program_id(0)
        n = pl.num_programs(0)
        two = jnp.asarray(2, i.dtype)

        def in_copy(j, slot):
            return pltpu.make_async_copy(
                x_hbm.at[:, :, pl.ds(j * _N1, _N1)], in_buf.at[slot],
                sems.at[slot])

        def wm_copy(j, slot):
            m = jax.lax.rem(jnp.asarray(n2y, j.dtype) - j,
                            jnp.asarray(n2y, j.dtype))
            return pltpu.make_async_copy(
                x_hbm.at[:, :, pl.ds(m * _N1, _N1)], wm_buf.at[slot],
                sems.at[2 + slot])

        def out_copy(j):
            return pltpu.make_async_copy(
                stage, o_ref.at[:, :, pl.ds(j * _N1, _N1)], sems.at[4])

        def start(j, slot):
            in_copy(j, slot).start()
            if fuse:
                wm_copy(j, slot).start()

        def wait_in(j, slot):
            in_copy(j, slot).wait()
            if fuse:
                wm_copy(j, slot).wait()

        @pl.when(i == 0)
        def _():
            start(jnp.asarray(0, i.dtype), 0)

        @pl.when(i + 1 < n)
        def _():
            start(i + 1, jax.lax.rem(i + 1, two))

        slot = jax.lax.rem(i, two)
        wait_in(i, slot)
        # The single output stage is reused every strip: strip i-1's store
        # must have drained before we overwrite it.
        @pl.when(i > 0)
        def _():
            out_copy(i - 1).wait()

        def load(buf, plane):
            return buf[pl.ds(slot, 1), plane][0]          # (M, 128)

        xr, xi = load(in_buf, 0), load(in_buf, 1)

        def blk(a, c):
            return a[c * _N1:(c + 1) * _N1, :]

        if not inverse:
            smalls = _chunk_dft([(blk(xr, s), blk(xi, s))
                                 for s in range(N2)], -1)
            for b in range(N2):
                sr, si = smalls[b]
                orr, oii = _cdot(sr, si, gr_ref[b], gi_ref[b], left=True,
                                 mxu=mxu)
                stage[0, b * _N1:(b + 1) * _N1, :] = orr
                stage[1, b * _N1:(b + 1) * _N1, :] = oii
        else:
            if fuse:
                jflip, jroll = _perm_matrices()
                jlane = jnp.where(i == 0, jroll, jflip)
                wmr = _pdot(load(wm_buf, 0), jlane)
                wmi = _pdot(load(wm_buf, 1), jlane)
            pairs = []
            for c in range(N2):
                vr, vi = blk(xr, c), blk(xi, c)
                if fuse:
                    r = (-c) % N2
                    jrow = jroll if c == 0 else jflip
                    wnr = _pdot(blk(wmr, r), jrow, left=True)
                    wni = _pdot(blk(wmi, r), jrow, left=True)
                    ar, ai, br, bi = _symbols_for_block(M, P, c, i, consts)
                    vr, vi = (ar * vr - ai * vi + br * wnr + bi * wni,
                              ai * vr + ar * vi + bi * wnr - br * wni)
                pairs.append(_cdot(vr, vi, gr_ref[c], gi_ref[c], left=True,
                                   mxu=mxu))
            outs = _chunk_dft(pairs, +1, 1.0 / N2)
            for b in range(N2):
                sr, si = outs[b]
                stage[0, b * _N1:(b + 1) * _N1, :] = sr
                stage[1, b * _N1:(b + 1) * _N1, :] = si

        out_copy(i).start()

        @pl.when(i == n - 1)
        def _():
            out_copy(i).wait()

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

    def __init__(self, M: int, P: int, interpret: bool = False,
                 stream_x: bool = None, mxu: str = "highest"):
        if not planar_fft2_fits(M, P):
            raise ValueError(f"PlanarFFT2 unsupported for {(M, P)}: each "
                             "extent must be 128 * N2 with N2 <= 64 and the "
                             "kernels must fit the scoped-VMEM budget")
        assert mxu in ("highest", "bf16x3"), mxu
        self.M, self.P = M, P
        self._mxu = mxu
        # Mosaic only targets TPU; everywhere else run the kernels in
        # interpret mode (tests, CPU oracles).
        self.interpret = interpret or jax.default_backend() != "tpu"
        # x-direction kernel form: BlockSpec pipeline when its 4x-buffered
        # (2, M, 128) blocks fit VMEM, else the manually-DMA'd streaming
        # form (M >= 8192). stream_x=True forces streaming (tests).
        self._stream_x = (not _x_blockspec_fits(M, P)) if stream_x is None \
            else stream_x
        self._R = _pick_rows(M, P)
        self._C = _pick_cols(M, P)
        self._kern, self._G = {}, {}
        for inv in (False, True):
            self._kern[("y", inv)] = _build_kernel(P, axis="y", inverse=inv,
                                                   mxu=mxu)
            self._kern[("x", inv)] = _build_kernel(M, axis="x", inverse=inv,
                                                   mxu=mxu)
            _, _, gry, giy = _plan(P, "y", inv)
            _, _, grx, gix = _plan(M, "x", inv)
            self._G[("y", inv)] = (jnp.asarray(gry), jnp.asarray(giy))
            self._G[("x", inv)] = (jnp.asarray(grx), jnp.asarray(gix))
        self._sym_kern_cache = {}

    def _call_y(self, z: Array, inverse: bool) -> Array:
        # Row count follows the operand, not the constructor's M: inside a
        # row-sharded shard_map the local block is (2, M/nx, P) and the
        # y-transform is row-independent, so the same kernel serves any row
        # count that tiles.
        rows, P = z.shape[1], self.P
        R = self._R if rows % self._R == 0 else _pick_rows(rows, P)
        gr, gi = self._G[("y", inverse)]
        n2 = gr.shape[0]
        gspec = pl.BlockSpec((n2, _N1, _N1), lambda i: (0, 0, 0))
        return pl.pallas_call(
            self._kern[("y", inverse)],
            grid=(rows // R,),
            in_specs=[gspec, gspec,
                      pl.BlockSpec((2, R, P), lambda i: (0, i, 0))],
            out_specs=pl.BlockSpec((2, R, P), lambda i: (0, i, 0)),
            out_shape=jax.ShapeDtypeStruct(z.shape, z.dtype),
            interpret=self.interpret,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=_VMEM_LIMIT),
        )(gr, gi, z)

    def _call_x_stream(self, z: Array, inverse: bool, consts=None) -> Array:
        """Streaming x-kernel dispatch (see _build_streaming_x)."""
        M, P = self.M, self.P
        gr, gi = self._G[("x", inverse)]
        n2x = gr.shape[0]
        key = ("stream", inverse, consts)
        if key not in self._sym_kern_cache:
            self._sym_kern_cache[key] = _build_streaming_x(
                M, P, inverse=inverse, consts=consts, mxu=self._mxu)
        fuse = consts is not None
        gspec = pl.BlockSpec((n2x, _N1, _N1), lambda j: (0, 0, 0))
        return pl.pallas_call(
            self._sym_kern_cache[key],
            grid=(P // _N1,),
            in_specs=[gspec, gspec,
                      pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
            out_shape=jax.ShapeDtypeStruct((2, M, P), z.dtype),
            scratch_shapes=[
                pltpu.VMEM((2, 2, M, _N1), z.dtype),
                # Mirror-strip buffer only materializes when fused.
                pltpu.VMEM((2, 2, M, _N1) if fuse else (2, 2, 8, _N1),
                           z.dtype),
                pltpu.VMEM((2, M, _N1), z.dtype),
                pltpu.SemaphoreType.DMA((5,)),
            ],
            interpret=self.interpret,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=_VMEM_LIMIT_STREAM),
        )(gr, gi, z)

    def _call_x(self, z: Array, inverse: bool) -> Array:
        if self._stream_x:
            return self._call_x_stream(z, inverse)
        # Column count follows the operand (inside an x-sharded shard_map the
        # transposed block is (2, M, P/nx)); the x-transform is
        # column-independent so any 128-multiple width works.
        M, cols = self.M, z.shape[2]
        C = self._C if cols % self._C == 0 else _N1
        gr, gi = self._G[("x", inverse)]
        n2 = gr.shape[0]
        gspec = pl.BlockSpec((n2, _N1, _N1), lambda j: (0, 0, 0))
        return pl.pallas_call(
            self._kern[("x", inverse)],
            grid=(cols // C,),
            in_specs=[gspec, gspec,
                      pl.BlockSpec((2, M, C), lambda j: (0, 0, j))],
            out_specs=pl.BlockSpec((2, M, C), lambda j: (0, 0, j)),
            out_shape=jax.ShapeDtypeStruct(z.shape, z.dtype),
            interpret=self.interpret,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=_VMEM_LIMIT),
        )(gr, gi, z)

    def _call_x_symbols(self, Z: Array, consts) -> Array:
        """Fused symbol multiply + inverse-x transform: one kernel computing
        ifft_x(A * W + B * conj(W(-k))) per 128-column strip, with the mirror
        strip delivered by the BlockSpec index map and the symbols computed
        in-kernel from iotas."""
        if self._stream_x:
            return self._call_x_stream(Z, True, consts)
        M, P = self.M, self.P
        gr, gi = self._G[("x", True)]
        if consts not in self._sym_kern_cache:
            self._sym_kern_cache[consts] = _build_symbol_inv_x_kernel(
                M, P, consts, mxu=self._mxu)
        n2x = gr.shape[0]
        n2y = P // _N1
        gspec = pl.BlockSpec((n2x, _N1, _N1), lambda j: (0, 0, 0))
        wspec = pl.BlockSpec((2, M, _N1), lambda j: (0, 0, j))
        mspec = pl.BlockSpec((2, M, _N1), lambda j: (0, 0, (n2y - j) % n2y))
        return pl.pallas_call(
            self._sym_kern_cache[consts],
            grid=(n2y,),
            in_specs=[gspec, gspec, wspec, mspec],
            out_specs=pl.BlockSpec((2, M, _N1), lambda j: (0, 0, j)),
            out_shape=jax.ShapeDtypeStruct((2, M, P), Z.dtype),
            interpret=self.interpret,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=_VMEM_LIMIT),
        )(gr, gi, Z, Z)

    def _call_x_fwd_symbols_offset(self, Zy: Array, Zm: Array, consts,
                                   strip_offset: Array) -> Array:
        """Sharded single-pass x-stage over local column blocks of the
        y-spectrum and its pre-mirrored companion (see
        _build_fwd_symbol_inv_x_kernel_offset); routes to the manual-DMA
        streaming form (_build_streaming_fwd_sym_inv_x_pair) when the
        BlockSpec pipeline does not fit (M = 8192)."""
        M = self.M
        cols = Zy.shape[2]
        if self._stream_x:
            key = ("fwd-offset-stream", consts)
            if key not in self._sym_kern_cache:
                self._sym_kern_cache[key] = \
                    _build_streaming_fwd_sym_inv_x_pair(
                        M, self.P, consts, mxu=self._mxu)
            gfr, gfi = self._G[("x", False)]
            gir, gii = self._G[("x", True)]
            n2x = gfr.shape[0]
            gspec = pl.BlockSpec((n2x, _N1, _N1), lambda i, s: (0, 0, 0))
            hspec = pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM)
            grid_spec = pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(cols // _N1,),
                in_specs=[gspec, gspec, gspec, gspec, hspec, hspec],
                out_specs=hspec,
                scratch_shapes=[
                    pltpu.VMEM((2, M, _N1), Zy.dtype),
                    pltpu.VMEM((2, M, _N1), Zy.dtype),
                    pltpu.VMEM((2, M, _N1), Zy.dtype),
                    pltpu.SemaphoreType.DMA((3,)),
                ],
            )
            return pl.pallas_call(
                self._sym_kern_cache[key],
                grid_spec=grid_spec,
                out_shape=jax.ShapeDtypeStruct(Zy.shape, Zy.dtype),
                interpret=self.interpret,
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=_VMEM_LIMIT_STREAM_PAIR),
            )(jnp.asarray(strip_offset, jnp.int32).reshape(1),
              gfr, gfi, gir, gii, Zy, Zm)
        gfr, gfi = self._G[("x", False)]
        gir, gii = self._G[("x", True)]
        key = ("fwd-offset", consts)
        if key not in self._sym_kern_cache:
            self._sym_kern_cache[key] = _build_fwd_symbol_inv_x_kernel_offset(
                M, self.P, consts, mxu=self._mxu)
        n2x = gfr.shape[0]
        gspec = pl.BlockSpec((n2x, _N1, _N1), lambda i, s: (0, 0, 0))
        wspec = pl.BlockSpec((2, M, _N1), lambda i, s: (0, 0, i))
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(cols // _N1,),
            in_specs=[gspec, gspec, gspec, gspec, wspec, wspec],
            out_specs=pl.BlockSpec((2, M, _N1), lambda i, s: (0, 0, i)),
        )
        return pl.pallas_call(
            self._sym_kern_cache[key],
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct(Zy.shape, Zy.dtype),
            interpret=self.interpret,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=_VMEM_LIMIT),
        )(jnp.asarray(strip_offset, jnp.int32).reshape(1),
          gfr, gfi, gir, gii, Zy, Zm)

    def pair_x_symbols(self, Zy: Array, consts) -> Array:
        """y-spectral field -> ifft_x(A W + B conj(W(-k))) with W = fft_x(Zy)
        computed IN-KERNEL per mirror strip pair: forward-x, symbol stage,
        and inverse-x in one HBM pass (see _build_pair_x_kernel). Composes
        with _call_y on both sides for the 3-pass packed inversion / 2-pass
        chain step."""
        M, P = self.M, self.P
        gfr, gfi = self._G[("x", False)]
        gir, gii = self._G[("x", True)]
        key = ("pair", consts)
        if key not in self._sym_kern_cache:
            self._sym_kern_cache[key] = _build_pair_x_kernel(
                M, P, consts, mxu=self._mxu)
        n2x = gfr.shape[0]
        n2y = P // _N1
        gspec = pl.BlockSpec((n2x, _N1, _N1), lambda i: (0, 0, 0))
        aspec = pl.BlockSpec((2, M, _N1), lambda i: (0, 0, i))
        bspec = pl.BlockSpec((2, M, _N1), lambda i: (0, 0, (n2y - i) % n2y))
        return pl.pallas_call(
            self._sym_kern_cache[key],
            grid=(n2y // 2 + 1,),
            in_specs=[gspec, gspec, gspec, gspec, aspec, bspec],
            out_specs=pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
            out_shape=jax.ShapeDtypeStruct((2, M, P), Zy.dtype),
            scratch_shapes=[
                pltpu.VMEM((2, M, _N1), Zy.dtype),
                pltpu.VMEM((2, M, _N1), Zy.dtype),
                pltpu.SemaphoreType.DMA((2,)),
            ],
            interpret=self.interpret,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=_VMEM_LIMIT),
        )(gfr, gfi, gir, gii, Zy, Zy)

    def stream_pair_symbols(self, Zy: Array, consts) -> Array:
        """Single-chip streaming form of ``pair_x_symbols``: forward-x,
        packed symbols, inverse-x in ONE manual-DMA streaming pass, the
        mirror strip fetched from the SAME operand at (n2y - j) % n2y
        (see _build_streaming_fwd_sym_inv_x_pair(mirror_from_self=True)).
        For extents where the BlockSpec pair kernel does not fit; caller
        must check ``stream_pair_x_footprint``."""
        M, P = self.M, self.P
        gfr, gfi = self._G[("x", False)]
        gir, gii = self._G[("x", True)]
        key = ("stream-pair-self", consts)
        if key not in self._sym_kern_cache:
            self._sym_kern_cache[key] = _build_streaming_fwd_sym_inv_x_pair(
                M, P, consts, mxu=self._mxu, mirror_from_self=True)
        n2x = gfr.shape[0]
        gspec = pl.BlockSpec((n2x, _N1, _N1), lambda i, s: (0, 0, 0))
        hspec = pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(P // _N1,),
            in_specs=[gspec, gspec, gspec, gspec, hspec, hspec],
            out_specs=hspec,
            scratch_shapes=[
                pltpu.VMEM((2, M, _N1), Zy.dtype),
                pltpu.VMEM((2, M, _N1), Zy.dtype),
                pltpu.VMEM((2, M, _N1), Zy.dtype),
                pltpu.SemaphoreType.DMA((3,)),
            ],
        )
        return pl.pallas_call(
            self._sym_kern_cache[key],
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((2, M, P), Zy.dtype),
            interpret=self.interpret,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=_VMEM_LIMIT_STREAM_PAIR),
        )(jnp.zeros((1,), jnp.int32), gfr, gfi, gir, gii, Zy, Zy)

    def mono_invert(self, z: Array, consts) -> Array:
        """Packed natural-order field -> psi in ONE kernel HBM pass: the
        field rides VMEM-resident through forward-y, the mirror-pair
        x-stage (forward-x + symbols + inverse-x), and inverse-y (see
        _build_mono_kernel). Caller must check ``mono_fits(M, P)``."""
        M, P = self.M, self.P
        key = ("mono", consts)
        if key not in self._sym_kern_cache:
            self._sym_kern_cache[key] = _build_mono_kernel(
                M, P, consts, R=self._R, mxu=self._mxu)
        n2y = P // _N1
        ops = []
        specs = []
        for axis, inv in (("y", False), ("y", True),
                          ("x", False), ("x", True)):
            gr, gi = self._G[(axis, inv)]
            ops += [gr, gi]
            spec = pl.BlockSpec(gr.shape, lambda i: (0, 0, 0))
            specs += [spec, spec]
        return pl.pallas_call(
            self._sym_kern_cache[key],
            grid=(n2y // 2 + 1,),
            in_specs=specs + [pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
            out_shape=jax.ShapeDtypeStruct((2, M, P), z.dtype),
            scratch_shapes=[
                pltpu.VMEM((2, M, P), z.dtype),
                pltpu.SemaphoreType.DMA((2,)),
            ],
            interpret=self.interpret,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=_VMEM_LIMIT_STREAM),
        )(*ops, z)

    def forward(self, z: Array) -> Array:
        """Planar (2, M, P) natural order -> planar permuted spectrum."""
        return self._call_x(self._call_y(z, False), False)

    def inverse(self, Z: Array) -> Array:
        """Planar permuted spectrum -> planar natural order (scaled 1/MP)."""
        return self._call_y(self._call_x(Z, True), True)

    def inverse_with_symbols(self, Z: Array, consts) -> Array:
        """Planar permuted spectrum W -> ifft2(A W + B conj(W(-k))), natural
        order: the packed modal inversion's entire spectral stage fused into
        the inverse-x kernel. ``consts`` = the hashable scalar tuple
        (n2x, n2y, inv_dx2, alpha2, a1, a2, b1, b2) consumed by
        _symbols_for_block."""
        return self._call_y(self._call_x_symbols(Z, consts), True)
