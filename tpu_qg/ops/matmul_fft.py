"""MXU matmul-factorized DFT for the elliptic inversion.

XLA's TPU FFT thunk is a generic black box; the inversion only needs a
*diagonalizing* transform, not the standard-order FFT. A radix-(N1, N2)
Cooley-Tukey factorization expresses the N-point DFT as two batched small
matmuls (MXU work) plus a twiddle multiply (VPU, fused by XLA):

    X[k1 + N1 k2] = sum_{n2} W_N^{n2 k1} W_{N2}^{n2 k2}
                    [ sum_{n1} x[N2 n1 + n2] W_{N1}^{n1 k1} ]

We keep the output in PERMUTED order — slot j = k1*N2 + k2 holds frequency
k1 + N1*k2 (`freq_order`) — and never pay the digit-reversal transpose: the
inverse transform consumes the same order, and spectral symbols are simply
evaluated at the permuted frequencies.

This exists purely as a speed alternative to jnp.fft inside
tpu_qg.ops.spectral.PackedModalInverter (reference counterpart: the cached
sparse Cholesky backsolves, src/schemes/laplacian.jl:60-75); the jnp.fft path
remains the default/oracle.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import Array

_PREC = jax.lax.Precision.HIGHEST


def split_factor(N: int) -> tuple[int, int]:
    """N = N1 * N2 with N1 the largest divisor <= 128 (MXU-sized)."""
    best = 1
    for f in range(1, min(128, N) + 1):
        if N % f == 0:
            best = f
    return best, N // best


def freq_order(N: int) -> np.ndarray:
    """freq_order(N)[j] = the frequency held in permuted slot j."""
    N1, N2 = split_factor(N)
    k1 = np.arange(N1)[:, None]
    k2 = np.arange(N2)[None, :]
    return (k1 + N1 * k2).reshape(N1 * N2)


def _dft(N: int, sign: int, dtype) -> np.ndarray:
    k = np.arange(N)
    return np.exp(sign * 2j * np.pi * np.outer(k, k) / N).astype(dtype)


def _twiddle(N1: int, N2: int, sign: int, dtype) -> np.ndarray:
    k1 = np.arange(N1)[:, None]
    n2 = np.arange(N2)[None, :]
    return np.exp(sign * 2j * np.pi * k1 * n2 / (N1 * N2)).astype(dtype)


class FactoredFFT:
    """Forward/inverse N-point DFT along one axis, permuted spectral order.

    forward: natural-order samples -> permuted-order spectrum (sign -1).
    inverse: permuted-order spectrum -> natural-order samples (sign +1, 1/N).
    """

    def __init__(self, N: int, dtype=np.complex64):
        self.N = N
        self.N1, self.N2 = split_factor(N)
        self.F1f = _dft(self.N1, -1, dtype)
        self.F2f = _dft(self.N2, -1, dtype)
        self.twf = _twiddle(self.N1, self.N2, -1, dtype)
        self.F1i = _dft(self.N1, +1, dtype) / self.N1
        self.F2i = _dft(self.N2, +1, dtype) / self.N2
        self.twi = _twiddle(self.N1, self.N2, +1, dtype)

    def _split(self, x: Array, axis: int):
        shape = list(x.shape)
        shape[axis:axis + 1] = [self.N1, self.N2]
        return x.reshape(shape)

    def _merge(self, x: Array, axis: int):
        shape = list(x.shape)
        shape[axis:axis + 2] = [self.N]
        return x.reshape(shape)

    def forward(self, x: Array, axis: int = -1) -> Array:
        """x natural order along ``axis`` -> permuted-order spectrum."""
        axis = axis % x.ndim
        y = self._split(x, axis)                      # (..., n1, n2, ...)
        a = axis
        y = jnp.tensordot(jnp.asarray(self.F1f), y, axes=([1], [a]),
                          precision=_PREC)            # (k1, ..., n2, ...)
        y = jnp.moveaxis(y, 0, a)
        tw = jnp.asarray(self.twf).reshape(
            (1,) * a + (self.N1, self.N2) + (1,) * (y.ndim - a - 2))
        y = y * tw
        y = jnp.tensordot(jnp.asarray(self.F2f), y, axes=([1], [a + 1]),
                          precision=_PREC)            # (k2, ..., k1, ...)
        y = jnp.moveaxis(y, 0, a + 1)                 # (..., k1, k2, ...)
        return self._merge(y, axis)

    def inverse(self, X: Array, axis: int = -1) -> Array:
        """Permuted-order spectrum along ``axis`` -> natural-order samples."""
        axis = axis % X.ndim
        y = self._split(X, axis)                      # (..., k1, k2, ...)
        a = axis
        y = jnp.tensordot(jnp.asarray(self.F2i), y, axes=([1], [a + 1]),
                          precision=_PREC)            # (n2, ..., k1, ...)
        y = jnp.moveaxis(y, 0, a + 1)                 # (..., k1, n2, ...)
        tw = jnp.asarray(self.twi).reshape(
            (1,) * a + (self.N1, self.N2) + (1,) * (y.ndim - a - 2))
        y = y * tw
        y = jnp.tensordot(jnp.asarray(self.F1i), y, axes=([1], [a]),
                          precision=_PREC)            # (n1, ..., n2, ...)
        y = jnp.moveaxis(y, 0, a)
        return self._merge(y, axis)

    def negate_spectrum(self, X: Array, axis: int = -1) -> Array:
        """X(k) -> X(-k mod N) in the permuted order, via structured flips
        on the (k1, k2) view (no gather): -(k1 + N1 k2) corresponds to
        k1' = (-k1) % N1 and k2' = (N2-1-k2) for k1 > 0, (-k2) % N2 for k1 == 0.
        """
        axis = axis % X.ndim
        y = self._split(X, axis)
        a = axis
        # k1 -> (-k1) % N1: flip then roll by one (slot 0 stays).
        y = jnp.roll(jnp.flip(y, axis=a), 1, axis=a)
        # k2 -> N2-1-k2 everywhere ...
        y = jnp.flip(y, axis=a + 1)
        # ... except the k1 == 0 plane, which needs (-k2) % N2 = roll(flip).
        idx = [slice(None)] * y.ndim
        idx[a] = slice(0, 1)
        plane = jnp.roll(y[tuple(idx)], 1, axis=a + 1)
        y = jax.lax.dynamic_update_slice_in_dim(
            y, plane, 0, axis=a)
        return self._merge(y, axis)


class MatmulFFT2:
    """2-D DFT over the last two axes with permuted spectral order on both."""

    def __init__(self, M: int, P: int, dtype=np.complex64):
        self.fx = FactoredFFT(M, dtype)
        self.fy = FactoredFFT(P, dtype)

    def forward(self, x: Array) -> Array:
        return self.fx.forward(self.fy.forward(x, axis=-1), axis=-2)

    def inverse(self, X: Array) -> Array:
        return self.fx.inverse(self.fy.inverse(X, axis=-1), axis=-2)

    def negate_spectrum(self, X: Array) -> Array:
        return self.fx.negate_spectrum(
            self.fy.negate_spectrum(X, axis=-1), axis=-2)


@functools.lru_cache(maxsize=None)
def _cached_fft2(M: int, P: int) -> MatmulFFT2:
    return MatmulFFT2(M, P)
