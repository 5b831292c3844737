"""Batched power-of-two DFT on the MXU (Cooley-Tukey, two matmul stages).

XLA's generic FFT lowering is the hottest op of the demod stage; a DAB
symbol FFT is tiny (T_u <= 2048) but there are ~800 of them per 96 ms
frame batch, which maps much better onto the MXU as two dense matmul
stages (N = N1*N2 with N1, N2 <= 64):

    X[k1*N2 + k2] = sum_{n1} W1[n1, k1] * Tw[n1, k2]
                    * sum_{n2} x[n2*N1 + n1] * W2[n2, k2]

Complex arithmetic is carried as separate (re, im) float32 planes — the
axon TPU runtime cannot transfer complex64 and its complex support is
avoided on hot paths — and the matmuls run at Precision.HIGHEST (3-pass
bf16) for ~f32 accuracy (relative error ~1e-6, far below the DQPSK
decision margin; bit-exactness is asserted after the CRC gates, not on
soft bits — docs/architecture.md).

Replaces the per-symbol FFTW calls of the reference
(``src/various/fft.cpp:31-121``, ``src/ofdm/ofdm-decoder.cpp:88,172``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["mxu_fft", "mxu_fft_ri"]


@functools.lru_cache(maxsize=None)
def _plan(N: int):
    """(N1, N2, W2[N2,N2], Tw[N1,N2], W1[N1,N1]) as separate re/im f32."""
    if N & (N - 1):
        raise ValueError(f"mxu_fft needs a power-of-two size, got {N}")
    # split with both factors <= 64 keeps the matmuls MXU-shaped
    N1 = 1 << (N.bit_length() - 1) // 2
    N2 = N // N1
    while N2 > 64:
        N1 <<= 1
        N2 >>= 1
    n2 = np.arange(N2)
    W2 = np.exp(-2j * np.pi * np.outer(n2, n2) / N2)
    n1 = np.arange(N1)
    Tw = np.exp(-2j * np.pi * np.outer(n1, np.arange(N2)) / N)
    W1 = np.exp(-2j * np.pi * np.outer(n1, n1) / N1)

    def ri(m):
        # cache NUMPY planes: a jnp array built inside a jit trace is a
        # constant tracer and must not outlive the trace via this cache
        return (m.real.astype(np.float32), m.imag.astype(np.float32))

    return N1, N2, ri(W2), ri(Tw), ri(W1)


def _cmatmul(ar, ai, br, bi, spec):
    """Complex einsum via 4 real HIGHEST-precision matmuls."""
    dot = functools.partial(jnp.einsum, spec,
                            precision=jax.lax.Precision.HIGHEST)
    return (dot(ar, br) - dot(ai, bi), dot(ar, bi) + dot(ai, br))


def mxu_fft_ri(xr: jnp.ndarray, xi: jnp.ndarray):
    """DFT of (re, im) float32 planes (..., N) -> (re, im) planes."""
    N = xr.shape[-1]
    N1, N2, W2, Tw, W1 = _plan(N)
    (W2r, W2i), (Twr, Twi), (W1r, W1i) = [
        (jnp.asarray(a), jnp.asarray(b)) for a, b in (W2, Tw, W1)]
    lead = xr.shape[:-1]
    # n = n2*N1 + n1 -> [..., n2, n1]
    xr3 = xr.reshape(lead + (N2, N1))
    xi3 = xi.reshape(lead + (N2, N1))
    # inner DFT over n2: A[..., n1, k2]
    Ar, Ai = _cmatmul(xr3, xi3, W2r, W2i, "...ba,bc->...ac")
    # twiddle
    Br = Ar * Twr - Ai * Twi
    Bi = Ar * Twi + Ai * Twr
    # outer DFT over n1: X[..., k1, k2]
    Xr, Xi = _cmatmul(Br, Bi, W1r, W1i, "...nk,nm->...mk")
    return Xr.reshape(lead + (N,)), Xi.reshape(lead + (N,))


def mxu_fft(x: jnp.ndarray) -> jnp.ndarray:
    """Drop-in for ``jnp.fft.fft`` over the last axis (power-of-two N).

    On CPU (tests, no MXU) the matmul formulation is slower than the
    native FFT, so dispatch on backend.
    """
    if jax.default_backend() == "cpu":
        return jnp.fft.fft(x, axis=-1)
    xr, xi = jnp.real(x).astype(jnp.float32), jnp.imag(x).astype(jnp.float32)
    Xr, Xi = mxu_fft_ri(xr, xi)
    return jax.lax.complex(Xr, Xi)
