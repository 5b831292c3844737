"""Pallas TPU Viterbi decoder — the SPIRAL-SSE kernel's TPU replacement.

The DAB K=7 rate-1/4 code has 64 states; the add-compare-select step is
re-expressed as dense MXU work instead of SIMD shuffles
(``viterbi.cpp:298-329``, ``spiral-sse.c``):

* path metrics live as a ``[64, B]`` VMEM tile with the *batch* on lanes
  (every FIC codeword / MSC logical frame / subchannel decodes in
  lockstep),
* the butterfly predecessor gather is a constant one-hot ``[128, 64]``
  matrix multiply (a lane-invariant sublane permutation on the MXU),
* branch metrics are ``signs[128, 4] @ soft[4, B]`` — also MXU,
* per-step decisions stream to HBM as int8 planes; a second kernel walks
  them backwards with a one-hot state select (the chainback_viterbi
  analog, ``viterbi.cpp:333-357``).

Bit-exact with :func:`dabjax.fec.viterbi.viterbi_decode_np` (all inputs
are integer-valued soft bits, so fp32 sums are exact).
"""

from __future__ import annotations

import functools

import jax
import numpy as np

from dabjax.fec import conv
from dabjax.fec.viterbi import _tables

__all__ = ["viterbi_decode_pallas"]

_LANES = 128


@functools.lru_cache(maxsize=None)
def _matrices():
    """(P[128, 64] predecessor one-hot, S[128, 4] branch signs)."""
    signs, prev0, prev1 = _tables()
    P = np.zeros((128, 64), np.float32)
    n = np.arange(64)
    P[n, prev0] = 1.0
    P[64 + n, prev1] = 1.0
    return P, signs.astype(np.float32)


def _forward_kernel(T, TC):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    def kernel(soft_ref, p_ref, s_ref, dec_ref, pm_ref):
        # soft_ref [TC, 4, B]; p_ref [128, 64]; s_ref [128, 4]
        # dec_ref  [TC, 64, B] int8 out; pm_ref [64, B] f32 scratch
        B = pm_ref.shape[1]

        @pl.when(pl.program_id(0) == 0)
        def _():
            state_ids = jax.lax.broadcasted_iota(jnp.int32, (64, B), 0)
            pm_ref[:] = jnp.where(state_ids == 0, 0.0, -1e9)

        base = pl.program_id(0) * TC

        def body(t, _):
            m = (jnp.dot(p_ref[:], pm_ref[:],
                         preferred_element_type=jnp.float32)
                 + jnp.dot(s_ref[:], soft_ref[t],
                           preferred_element_type=jnp.float32))
            low, high = m[:64, :], m[64:, :]
            valid = base + t < T
            d = jnp.logical_and(high > low, valid)
            pm = jnp.where(d, high, low)
            pm = pm - jnp.max(pm, axis=0, keepdims=True)  # renormalize
            pm_ref[:] = jnp.where(valid, pm, pm_ref[:])
            dec_ref[t] = d.astype(jnp.int8)
            return 0

        jax.lax.fori_loop(0, TC, body, 0)

    return kernel


def _traceback_kernel(T, TC, n_chunks):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    def kernel(dec_ref, bits_ref, state_ref):
        # dec_ref [TC, 64, B] int8 (reverse chunk order); bits_ref [TC, B]
        # int32; state_ref [1, B] int32 scratch (shift register of bits)
        B = state_ref.shape[1]

        @pl.when(pl.program_id(0) == 0)
        def _():
            state_ref[:] = jnp.zeros((1, B), jnp.int32)

        rows = jax.lax.broadcasted_iota(jnp.int32, (64, B), 0)
        trows = jax.lax.broadcasted_iota(jnp.int32, (TC, B), 0)

        def body(i, _):
            t = TC - 1 - i
            d = dec_ref[t].astype(jnp.int32)          # [64, B]
            mask = (rows == state_ref[:]).astype(jnp.int32)
            sel = jnp.sum(mask * d, axis=0, keepdims=True)   # [1, B]
            # Mosaic cannot prove an int8/int32 vector store at a dynamic
            # sublane index is tile-aligned, so write row t as a masked
            # full-tile update instead of bits_ref[t] = ...
            bits_ref[:] = jnp.where(trows == t, state_ref[:] & 1,
                                    bits_ref[:])
            state_ref[:] = (state_ref[:] >> 1) | (sel << 5)
            return 0

        jax.lax.fori_loop(0, TC, body, 0)

    return kernel


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


@functools.partial(jax.jit, static_argnames=("nbits", "chunk", "interpret"))
def viterbi_decode_pallas(soft, nbits: int, chunk: int = 128,
                          interpret: bool = False):
    """Batched Pallas decode: ``soft`` (..., 4*(nbits+6)) -> (..., nbits).

    Drop-in for :func:`dabjax.fec.viterbi.viterbi_decode_jax`; ``interpret``
    runs the kernels in the Pallas interpreter (CPU test path).
    """
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    T = nbits + conv.K - 1
    lead = soft.shape[:-1]
    B = int(np.prod(lead)) if lead else 1
    Bp = _round_up(max(B, 1), _LANES)
    # Shrink the time chunk for wide batches: VMEM per grid step is
    # ~(soft f32 + dec int8) * chunk * Bp double-buffered; keep
    # chunk*Bp <= 64Ki lanes*steps (~8.5 MB) under the 16 MB scoped limit.
    while chunk > 8 and chunk * Bp > 64 * 1024:
        chunk //= 2
    Tp = _round_up(T, chunk)
    n_chunks = Tp // chunk

    s = soft.reshape(B, T, 4).astype(jnp.float32)
    # [T, 4, B] with batch on lanes, zero-padded
    s = jnp.moveaxis(s, 0, -1)
    s = jnp.pad(s, ((0, Tp - T), (0, 0), (0, Bp - B)))

    P, S = _matrices()
    P = jnp.asarray(P)
    S = jnp.asarray(S)

    dec = pl.pallas_call(
        _forward_kernel(T, chunk),
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((chunk, 4, Bp), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((128, 64), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((128, 4), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((chunk, 64, Bp), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Tp, 64, Bp), jnp.int8),
        scratch_shapes=[pltpu.VMEM((64, Bp), jnp.float32)],
        interpret=interpret,
    )(s, P, S)

    bits = pl.pallas_call(
        _traceback_kernel(T, chunk, n_chunks),
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((chunk, 64, Bp),
                         lambda i, n=n_chunks: (n - 1 - i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((chunk, Bp),
                               lambda i, n=n_chunks: (n - 1 - i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Tp, Bp), jnp.int32),
        scratch_shapes=[pltpu.VMEM((1, Bp), jnp.int32)],
        interpret=interpret,
    )(dec)

    out = bits[:nbits, :B].astype(jnp.int32)     # [nbits, B]
    return jnp.moveaxis(out, 0, -1).reshape(lead + (nbits,))
