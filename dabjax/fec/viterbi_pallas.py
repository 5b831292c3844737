"""Pallas TPU Viterbi decoder — the SPIRAL-SSE kernel's TPU replacement.

The DAB K=7 rate-1/4 code has 64 states; the add-compare-select step is
re-expressed as dense MXU work instead of SIMD shuffles
(``viterbi.cpp:298-329``, ``spiral-sse.c``):

* path metrics live as a ``[64, B]`` VMEM tile with the *batch* on lanes
  (every FIC codeword / MSC logical frame / subchannel decodes in
  lockstep),
* **radix-4 ACS**: two trellis steps fuse into one 64->64 transition with
  4 branches, halving the sequential chain; the predecessor "gather" is
  an exact sublane repeat (the row identity ``4p + (n&3) == 64e + n``)
  and the pair branch metrics are one ``S4[256, 16] @ soft2[16, B]`` MXU
  dot over a bf16-exact hi/lo split of the soft values (a plain f32 dot
  rounds through one bf16 pass and flips near-tie decisions on noisy
  inputs; Precision.HIGHEST lowers 3x slower),
* **no per-step renormalization**: all inputs are integer-valued soft bits
  (|soft| <= 127), so path metrics stay exact integers in float32 as long
  as they remain below 2^24; the worst case 508 * (nbits + 6) is ~4.7M for
  the largest DAB subchannel (384 kbps), well inside the exact range —
  comparisons are therefore bit-identical to integer arithmetic,
* per-pair 2-bit decisions stream to HBM as int8 ``[T2, 64, B]`` planes;
  a second kernel walks them backwards with a one-hot state select (the
  chainback_viterbi analog, ``viterbi.cpp:333-357``) and emits the chosen
  branch sequence packed 16 pairs per int32 word (Mosaic cannot prove a
  row store at a dynamic sublane index is tile-aligned, and bit-packing
  is cheaper than masked full-tile writes),
* the decoded bits are a shifted copy of the chosen-branch sequence
  (a branch enters the 6-bit shift register at bits 4..5 and is emitted
  three pairs later), recovered with cheap elementwise XLA ops.

Tie-breaking matches the radix-2 reference decoder exactly: the second
step's decision compares the per-first-decision maxima with strict ``>``,
so ties prefer decision 0 at both steps — bit-exact with
:func:`dabjax.fec.viterbi.viterbi_decode_np`.
"""

from __future__ import annotations

import functools

import jax
import numpy as np

from dabjax.fec import conv
from dabjax.fec.viterbi import _tables

__all__ = ["viterbi_decode_pallas", "viterbi_forward_planes"]

_LANES = 128
_PAIRS_PER_WORD = 16


@functools.lru_cache(maxsize=None)
def _radix4_matrices():
    """(P4[256, 64] predecessor one-hot, S4[256, 8] pair branch signs).

    Row layout e * 64 + n for new state ``n`` after the pair and branch
    ``e = (d0 << 1) | d1`` (d0 = first step's decision, d1 = second's):
    predecessor ``p = (n >> 2) | (e << 4)``, intermediate
    ``q = ((p << 1) | ((n >> 1) & 1)) & 63``, register values
    ``r_t = q | ((p >> 5) << 6)`` and ``r_{t+1} = n | ((q >> 5) << 6)``.
    """
    signs, _, _ = _tables()                     # signs[r, k] over 128 regs
    P4 = np.zeros((256, 64), np.float32)
    S4 = np.zeros((256, 8), np.float32)
    n = np.arange(64)
    for e in range(4):
        p = (n >> 2) | (e << 4)
        q = ((p << 1) | ((n >> 1) & 1)) & 63
        r_t = q | ((p >> 5) << 6)
        r_t1 = n | ((q >> 5) << 6)
        rows = e * 64 + n
        P4[rows, p] = 1.0
        S4[rows, 0:4] = signs[r_t]
        S4[rows, 4:8] = signs[r_t1]
    return P4, S4


def _forward_kernel(T2, C):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    def kernel(soft_ref, s_ref, dec_ref, pm_ref):
        # grid (lane_blocks, time_chunks), time fastest.  soft_ref
        # [C, 16, LB] (hi/lo split soft bits of pair steps); s_ref [256, 16];
        # dec_ref [C, 64, LB] int8 out (2-bit branch e); pm_ref [64, LB] f32
        # scratch (path metrics, exact integers), persisted across the time
        # chunks of one lane block.
        B = pm_ref.shape[1]

        @pl.when(pl.program_id(1) == 0)
        def _():
            state_ids = jax.lax.broadcasted_iota(jnp.int32, (64, B), 0)
            pm_ref[:] = jnp.where(state_ids == 0, 0.0, -1e9)

        base = pl.program_id(1) * C

        def body(t, _):
            # Branch metrics on the MXU.  A default f32 dot rounds through
            # one bf16 pass (8 mantissa bits) and flips near-tie decisions
            # on noisy inputs; Precision.HIGHEST lowers poorly here (3x
            # cost).  The caller pre-splits the soft values into two
            # bf16-exact parts (hi = 256k with |k|<=128, lo in [-128,128])
            # stacked on the K axis, so ONE cheap default-precision K=16
            # dot is exact for the integer-valued soft bits (|soft| <
            # 2^15) the decode contract requires.
            bm = jax.lax.dot_general(
                s_ref[:], soft_ref[t], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)               # [256, B]
            # predecessor row identity: with rows ordered e*64+n, the
            # predecessor p = (n>>2)|(e<<4) satisfies 4p + (n&3) == 64e+n,
            # so the whole [256, B] predecessor tile is pm element-repeated
            # 4x on sublanes — exact data movement, no matmul.
            m = jnp.repeat(pm_ref[:], 4, axis=0) + bm
            # radix-2-equivalent selection: inner max over d0 per d1,
            # then d1 over the maxima; all strict > so ties pick 0.
            m00, m01 = m[0:64, :], m[64:128, :]       # e=0 (d0=0,d1=0), e=1
            m10, m11 = m[128:192, :], m[192:256, :]   # e=2 (d0=1,d1=0), e=3
            a = jnp.maximum(m00, m10)                 # best with d1=0
            da = (m10 > m00).astype(jnp.int32)        # int32: Mosaic cannot
            b = jnp.maximum(m01, m11)                 # select between i1s
            db = (m11 > m01).astype(jnp.int32)
            d1 = b > a
            # dec is masked below, so pads only ever see e=0; pm may evolve
            # freely past T2 — padded chunks are last, never re-read
            valid = base + t < T2
            pm_ref[:] = jnp.where(d1, b, a)
            d0 = jnp.where(d1, db, da)
            e = (d0 << 1) | d1.astype(jnp.int32)
            dec_ref[t] = jnp.where(valid, e, 0).astype(jnp.int8)
            return 0

        jax.lax.fori_loop(0, C, body, 0)

    return kernel


def _traceback_kernel(C, words):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    def kernel(dec_ref, sel_ref, state_ref):
        # grid (lane_blocks, time_chunks), time fastest in REVERSE chunk
        # order.  dec_ref [C, 64, LB] int8; sel_ref [1, words, LB] int32 out
        # (chosen branches, 2 bits per pair, pair i of the word in bits
        # 2i..2i+1); state_ref [1, LB] int32 scratch per lane block.
        B = state_ref.shape[1]

        @pl.when(pl.program_id(1) == 0)
        def _():
            state_ref[:] = jnp.zeros((1, B), jnp.int32)

        rows = jax.lax.broadcasted_iota(jnp.int32, (64, B), 0)

        # walk pairs within the chunk in reverse, accumulating each word's
        # 16 branch values; word boundaries are static so stores align.
        for w in range(words - 1, -1, -1):
            lo = w * _PAIRS_PER_WORD
            hi = min(C, lo + _PAIRS_PER_WORD)

            def body(i, acc, lo=lo, hi=hi):
                t = hi - 1 - i
                d = dec_ref[t].astype(jnp.int32)            # [64, B]
                mask = (rows == state_ref[:]).astype(jnp.int32)
                e = jnp.sum(mask * d, axis=0, keepdims=True)  # [1, B]
                acc = acc | (e << (2 * (t - lo)))
                state_ref[:] = (state_ref[:] >> 2) | (e << 4)
                return acc

            acc = jax.lax.fori_loop(0, hi - lo, body,
                                    jnp.zeros((1, B), jnp.int32))
            sel_ref[0, w] = acc[0]

    return kernel


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _plan(B: int, T2: int, chunk: int):
    """Grid/tile dimensions shared by the forward and traceback passes.

    Wide batches are tiled on a second (outer) grid axis of lane blocks,
    so the time chunk stays large: VMEM per grid step ~ (soft f32
    [C,8,LB] + dec int8 [C,64,LB]) double buffered; C*LB = 64Ki is ~12 MB.
    """
    LB = min(_round_up(max(B, 1), _LANES), 8 * 1024)
    Bp = _round_up(max(B, 1), LB)
    n_lb = Bp // LB
    C = chunk
    while C > 8 and C * LB > 32 * 1024:
        C //= 2
    Tp2 = _round_up(T2, C)
    n_chunks = Tp2 // C
    return LB, Bp, n_lb, C, Tp2, n_chunks


@functools.partial(jax.jit, static_argnames=("nbits", "chunk", "interpret"))
def viterbi_forward_planes(soft, nbits: int, chunk: int = 64,
                           interpret: bool = False):
    """Forward ACS only: ``soft`` (..., 4*(nbits+6)) -> decision planes
    [Tp2, 64, Bp] int8 (2-bit radix-4 branch per pair step/state/lane).

    The first half of :func:`viterbi_decode_pallas`, exposed so the bench
    can split forward vs traceback time."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    T = nbits + conv.K - 1
    T2 = -(-T // 2)                       # pairs (radix-4 steps)
    lead = soft.shape[:-1]
    B = int(np.prod(lead)) if lead else 1
    LB, Bp, n_lb, C, Tp2, n_chunks = _plan(B, T2, chunk)

    s = soft.reshape(B, T, 4).astype(jnp.float32)
    s = jnp.moveaxis(s, 0, -1)                     # [T, 4, B]
    s = jnp.pad(s, ((0, 2 * Tp2 - T), (0, 0), (0, Bp - B)))
    s = s.reshape(Tp2, 8, Bp)                      # pair steps
    hi = jnp.round(s * (1.0 / 256.0)) * 256.0      # bf16-exact hi/lo split
    s = jnp.concatenate([hi, s - hi], axis=1)      # [Tp2, 16, Bp]

    _, S4 = _radix4_matrices()
    S4 = jnp.asarray(np.concatenate([S4, S4], axis=1))   # [256, 16]

    return pl.pallas_call(
        _forward_kernel(T2, C),
        grid=(n_lb, n_chunks),
        in_specs=[
            pl.BlockSpec((C, 16, LB), lambda l, i: (i, 0, l),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((256, 16), lambda l, i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((C, 64, LB), lambda l, i: (i, 0, l),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Tp2, 64, Bp), jnp.int8),
        scratch_shapes=[pltpu.VMEM((64, LB), jnp.float32)],
        interpret=interpret,
    )(s, S4)


@functools.partial(jax.jit, static_argnames=("nbits", "chunk", "interpret"))
def viterbi_decode_pallas(soft, nbits: int, chunk: int = 64,
                          interpret: bool = False):
    """Batched Pallas decode: ``soft`` (..., 4*(nbits+6)) -> (..., nbits).

    Drop-in for :func:`dabjax.fec.viterbi.viterbi_decode_jax`; ``chunk`` is
    the number of radix-4 pair steps per grid step; ``interpret`` runs the
    kernels in the Pallas interpreter (CPU test path).
    """
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    T = nbits + conv.K - 1
    T2 = -(-T // 2)                       # pairs (radix-4 steps)
    lead = soft.shape[:-1]
    B = int(np.prod(lead)) if lead else 1
    LB, Bp, n_lb, C, Tp2, n_chunks = _plan(B, T2, chunk)
    words = -(-C // _PAIRS_PER_WORD)

    dec = viterbi_forward_planes(soft, nbits, chunk=chunk,
                                 interpret=interpret)

    selw = pl.pallas_call(
        _traceback_kernel(C, words),
        grid=(n_lb, n_chunks),
        in_specs=[
            pl.BlockSpec((C, 64, LB),
                         lambda l, i, n=n_chunks: (n - 1 - i, 0, l),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, words, LB),
                               lambda l, i, n=n_chunks: (n - 1 - i, 0, l),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_chunks, words, Bp), jnp.int32),
        scratch_shapes=[pltpu.VMEM((1, LB), jnp.int32)],
        interpret=interpret,
    )(dec)

    # unpack the chosen-branch sequence in batch-major layout: transposing
    # the small packed tensor first (KBs) means the big bit tensor is built
    # directly as [B, nbits] with no large fused transpose (which the axon
    # runtime miscompiles when combined with a broadcast consumer).
    selw_t = jnp.transpose(selw, (2, 0, 1))             # [Bp, n_chunks, words]
    shifts = 2 * jnp.arange(_PAIRS_PER_WORD, dtype=jnp.int32)
    e_seq = (selw_t[:, :, :, None] >> shifts[None, None, None, :]) & 3
    e_seq = e_seq.reshape(Bp, n_chunks, words * _PAIRS_PER_WORD)
    e_seq = e_seq[:, :, :C].reshape(Bp, Tp2)
    # a branch enters the register at bits 4..5 and reaches bits 0..1 three
    # pairs later: bits[2*tau] = e[tau+3] >> 1, bits[2*tau+1] = e[tau+3] & 1
    n_pairs = -(-nbits // 2)
    e3 = e_seq[:, 3: 3 + n_pairs]
    bits = jnp.stack([(e3 >> 1) & 1, e3 & 1], axis=-1)  # [Bp, n_pairs, 2]
    bits = bits.reshape(Bp, 2 * n_pairs)[:B, :nbits].astype(jnp.int32)
    return bits.reshape(lead + (nbits,))
