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
  and the pair branch metrics are one ``S4[256, 8] @ soft[8, B]`` MXU
  dot.  Soft inputs are **integer-valued** (|soft| <= 127, the
  reference's int8 soft-bit convention, ofdm-decoder.cpp:188-189), so
  the single default-precision bf16 MXU pass is *exact* (integers
  |x| <= 256 are exact in bf16) — no multi-pass or hi/lo split needed,
* **no per-step renormalization**: integer soft bits keep path metrics
  exact integers in float32 as long as they remain below 2^24; the worst
  case 508 * (nbits + 6) is ~4.7M for the largest DAB subchannel
  (384 kbps), well inside the exact range — comparisons are therefore
  bit-identical to integer arithmetic,
* per-pair 2-bit decisions are **packed 16 pair steps per int32 word**
  before leaving the kernel (pair step j of word w sits at bits
  2j..2j+1): a [W, 64, B] int32 plane is 4x less HBM traffic than
  per-step int8 planes and avoids the 32->8-bit vector repack entirely
  (this dropped the forward pass ~3x on the axon runtime),
* the chunk loop is a *python-unrolled* 16-step body (one word) — all
  soft reads and the decision store use static indices,
* a second kernel walks the words backwards with a one-hot state select
  (the chainback_viterbi analog, ``viterbi.cpp:333-357``) and emits the
  chosen branch sequence in the same 16-pairs-per-int32 packing,
* the decoded bits are a shifted copy of the chosen-branch sequence
  (a branch enters the 6-bit shift register at bits 4..5 and is emitted
  three pairs later), recovered with cheap elementwise XLA ops.

Tie-breaking matches the radix-2 reference decoder exactly: the second
step's decision compares the per-first-decision maxima with strict ``>``,
so ties prefer decision 0 at both steps — bit-exact with
:func:`dabjax.fec.viterbi.viterbi_decode_np` on integer-valued inputs.
"""

from __future__ import annotations

import functools

import jax
import numpy as np

from dabjax.fec import conv
from dabjax.fec.viterbi import _tables

__all__ = ["viterbi_decode_pallas", "viterbi_forward_words"]

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


def _forward_kernel_lane(T2, per_step_dot: bool = False):
    """Lane-packed int8 MXU forward pass (SOFT_FMT="i8lane"/"i8lane2").

    The per-step ``soft_ref[8j:8j+8]`` sublane slice of an int8 tile
    (32-sublane tiling) is misaligned and costs a relayout per step —
    measured ~4x the bare dot.  Packing the 16 steps side by side on
    LANES instead ([8, 16*LB] per word) makes every per-step view a lane
    slice at a multiple of LB (aligned).  Two scheduling variants:

    * ``per_step_dot=False`` ("i8lane"): the whole word's branch metrics
      as ONE [256, 8] @ [8, 16*LB] int8 dot.  The [256, 16*LB] int32 bm
      plane caps LB at 512 for VMEM (VERDICT r4 weak #3).
    * ``per_step_dot=True`` ("i8lane2"): one [256, 8] @ [8, LB] dot per
      step on the aligned lane slice — no materialized plane, so LB can
      rise to 4096 lanes, amortizing per-word grid overhead 8x; Mosaic
      overlaps the small dots with the previous step's VPU ACS.
    """
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    C = _PAIRS_PER_WORD

    def kernel(soft_ref, s_ref, dec_ref, pm_ref):
        # soft_ref [1, 1, 8, C*LB] int8; dec_ref [1, 64, LB] int32 out;
        # pm_ref [64, LB] int32 scratch persisted across words.
        B = pm_ref.shape[1]

        @pl.when(pl.program_id(1) == 0)
        def _():
            state_ids = jax.lax.broadcasted_iota(jnp.int32, (64, B), 0)
            pm_ref[:] = jnp.where(state_ids == 0, 0, -(1 << 29))

        if not per_step_dot:
            bm_all = jax.lax.dot_general(
                s_ref[:], soft_ref[0, 0], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)      # [256, C*B]
        acc = jnp.zeros((64, B), jnp.int32)
        for j in range(C):                     # unrolled: aligned slices
            if per_step_dot:
                bm = jax.lax.dot_general(
                    s_ref[:], soft_ref[0, 0, :, j * B: (j + 1) * B],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32)  # [256, B]
            else:
                bm = bm_all[:, j * B: (j + 1) * B]
            m = jnp.repeat(pm_ref[:], 4, axis=0) + bm
            # max-tree on [128]-row tiles: one max + one cmp resolve d0
            # for BOTH d1 halves at once (rows e=0,1 vs e=2,3 differ only
            # in d0), halving the per-step compare/max VPU work
            lo, hi = m[0:128, :], m[128:256, :]
            mx = jnp.maximum(lo, hi)                  # [128, B]
            d0_both = (hi > lo).astype(jnp.int32)     # [128, B]
            a, b = mx[0:64, :], mx[64:128, :]         # d1 = 0 / 1 maxima
            d1 = b > a
            pm_ref[:] = jnp.where(d1, b, a)
            d0 = jnp.where(d1, d0_both[64:128, :], d0_both[0:64, :])
            e = (d0 << 1) | d1.astype(jnp.int32)
            acc = acc | (e << (2 * j))
        dec_ref[0] = acc

    return kernel


def _forward_kernel(T2, soft_fmt):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    C = _PAIRS_PER_WORD

    def kernel(soft_ref, s_ref, dec_ref, pm_ref):
        # grid (lane_blocks, words), words fastest.  soft_ref [C*8, LB]
        # int8 (or [C, 8, LB] f32): the 8 soft values of each of the C
        # pair steps; s_ref [256, 8] f32/int8; dec_ref [1, 64, LB] int32
        # out (16 packed 2-bit branch decisions); pm_ref [64, LB] f32 or
        # int32 scratch (path metrics, exact integers), persisted across
        # the words of one lane block.
        B = pm_ref.shape[1]

        @pl.when(pl.program_id(1) == 0)
        def _():
            state_ids = jax.lax.broadcasted_iota(jnp.int32, (64, B), 0)
            if soft_fmt == "i8mxu":
                pm_ref[:] = jnp.where(state_ids == 0, 0, -(1 << 29))
            else:
                pm_ref[:] = jnp.where(state_ids == 0, 0.0, -1e9)

        acc = jnp.zeros((64, B), jnp.int32)

        for j in range(C):                     # unrolled: static indices
            if soft_fmt == "i8mxu":
                # int8 x int8 -> int32 MXU pass (2x the bf16 rate on
                # v5e); the whole ACS then runs in exact int32.
                x = soft_ref[8 * j: 8 * j + 8, :]
                bm = jax.lax.dot_general(
                    s_ref[:], x, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32)             # [256, B]
            else:
                if soft_fmt == "i8":
                    x = soft_ref[8 * j: 8 * j + 8, :].astype(jnp.float32)
                else:
                    x = soft_ref[j]
                # Integer soft values are exact through the single
                # default-precision bf16 pass.
                bm = jax.lax.dot_general(
                    s_ref[:], x, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)           # [256, B]
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
            pm_ref[:] = jnp.where(d1, b, a)
            d0 = jnp.where(d1, db, da)
            e = (d0 << 1) | d1.astype(jnp.int32)
            # mask word-padding steps to e = 0 (see _forward_kernel_lane)
            valid = (pl.program_id(1) * C + j) < T2
            acc = acc | jnp.where(valid, e << (2 * j), 0)
        dec_ref[0] = acc

    return kernel


def _traceback_kernel():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    C = _PAIRS_PER_WORD

    def kernel(dec_ref, sel_ref, state_ref):
        # grid (lane_blocks, words), words fastest in REVERSE order.
        # dec_ref [1, 64, LB] int32 packed decisions; sel_ref [1, 8, LB]
        # int32 out (chosen branches, pair j of the word in bits 2j..2j+1,
        # replicated over the 8 sublanes — Mosaic requires sublane-dim
        # blocks divisible by 8); state_ref [1, LB] int32 scratch per lane
        # block.
        B = state_ref.shape[1]

        @pl.when(pl.program_id(1) == 0)
        def _():
            state_ref[:] = jnp.zeros((1, B), jnp.int32)

        rows = jax.lax.broadcasted_iota(jnp.int32, (64, B), 0)
        d = dec_ref[0]                                      # [64, B]
        acc = jnp.zeros((1, B), jnp.int32)
        for j in range(C - 1, -1, -1):                      # unrolled
            e_all = (d >> (2 * j)) & 3
            mask = (rows == state_ref[:]).astype(jnp.int32)
            e = jnp.sum(mask * e_all, axis=0, keepdims=True)  # [1, B]
            acc = acc | (e << (2 * j))
            state_ref[:] = (state_ref[:] >> 2) | (e << 4)
        sel_ref[0] = jnp.broadcast_to(acc, (8, B))

    return kernel


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _plan(B: int, T2: int, soft_fmt: str):
    """Grid/tile dimensions shared by the forward and traceback passes.

    Wide batches are tiled on a second (outer) grid axis of lane blocks.
    VMEM per forward grid step, double-buffered in/out plus the pm
    scratch: i8 soft block [128, LB] (128 B/lane) or f32 [16, 8, LB]
    (512 B/lane), dec out [1, 64, LB] int32 (256 B/lane), pm [64, LB]
    f32 (256 B/lane) -> ~1 KB/lane (f32) or ~0.9 KB/lane (i8); the LB
    caps keep that under ~10 MB of the 16 MB scoped VMEM.
    """
    # i8lane: the kernel materializes a [256, C*LB] int32 bm plane, so the
    # lane block is capped at 512 (8 MB + scratch fits scoped VMEM).
    # i8lane2 keeps only one [256, LB] bm tile live -> 4096 lanes.
    cap = {"f32": 5120, "i8lane": 512, "i8lane2": 4096}.get(soft_fmt, 8192)
    LB = min(_round_up(max(B, 1), _LANES), cap)
    Bp = _round_up(max(B, 1), LB)
    n_lb = Bp // LB
    Tp2 = _round_up(T2, _PAIRS_PER_WORD)
    W = Tp2 // _PAIRS_PER_WORD
    return LB, Bp, n_lb, Tp2, W


# soft-input format for the forward kernel: "i8lane" packs the 16 pair
# steps of each word along LANES and computes the word's branch metrics
# as ONE aligned int8 x int8 -> int32 MXU dot (fastest measured: the
# kernel is VPU-issue-bound, so raising lane occupancy doesn't pay);
# "i8lane2" is the same layout with one aligned dot per step (no
# [256, C*LB] plane, LB up to 4096 — measured 1.6x SLOWER on v5e, the
# 16 small dots cost more than the plane); "i8mxu" streams packed int8
# sublane-major with one dot per step; "i8" streams int8 but computes
# in f32/bf16; "f32" streams float planes.  All are exact for
# integer-valued soft bits.
SOFT_FMT = "i8lane"


@functools.partial(jax.jit, static_argnames=("nbits", "interpret"))
def viterbi_forward_words(soft, nbits: int, interpret: bool = False):
    """Forward ACS only: ``soft`` (..., 4*(nbits+6)) -> packed decision
    words [W, 64, Bp] int32 (16 pair steps per word, pair j of word w at
    bits 2j..2j+1, radix-4 branch e per pair step/state/lane).

    ``soft`` must be integer-valued with |soft| <= 127 (the decode
    contract; demod emits rounded soft bits).  The first half of
    :func:`viterbi_decode_pallas`, exposed so the bench can split forward
    vs traceback time."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    T = nbits + conv.K - 1
    T2 = -(-T // 2)                       # pairs (radix-4 steps)
    lead = soft.shape[:-1]
    B = int(np.prod(lead)) if lead else 1
    LB, Bp, n_lb, Tp2, W = _plan(B, T2, SOFT_FMT)

    s = soft.reshape(B, T, 4)
    if SOFT_FMT == "f32":
        s = s.astype(jnp.float32)
    else:
        # clip is the identity for in-contract inputs (demod emits
        # |soft| <= 127); out-of-range values saturate instead of
        # wrapping in the int8 cast
        s = jnp.clip(s, -127, 127).astype(jnp.int8)
    s = jnp.pad(s, ((0, 0), (0, 2 * Tp2 - T), (0, 0)))

    _, S4 = _radix4_matrices()
    S4 = jnp.asarray(S4 if SOFT_FMT == "f32"
                     else S4.astype(np.int8))        # [256, 8]
    C = _PAIRS_PER_WORD

    if SOFT_FMT in ("i8lane", "i8lane2"):
        # [W, n_lb, 8, C*LB]: step j of word w for lane block l sits at
        # lanes j*LB..(j+1)*LB — every kernel view is lane-aligned
        s = jnp.pad(s.reshape(B, Tp2, 8), ((0, Bp - B), (0, 0), (0, 0)))
        s = s.reshape(n_lb, LB, W, C, 8).transpose(2, 0, 4, 3, 1)
        s = s.reshape(W, n_lb, 8, C * LB)
        dec = pl.pallas_call(
            _forward_kernel_lane(T2, per_step_dot=(SOFT_FMT == "i8lane2")),
            grid=(n_lb, W),
            in_specs=[
                pl.BlockSpec((1, 1, 8, C * LB), lambda l, i: (i, l, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((256, 8), lambda l, i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, 64, LB), lambda l, i: (i, 0, l),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((W, 64, Bp), jnp.int32),
            scratch_shapes=[pltpu.VMEM((64, LB), jnp.int32)],
            interpret=interpret,
        )(s, S4)
        # word-padding steps (pair index >= T2) must read as e = 0: their
        # zero soft bits zero the BRANCH metrics but the ACS still
        # compares different predecessors' PATH metrics, so decisions are
        # data-dependent — left unmasked they walk the traceback away
        # from state 0 before it reaches the true last step (breaks
        # bit-exactness vs viterbi_decode_np on noise-like inputs where
        # state 0 does not dominate; found by the r5 random-input
        # hardware spot check).  One cheap XLA mask on the LAST word
        # keeps the per-step kernel loop free of the predicate.
        if Tp2 != T2:
            keep = jnp.int32((1 << (2 * (T2 - (W - 1) * C))) - 1)
            dec = dec.at[W - 1].set(dec[W - 1] & keep)
        return dec

    s = jnp.moveaxis(s.reshape(B, Tp2, 8), 0, -1)  # [Tp2, 8, B]
    s = jnp.pad(s, ((0, 0), (0, 0), (0, Bp - B)))

    if SOFT_FMT == "f32":
        soft_spec = pl.BlockSpec((_PAIRS_PER_WORD, 8, LB),
                                 lambda l, i: (i, 0, l),
                                 memory_space=pltpu.VMEM)
    else:
        s = s.reshape(Tp2 * 8, Bp)
        soft_spec = pl.BlockSpec((_PAIRS_PER_WORD * 8, LB),
                                 lambda l, i: (i, l),
                                 memory_space=pltpu.VMEM)

    pm_dtype = jnp.int32 if SOFT_FMT == "i8mxu" else jnp.float32
    return pl.pallas_call(
        _forward_kernel(T2, SOFT_FMT),
        grid=(n_lb, W),
        in_specs=[
            soft_spec,
            pl.BlockSpec((256, 8), lambda l, i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 64, LB), lambda l, i: (i, 0, l),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((W, 64, Bp), jnp.int32),
        scratch_shapes=[pltpu.VMEM((64, LB), pm_dtype)],
        interpret=interpret,
    )(s, S4)


@functools.partial(jax.jit, static_argnames=("nbits", "interpret"))
def viterbi_decode_pallas(soft, nbits: int, interpret: bool = False):
    """Batched Pallas decode: ``soft`` (..., 4*(nbits+6)) -> (..., nbits).

    Drop-in for :func:`dabjax.fec.viterbi.viterbi_decode_jax` on
    integer-valued soft inputs (|soft| <= 127); ``interpret`` runs the
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
    LB, Bp, n_lb, Tp2, W = _plan(B, T2, SOFT_FMT)

    dec = viterbi_forward_words(soft, nbits, interpret=interpret)

    selw = pl.pallas_call(
        _traceback_kernel(),
        grid=(n_lb, W),
        in_specs=[
            pl.BlockSpec((1, 64, LB),
                         lambda l, i, n=W: (n - 1 - i, 0, l),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 8, LB),
                               lambda l, i, n=W: (n - 1 - i, 0, l),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((W, 8, Bp), jnp.int32),
        scratch_shapes=[pltpu.VMEM((1, LB), jnp.int32)],
        interpret=interpret,
    )(dec)

    # unpack the chosen-branch sequence in batch-major layout: transposing
    # the small packed tensor first (MBs) means the big bit tensor is built
    # directly as [B, nbits] with no large fused transpose (which the axon
    # runtime miscompiles when combined with a broadcast consumer).
    selw_t = jnp.transpose(selw[:, 0, :], (1, 0))       # [Bp, W]
    shifts = 2 * jnp.arange(_PAIRS_PER_WORD, dtype=jnp.int32)
    e_seq = (selw_t[:, :, None] >> shifts[None, None, :]) & 3
    e_seq = e_seq.reshape(Bp, Tp2)
    # a branch enters the register at bits 4..5 and reaches bits 0..1 three
    # pairs later: bits[2*tau] = e[tau+3] >> 1, bits[2*tau+1] = e[tau+3] & 1
    n_pairs = -(-nbits // 2)
    e3 = e_seq[:, 3: 3 + n_pairs]
    bits = jnp.stack([(e3 >> 1) & 1, e3 & 1], axis=-1)  # [Bp, n_pairs, 2]
    bits = bits.reshape(Bp, 2 * n_pairs)[:B, :nbits].astype(jnp.int32)
    return bits.reshape(lead + (nbits,))
