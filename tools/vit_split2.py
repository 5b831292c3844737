#!/usr/bin/env python
"""Split the NEW viterbi_forward_words cost: prep vs pallas grid.

Not part of CI.
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dabjax.fec import conv
from dabjax.fec import viterbi_pallas as vp


def timed(fn, x, iters=10):
    @jax.jit
    def loop(x):
        def body(_, acc):
            d = fn(x + acc.astype(x.dtype))
            return acc + (jnp.sum(d.ravel()[:4].astype(jnp.float32))
                          * 1e-9).astype(jnp.float32)
        return jax.lax.fori_loop(0, iters, body, jnp.float32(0))
    float(jax.block_until_ready(loop(x)))
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        float(jax.block_until_ready(loop(x)))
        best = min(best, time.perf_counter() - t0)
    return best / iters


def prep_i8(soft, nbits):
    T = nbits + conv.K - 1
    T2 = -(-T // 2)
    B = soft.shape[0]
    LB, Bp, n_lb, Tp2, W = vp._plan(B, T2, "i8")
    s = soft.reshape(B, T, 4)
    s = jnp.clip(s, -127, 127).astype(jnp.int8)
    s = jnp.pad(s, ((0, 0), (0, 2 * Tp2 - T), (0, 0)))
    s = jnp.moveaxis(s.reshape(B, Tp2, 8), 0, -1)
    s = jnp.pad(s, ((0, 0), (0, 0), (0, Bp - B)))
    return s.reshape(Tp2 * 8, Bp)


@functools.partial(jax.jit, static_argnames=("nbits",))
def pallas_only(s, nbits):
    T = nbits + conv.K - 1
    T2 = -(-T // 2)
    K16, Bp = s.shape
    Tp2 = K16 // 8
    W = Tp2 // vp._PAIRS_PER_WORD
    LB = min(Bp, 8192)
    n_lb = Bp // LB
    _, S4 = vp._radix4_matrices()
    S4 = jnp.asarray(S4)
    return pl.pallas_call(
        vp._forward_kernel(T2, "i8"),
        grid=(n_lb, W),
        in_specs=[
            pl.BlockSpec((vp._PAIRS_PER_WORD * 8, LB), lambda l, i: (i, l),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((256, 8), lambda l, i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 64, LB), lambda l, i: (i, 0, l),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((W, 64, Bp), jnp.int32),
        scratch_shapes=[pltpu.VMEM((64, LB), jnp.float32)],
    )(s, S4)


def main():
    nbits = 24 * 96
    B = 12 * 369
    T = nbits + 6
    rng = np.random.default_rng(0)
    soft = rng.integers(-127, 128, size=(B, 4 * T)).astype(np.float32)
    soft = jax.device_put(jnp.asarray(soft))

    pre = jax.jit(lambda s: prep_i8(s, nbits))
    t = timed(pre, soft)
    print(f"prep i8:     {t*1e3:8.3f} ms", flush=True)
    s_prep = jax.block_until_ready(pre(soft))
    print("prep shape", s_prep.shape, s_prep.dtype, flush=True)

    t = timed(lambda s: pallas_only(s, nbits), s_prep)
    decoded = B * nbits
    print(f"pallas only: {t*1e3:8.3f} ms  {4*decoded/t/1e6:8.1f} Mb/s",
          flush=True)

    t = timed(lambda s: vp.viterbi_forward_words(s, nbits), soft)
    print(f"full fwd:    {t*1e3:8.3f} ms  {4*decoded/t/1e6:8.1f} Mb/s",
          flush=True)


if __name__ == "__main__":
    main()
