#!/usr/bin/env python
"""Split viterbi_forward_planes cost: preprocessing vs pallas grid.

Also tests a python-unrolled chunk loop (static stores) vs fori_loop.
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
from dabjax.fec.viterbi_pallas import _radix4_matrices, _round_up


def timed(fn, *args, iters=10):
    @jax.jit
    def loop(a0, rest):
        def body(_, acc):
            d = fn(a0 + acc * 0.0, *rest)
            return acc + jnp.sum(d.astype(jnp.float32).ravel()[:4]) * 1e-9
        return jax.lax.fori_loop(0, iters, body, jnp.float32(0))
    rest = args[1:]
    float(jax.block_until_ready(loop(args[0], rest)))
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        float(loop(args[0], rest))
        best = min(best, time.perf_counter() - t0)
    return best / iters


def preprocess(soft, nbits, lb=8192, chunk=8, ksplit=True):
    T = nbits + conv.K - 1
    T2 = -(-T // 2)
    B = soft.shape[0]
    LB = min(_round_up(B, 128), lb)
    Bp = _round_up(B, LB)
    C = chunk
    Tp2 = _round_up(T2, C)
    s = soft.reshape(B, T, 4).astype(jnp.float32)
    s = jnp.moveaxis(s, 0, -1)
    s = jnp.pad(s, ((0, 2 * Tp2 - T), (0, 0), (0, Bp - B)))
    s = s.reshape(Tp2, 8, Bp)
    if ksplit:
        hi = jnp.round(s * (1.0 / 256.0)) * 256.0
        s = jnp.concatenate([hi, s - hi], axis=1)
    return s


def make_fwd(T2, C, unroll):
    def kernel(soft_ref, s_ref, dec_ref, pm_ref):
        B = pm_ref.shape[1]

        @pl.when(pl.program_id(1) == 0)
        def _():
            state_ids = jax.lax.broadcasted_iota(jnp.int32, (64, B), 0)
            pm_ref[:] = jnp.where(state_ids == 0, 0.0, -1e9)

        base = pl.program_id(1) * C

        def step(t):
            bm = jax.lax.dot_general(
                s_ref[:], soft_ref[t], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            m = jnp.repeat(pm_ref[:], 4, axis=0) + bm
            m00, m01 = m[0:64, :], m[64:128, :]
            m10, m11 = m[128:192, :], m[192:256, :]
            a = jnp.maximum(m00, m10)
            da = (m10 > m00).astype(jnp.int32)
            b = jnp.maximum(m01, m11)
            db = (m11 > m01).astype(jnp.int32)
            d1 = b > a
            valid = base + t < T2
            pm_ref[:] = jnp.where(d1, b, a)
            d0 = jnp.where(d1, db, da)
            e = (d0 << 1) | d1.astype(jnp.int32)
            dec_ref[t] = jnp.where(valid, e, 0).astype(jnp.int8)

        if unroll:
            for t in range(C):
                step(t)
        else:
            def body(t, _):
                step(t)
                return 0
            jax.lax.fori_loop(0, C, body, 0)

    return kernel


@functools.partial(jax.jit, static_argnames=("T2", "lb", "chunk", "unroll"))
def fwd_pallas(s, T2, lb, chunk, unroll=False):
    Tp2, K16, Bp = s.shape
    LB = min(Bp, lb)
    n_lb = Bp // LB
    C = chunk
    n_chunks = Tp2 // C
    _, S4 = _radix4_matrices()
    S4 = jnp.asarray(np.concatenate([S4, S4], axis=1))
    return pl.pallas_call(
        make_fwd(T2, C, unroll),
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
    )(s, S4)


def main():
    nbits = 24 * 96
    B = 12 * 369
    T = nbits + 6
    T2 = -(-T // 2)
    rng = np.random.default_rng(0)
    soft = rng.integers(-127, 128, size=(B, 4 * T)).astype(np.float32)
    soft = jax.device_put(jnp.asarray(soft))

    for chunk in (8, 16):
        pre = jax.jit(lambda s, c=chunk: preprocess(s, nbits, chunk=c))
        t = timed(pre, soft)
        print(f"preprocess chunk={chunk}: {t*1e3:8.3f} ms", flush=True)
        s_prep = jax.block_until_ready(pre(soft))
        print("  prep shape", s_prep.shape, flush=True)
        for lb in (4480, 2048, 1024):
            if chunk * lb > 32 * 1024 and chunk * lb * 128 * 2 > 12e6:
                pass
            for unroll in (False, True):
                try:
                    fn = lambda s, lb=lb, c=chunk, u=unroll: \
                        fwd_pallas(s, T2, lb, c, unroll=u)
                    t = timed(fn, s_prep)
                    print(f"  pallas lb={lb:5d} C={chunk:3d} "
                          f"unroll={int(unroll)}: {t*1e3:8.3f} ms",
                          flush=True)
                except Exception as ex:
                    print(f"  pallas lb={lb:5d} C={chunk:3d} "
                          f"unroll={int(unroll)}: FAIL {type(ex).__name__}: "
                          f"{str(ex)[:90]}", flush=True)


if __name__ == "__main__":
    main()
