#!/usr/bin/env python
"""Throwaway experiment harness for the Pallas Viterbi forward kernel.

Variants of the forward kernel with direct (LB, C) control and stripped
stages, to localize where the 8.9 ms goes.  Not part of CI.
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from dabjax.fec import conv
from dabjax.fec.viterbi_pallas import _radix4_matrices, _round_up


def timed(fn, x, iters=10):
    @jax.jit
    def loop(x):
        def body(_, acc):
            d = fn(x + acc * 0.0)
            return acc + jnp.sum(d[0, 0].astype(jnp.float32)) * 1e-9
        return jax.lax.fori_loop(0, iters, body, jnp.float32(0))
    float(jax.block_until_ready(loop(x)))
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        float(loop(x))
        best = min(best, time.perf_counter() - t0)
    return best / iters


def make_kernel(T2, C, mode):
    from jax.experimental import pallas as pl

    def kernel(soft_ref, s_ref, dec_ref, pm_ref):
        B = pm_ref.shape[1]

        @pl.when(pl.program_id(1) == 0)
        def _():
            state_ids = jax.lax.broadcasted_iota(jnp.int32, (64, B), 0)
            pm_ref[:] = jnp.where(state_ids == 0, 0.0, -1e9)

        base = pl.program_id(1) * C

        def body(t, _):
            bm = jax.lax.dot_general(
                s_ref[:], soft_ref[t], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            if mode == "dot_only":
                dec_ref[t] = (bm[:64] > 0).astype(jnp.int8)
                return 0
            m = jnp.repeat(pm_ref[:], 4, axis=0) + bm
            if mode == "no_acs":
                pm_ref[:] = m[0:64]
                dec_ref[t] = m[64:128].astype(jnp.int8)
                return 0
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
            return 0

        jax.lax.fori_loop(0, C, body, 0)

    return kernel


@functools.partial(jax.jit, static_argnames=("nbits", "lb", "chunk", "mode",
                                             "ksplit"))
def fwd(soft, nbits, lb, chunk, mode="full", ksplit=True):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    T = nbits + conv.K - 1
    T2 = -(-T // 2)
    lead = soft.shape[:-1]
    B = int(np.prod(lead)) if lead else 1
    LB = min(_round_up(max(B, 1), 128), lb)
    Bp = _round_up(max(B, 1), LB)
    n_lb = Bp // LB
    C = chunk
    Tp2 = _round_up(T2, C)
    n_chunks = Tp2 // C

    s = soft.reshape(B, T, 4).astype(jnp.float32)
    s = jnp.moveaxis(s, 0, -1)
    s = jnp.pad(s, ((0, 2 * Tp2 - T), (0, 0), (0, Bp - B)))
    s = s.reshape(Tp2, 8, Bp)
    K = 8
    if ksplit:
        hi = jnp.round(s * (1.0 / 256.0)) * 256.0
        s = jnp.concatenate([hi, s - hi], axis=1)
        K = 16

    _, S4 = _radix4_matrices()
    if ksplit:
        S4 = np.concatenate([S4, S4], axis=1)
    S4 = jnp.asarray(S4)

    return pl.pallas_call(
        make_kernel(T2, C, mode),
        grid=(n_lb, n_chunks),
        in_specs=[
            pl.BlockSpec((C, K, LB), lambda l, i: (i, 0, l),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((256, K), lambda l, i: (0, 0),
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
    rng = np.random.default_rng(0)
    soft = rng.integers(-127, 128, size=(B, 4 * T)).astype(np.float32)
    soft = jax.device_put(jnp.asarray(soft))
    decoded = B * nbits

    cases = []
    for lb in (512, 1024, 2048, 4480):
        for chunk in (8, 16, 32, 64, 128):
            if chunk * lb * (16 * 4 + 64) * 2 > 14 * 1024 * 1024:
                continue
            cases.append((lb, chunk))

    for mode in ("full", "dot_only", "no_acs"):
        for (lb, chunk) in cases:
            try:
                fn = lambda s: fwd(s, nbits, lb, chunk, mode=mode)
                t = timed(fn, soft)
                print(f"{mode:9s} lb={lb:5d} C={chunk:4d}: {t*1e3:8.3f} ms "
                      f"{4*decoded/t/1e6:8.1f} Mb/s", flush=True)
            except Exception as ex:
                print(f"{mode:9s} lb={lb:5d} C={chunk:4d}: FAIL "
                      f"{type(ex).__name__}: {str(ex)[:100]}", flush=True)
        print(flush=True)


if __name__ == "__main__":
    main()
