#!/usr/bin/env python
"""Staged-variant breakdown of the NEW packed-word Viterbi forward kernel.

Modes strip successive stages to localize the VPU cost:
  dot_store : per-step dot, accumulate bm into acc (no ACS)
  repadd    : + repeat(pm,4)+add (pm updated from m[:64])
  maxtree   : + the 3-max selection (no decision extraction)
  full      : the production kernel body
Sweeps LB.  Not part of CI.
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

C = vp._PAIRS_PER_WORD


def timed(fn, x, iters=10):
    @jax.jit
    def loop(x):
        def body(_, acc):
            d = fn(x)
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


def make_kernel(T2, mode):
    def kernel(soft_ref, s_ref, dec_ref, pm_ref):
        B = pm_ref.shape[1]

        @pl.when(pl.program_id(1) == 0)
        def _():
            state_ids = jax.lax.broadcasted_iota(jnp.int32, (64, B), 0)
            pm_ref[:] = jnp.where(state_ids == 0, 0.0, -1e9)

        acc = jnp.zeros((64, B), jnp.int32)
        for j in range(C):
            x = soft_ref[8 * j: 8 * j + 8, :].astype(jnp.float32)
            bm = jax.lax.dot_general(
                s_ref[:], x, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            if mode == "dot_store":
                acc = acc | (bm[:64] > 0).astype(jnp.int32) << j
                continue
            m = jnp.repeat(pm_ref[:], 4, axis=0) + bm
            if mode == "repadd":
                pm_ref[:] = m[:64]
                acc = acc | ((m[64:128] > 0).astype(jnp.int32) << j)
                continue
            m00, m01 = m[0:64, :], m[64:128, :]
            m10, m11 = m[128:192, :], m[192:256, :]
            a = jnp.maximum(m00, m10)
            b = jnp.maximum(m01, m11)
            if mode == "maxtree":
                pm_ref[:] = jnp.maximum(a, b)
                acc = acc | ((a > b).astype(jnp.int32) << j)
                continue
            da = (m10 > m00).astype(jnp.int32)
            db = (m11 > m01).astype(jnp.int32)
            d1 = b > a
            pm_ref[:] = jnp.where(d1, b, a)
            d0 = jnp.where(d1, db, da)
            e = (d0 << 1) | d1.astype(jnp.int32)
            acc = acc | (e << (2 * j))
        dec_ref[0] = acc

    return kernel


@functools.partial(jax.jit, static_argnames=("nbits", "lb", "mode"))
def fwd(s, nbits, lb, mode):
    T = nbits + conv.K - 1
    T2 = -(-T // 2)
    K8, Bp = s.shape
    Tp2 = K8 // 8
    W = Tp2 // C
    LB = min(Bp, lb)
    n_lb = Bp // LB
    _, S4 = vp._radix4_matrices()
    S4 = jnp.asarray(S4)
    return pl.pallas_call(
        make_kernel(T2, mode),
        grid=(n_lb, W),
        in_specs=[
            pl.BlockSpec((C * 8, LB), lambda l, i: (i, l),
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
    T2 = -(-T // 2)
    rng = np.random.default_rng(0)
    soft = rng.integers(-127, 128, size=(B, 4 * T)).astype(np.float32)
    soft = jax.device_put(jnp.asarray(soft))
    decoded = B * nbits

    # pre-prep once (reuse production prep)
    Tp2 = vp._round_up(T2, C)
    Bp = vp._round_up(B, min(vp._round_up(B, 128), 8192))
    s = soft.reshape(B, T, 4)
    s = jnp.clip(s, -127, 127).astype(jnp.int8)
    s = jnp.pad(s, ((0, 0), (0, 2 * Tp2 - T), (0, 0)))
    s = jnp.moveaxis(s.reshape(B, Tp2, 8), 0, -1)
    s = jnp.pad(s, ((0, 0), (0, 0), (0, Bp - B)))
    s = jax.block_until_ready(s.reshape(Tp2 * 8, Bp))
    print("prep shape", s.shape, flush=True)

    modes = sys.argv[1].split(",") if len(sys.argv) > 1 else \
        ["dot_store", "repadd", "maxtree", "full"]
    lbs = [int(a) for a in sys.argv[2].split(",")] if len(sys.argv) > 2 \
        else [4480, 2240, 1120]
    for mode in modes:
        for lb in lbs:
            try:
                t = timed(lambda v, lb=lb, m=mode: fwd(v, nbits, lb, m), s)
                print(f"{mode:9s} lb={lb:5d}: {t*1e3:8.3f} ms "
                      f"{4*decoded/t/1e6:8.1f} Mb/s", flush=True)
            except Exception as ex:
                print(f"{mode:9s} lb={lb:5d}: FAIL {type(ex).__name__}: "
                      f"{str(ex)[:90]}", flush=True)


if __name__ == "__main__":
    main()
