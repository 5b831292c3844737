#!/usr/bin/env python
"""Standalone Pallas dot-shape probe for the Viterbi branch metric.

All data stays in VMEM (tiny grid); isolates MXU issue cost per loop
iteration for candidate branch-metric formulations.  Not part of CI.
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


def timed(fn, *args, iters=30):
    @jax.jit
    def loop(a0, rest):
        def body(_, acc):
            d = fn(a0 + acc * 0.0, *rest)
            return acc + d * 1e-9
        return jax.lax.fori_loop(0, iters, body, jnp.float32(0))
    rest = args[1:]
    float(jax.block_until_ready(loop(args[0], rest)))
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        float(loop(args[0], rest))
        best = min(best, time.perf_counter() - t0)
    return best / iters


def probe2(name, K, LB, mode="dot", dtype=jnp.float32):
    s1, s2 = (8, 32) if LB > 2048 else (32, 256)
    t1 = probe(name, K, LB, s1, mode, dtype)
    t2 = probe(name, K, LB, s2, mode, dtype)
    per = (t2 - t1) / (s2 - s1)
    fl = 256 * K * LB * 2 / per / 1e12 if mode != "repeat_add" else 0
    print(f"{name:28s} K={K:3d} LB={LB:5d}: {per*1e6:7.3f} us/step "
          f"{fl:6.1f} TF/s  (fixed {1e6*(t1 - per*s1):6.1f} us/call)",
          flush=True)


def probe(name, K, LB, STEPS, mode="dot", dtype=jnp.float32):
    rng = np.random.default_rng(0)
    S = jnp.asarray(rng.standard_normal((256, K)), dtype)
    X = jnp.asarray(rng.standard_normal((STEPS, K, LB)), dtype)

    def kernel(x_ref, s_ref, o_ref, pm_ref):
        def body(t, _):
            if mode == "dot":
                bm = jax.lax.dot_general(
                    s_ref[:], x_ref[t], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                pm_ref[:] = pm_ref[:] + bm[:64]
            elif mode == "repeat_add":
                m = jnp.repeat(pm_ref[:], 4, axis=0) + x_ref[t, :1, :]
                pm_ref[:] = m[:64] + m[64:128]
            elif mode == "dot_acs":
                bm = jax.lax.dot_general(
                    s_ref[:], x_ref[t], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                m = jnp.repeat(pm_ref[:], 4, axis=0) + bm
                m00, m01 = m[0:64, :], m[64:128, :]
                m10, m11 = m[128:192, :], m[192:256, :]
                a = jnp.maximum(m00, m10)
                b = jnp.maximum(m01, m11)
                d1 = b > a
                pm_ref[:] = jnp.where(d1, b, a)
            return 0
        pm_ref[:] = jnp.zeros_like(pm_ref)
        jax.lax.fori_loop(0, STEPS, body, 0)
        o_ref[:] = pm_ref[:1, :128]

    f = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, 128), jnp.float32),
        scratch_shapes=[pltpu.VMEM((64, LB), jnp.float32)],
    )
    t = timed(lambda x, s: f(x, s)[0, 0], X, S)
    return t


def probe_batched(name, K, LB, STEPS, dtype=jnp.float32):
    """One dot over all steps: [256,K] @ [K, STEPS*LB]."""
    rng = np.random.default_rng(0)
    S = jnp.asarray(rng.standard_normal((256, K)), dtype)
    X = jnp.asarray(rng.standard_normal((K, STEPS * LB)), dtype)

    def kernel(x_ref, s_ref, o_ref):
        bm = jax.lax.dot_general(
            s_ref[:], x_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        o_ref[:] = bm[:1, :128]

    f = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, 128), jnp.float32),
    )
    t = timed(lambda x, s: f(x, s)[0, 0], X, S)
    per = t / STEPS
    fl = 256 * K * LB * 2 / per / 1e12
    print(f"{name:28s} K={K:3d} LB={LB:5d}: {per*1e6:7.3f} us/step "
          f"{fl:6.1f} TF/s", flush=True)


def main():
    for LB in (4480, 512):
        probe2("loop dot f32", 16, LB)
        probe2("loop dot f32 K=8", 8, LB)
        probe2("loop dot bf16", 16, LB, dtype=jnp.bfloat16)
        probe2("loop dot f32 K=80", 80, LB)
        probe2("repeat_add only", 16, LB, mode="repeat_add")
        probe2("loop dot+acs f32", 16, LB, mode="dot_acs")
        print(flush=True)


if __name__ == "__main__":
    main()
