#!/usr/bin/env python
"""VPU throughput probe: elementwise op cost by dtype on the axon TPU.

Times a chain of dependent elementwise ops on a resident [512, 4480]
tile inside one pallas kernel, by dtype.  Slope between two chain
lengths isolates per-op cost from call overhead.  Not part of CI.
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


def timed(fn, x, iters=20):
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


def make_chain(n_ops, op):
    def kernel(x_ref, o_ref):
        v = x_ref[:]
        for _ in range(n_ops):
            if op == "max":
                v = jnp.maximum(v, v * 1)   # dependent chain
            elif op == "add":
                v = v + v
            elif op == "mix":
                v = jnp.maximum(v + v, v)
        o_ref[:] = v
    return kernel


@functools.partial(jax.jit, static_argnames=("n_ops", "op"))
def chain(x, n_ops, op):
    return pl.pallas_call(
        make_chain(n_ops, op),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
    )(x)


def main():
    rows, cols = 512, 4480
    rng = np.random.default_rng(0)
    base = rng.integers(1, 3, size=(rows, cols))
    for dt in (jnp.float32, jnp.bfloat16, jnp.int32, jnp.int16, jnp.int8):
        try:
            x = jax.device_put(jnp.asarray(base).astype(dt))
            for op in ("add", "max"):
                t1 = timed(lambda v: chain(v, 8, op), x)
                t2 = timed(lambda v: chain(v, 64, op), x)
                per = (t2 - t1) / 56
                eps = rows * cols / per / 1e9
                print(f"{np.dtype(dt).name:9s} {op}: {per*1e6:7.2f} us/op "
                      f"{eps:8.1f} Gelem/s", flush=True)
        except Exception as ex:
            print(f"{np.dtype(dt).name:9s}: FAIL {type(ex).__name__}: "
                  f"{str(ex)[:80]}", flush=True)


if __name__ == "__main__":
    main()
