#!/usr/bin/env python
"""VPU rate by dtype (non-foldable chains) + MXU dot marginal cost.

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


def make_chain(n_ops):
    def kernel(x_ref, y_ref, o_ref):
        v = x_ref[:]
        w = y_ref[:]
        for i in range(n_ops // 2):
            v = jnp.maximum(v, w)      # dependent, non-foldable
            w = w + v                  # keeps both live
        o_ref[:] = v
    return kernel


@functools.partial(jax.jit, static_argnames=("n_ops",))
def chain(x, y, n_ops):
    return pl.pallas_call(
        make_chain(n_ops),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
    )(x, y)


def vpu_rates():
    rows, cols = 256, 4480
    rng = np.random.default_rng(0)
    for dt in ("float32", "int32", "int16", "bfloat16"):
        try:
            x = jax.device_put(jnp.asarray(
                rng.integers(-3, 3, size=(rows, cols))).astype(dt))
            y = jax.device_put(jnp.asarray(
                rng.integers(-3, 3, size=(rows, cols))).astype(dt))
            t1 = timed(lambda v, y=y: chain(v, y, 16), x)
            t2 = timed(lambda v, y=y: chain(v, y, 96), x)
            per = (t2 - t1) / 80
            print(f"vpu {dt:9s}: {per*1e6:7.3f} us/op "
                  f"{rows*cols/per/1e9:8.1f} Gelem/s", flush=True)
        except Exception as ex:
            print(f"vpu {dt:9s}: FAIL {type(ex).__name__}: {str(ex)[:80]}",
                  flush=True)


def make_dots(n_dots, rows_w, kdim):
    def kernel(x_ref, w_ref, o_ref):
        acc = jnp.zeros((rows_w, x_ref.shape[1]), jnp.float32)
        for i in range(n_dots):
            xi = x_ref[(i % 8) * kdim: (i % 8) * kdim + kdim, :]
            acc = jax.lax.dot_general(
                w_ref[:], xi, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32) + acc * 1e-9
        o_ref[:] = acc
    return kernel


@functools.partial(jax.jit, static_argnames=("n_dots", "rows_w", "kdim"))
def dots(x, w, n_dots, rows_w, kdim):
    return pl.pallas_call(
        make_dots(n_dots, rows_w, kdim),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows_w, x.shape[1]), jnp.float32),
    )(x, w)


def dot_costs():
    B = 4480
    rng = np.random.default_rng(0)
    for rows_w, kdim, tag in ((256, 8, "bm [256,8]"),
                              (128, 32, "blkdiag [128,32]"),
                              (32, 8, "uv [32,8]")):
        x = jax.device_put(jnp.asarray(
            rng.integers(-127, 128, size=(8 * kdim, B)).astype(np.float32)))
        w = jax.device_put(jnp.asarray(
            rng.integers(-1, 2, size=(rows_w, kdim)).astype(np.float32)))
        t1 = timed(lambda v, w=w: dots(v, w, 8, rows_w, kdim), x)
        t2 = timed(lambda v, w=w: dots(v, w, 40, rows_w, kdim), x)
        per = (t2 - t1) / 32
        print(f"dot {tag:17s}: {per*1e6:7.3f} us/dot", flush=True)


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    if which in ("vpu", "both"):
        vpu_rates()
    if which in ("dot", "both"):
        dot_costs()
