#!/usr/bin/env python
"""Microbenchmark of the Pallas Viterbi forward kernel on the real TPU.

Mirrors the bench's config-4 shape: 12 subchannels x 369 logical frames,
nbits = 24*96 = 2304 per codeword.  Not part of CI.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


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


def main():
    from dabjax.fec import viterbi_pallas
    if len(sys.argv) > 1:
        viterbi_pallas.SOFT_FMT = sys.argv[1]

    nbits = 24 * 96
    B = 12 * 369
    T = nbits + 6
    rng = np.random.default_rng(0)
    soft = rng.integers(-127, 128, size=(B, 4 * T)).astype(np.float32)
    soft = jax.device_put(jnp.asarray(soft))
    decoded = B * nbits

    fn = lambda s: viterbi_pallas.viterbi_forward_words(s, nbits)
    t = timed(fn, soft)
    print(f"forward  fmt={viterbi_pallas.SOFT_FMT}: {t*1e3:8.3f} ms  "
          f"{4*decoded/t/1e6:8.1f} coded Mbit/s", flush=True)

    @jax.jit
    def full(s):
        return viterbi_pallas.viterbi_decode_pallas(s, nbits)
    t = timed(lambda s: full(s), soft)
    print(f"full     fmt={viterbi_pallas.SOFT_FMT}: {t*1e3:8.3f} ms  "
          f"{4*decoded/t/1e6:8.1f} coded Mbit/s", flush=True)

    # bit-exact spot check on hardware
    from dabjax.fec.viterbi import viterbi_decode_np
    got = np.asarray(full(soft))
    want = viterbi_decode_np(np.asarray(soft), nbits)
    print("bit-exact on TPU:", bool(np.array_equal(got, want)), flush=True)


if __name__ == "__main__":
    main()
