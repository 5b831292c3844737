#!/usr/bin/env python
"""Microbenchmark of pipeline sub-stages on the real TPU.

Times each candidate sub-graph with the in-graph fori_loop discipline
(CLAUDE.md): N iterations inside one jit with a data dependency, every
output consumed.  Used to localize demod/viterbi time; not part of CI.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from dabjax.constants import get_mode
from dabjax.iq import pack_iq, unpack_iq
from dabjax.ofdm import demod, fft


def timed(fn, x, iters=20):
    @jax.jit
    def loop(x):
        def body(_, acc):
            return acc + fn(x + acc * 0.0) * 1e-9
        return jax.lax.fori_loop(0, iters, body, jnp.float32(0))
    float(jax.block_until_ready(loop(x)))
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        float(loop(x))
        best = min(best, time.perf_counter() - t0)
    return best / iters


def main():
    p = get_mode(1)
    F = 96
    need = demod.min_frame_samples(p)
    rng = np.random.default_rng(0)
    x = (rng.standard_normal((F, need)) + 1j * rng.standard_normal((F, need))
         ).astype(np.complex64)
    rows = jax.device_put(jnp.asarray(pack_iq(x)))

    def s_unpack(r):
        return jnp.sum(jnp.real(unpack_iq(r)))

    def s_fine(r):
        r = unpack_iq(r)
        return jnp.sum(demod.fine_cfo_estimate(r, p))

    def s_cfo(r):
        r = unpack_iq(r)
        fine = demod.fine_cfo_estimate(r, p)
        r = demod.apply_cfo(r, fine)
        return jnp.sum(jnp.real(r))

    def s_wins(r):
        r = unpack_iq(r)
        fine = demod.fine_cfo_estimate(r, p)
        r = demod.apply_cfo(r, fine)
        wins = jnp.stack([r[:, l * p.T_s: l * p.T_s + p.T_u]
                          for l in range(p.L)], axis=1)
        return jnp.sum(jnp.real(wins))

    def s_fft(r):
        r = unpack_iq(r)
        fine = demod.fine_cfo_estimate(r, p)
        r = demod.apply_cfo(r, fine)
        wins = jnp.stack([r[:, l * p.T_s: l * p.T_s + p.T_u]
                          for l in range(p.L)], axis=1)
        spec = fft.mxu_fft(wins)
        return jnp.sum(jnp.real(spec))

    def s_dqpsk(r):
        r = unpack_iq(r)
        fine = demod.fine_cfo_estimate(r, p)
        r = demod.apply_cfo(r, fine)
        wins = jnp.stack([r[:, l * p.T_s: l * p.T_s + p.T_u]
                          for l in range(p.L)], axis=1)
        spec = fft.mxu_fft(wins)
        r1 = spec[:, 1:, :] * jnp.conj(spec[:, :-1, :])
        ab = jnp.abs(r1) + 1e-20
        sr = -jnp.real(r1) / ab * 127.0
        si = -jnp.imag(r1) / ab * 127.0
        return jnp.sum(sr) + jnp.sum(si)

    def s_full(r):
        r = unpack_iq(r)
        fine = demod.fine_cfo_estimate(r, p)
        r = demod.apply_cfo(r, fine)
        soft, _ = demod.demodulate_frames(r, p)
        return jnp.sum(soft)

    stages = [("unpack", s_unpack), ("fine_cfo", s_fine), ("apply_cfo", s_cfo),
              ("wins", s_wins), ("fft", s_fft), ("dqpsk", s_dqpsk),
              ("full_demod", s_full)]
    prev = 0.0
    for name, fn in stages:
        t = timed(fn, rows)
        print(f"{name:14s} cum {t*1e3:8.3f} ms   delta {(t-prev)*1e3:8.3f} ms")
        prev = t


if __name__ == "__main__":
    main()
