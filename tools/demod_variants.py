#!/usr/bin/env python
"""Compare demod front-end variants on the real TPU (not part of CI).

Hypotheses from the round-4 microbench (unpack 1.4 ms, fine_cfo 0.8,
apply_cfo 0.7, fft 2.2, dqpsk 2.1 of a 9.2 ms stage):
  v1  all-(re,im)-plane math with planar [F, 2, need] rows (no complex64
      anywhere, no strided unpack of the (..., 2) interleaved layout)
  v2  v1 with DEFAULT-precision (single bf16 pass) DFT matmuls
  v3  v2 with the frequency de-interleave as a one-hot bf16 matmul
      instead of a minor-axis gather
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
from dabjax.ofdm import demod, fft, tables


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


def planar_demod(p, precision, deint="gather"):
    """[F, 2, need] f32 planar rows -> soft [F, L-1, 2K] (planes only)."""
    T_s, T_u, T_g, L, K = p.T_s, p.T_u, p.T_g, p.L, p.K
    cb = np.asarray(tables.carrier_bins(p.mode, T_u, K))
    if deint == "onehot":
        H = np.zeros((T_u, K), np.float32)
        H[cb, np.arange(K)] = 1.0
        Hj = jnp.asarray(H)

    def fn(rows):
        re, im = rows[:, 0, :], rows[:, 1, :]
        # fine CFO from guard correlation (planes)
        g_re = jnp.stack([re[:, l * T_s - T_g: l * T_s]
                          for l in range(1, L)], axis=1)
        g_im = jnp.stack([im[:, l * T_s - T_g: l * T_s]
                          for l in range(1, L)], axis=1)
        r_re = jnp.stack([re[:, l * T_s - T_g + T_u: l * T_s + T_u]
                          for l in range(1, L)], axis=1)
        r_im = jnp.stack([im[:, l * T_s - T_g + T_u: l * T_s + T_u]
                          for l in range(1, L)], axis=1)
        c_re = jnp.sum(g_re * r_re + g_im * r_im, axis=(-2, -1))
        c_im = jnp.sum(g_im * r_re - g_re * r_im, axis=(-2, -1))
        # negative angle: matches demod.fine_cfo_estimate's sign so the
        # correctness gate holds on nonzero-CFO inputs (ADVICE r4)
        cfo = -jnp.arctan2(c_im, c_re) / jnp.pi * (p.carrier_diff / 2.0)
        # rotation ramp
        n = jnp.arange(re.shape[-1], dtype=jnp.float32)
        ph = (-2.0 * jnp.pi / 2_048_000.0) * cfo[:, None] * n[None, :]
        cs, sn = jnp.cos(ph), jnp.sin(ph)
        rr = re * cs - im * sn
        ri = re * sn + im * cs
        wr = jnp.stack([rr[:, l * T_s: l * T_s + T_u]
                        for l in range(L)], axis=1)
        wi = jnp.stack([ri[:, l * T_s: l * T_s + T_u]
                        for l in range(L)], axis=1)
        Xr, Xi = fft.mxu_fft_ri(wr, wi) if precision is None else \
            _fft_prec(wr, wi, precision)
        if deint == "onehot":
            sre = jnp.einsum("flt,tk->flk", Xr, Hj)
            sim = jnp.einsum("flt,tk->flk", Xi, Hj)
        else:
            sre = Xr[:, :, cb]
            sim = Xi[:, :, cb]
        r1re = sre[:, 1:] * sre[:, :-1] + sim[:, 1:] * sim[:, :-1]
        r1im = sim[:, 1:] * sre[:, :-1] - sre[:, 1:] * sim[:, :-1]
        inv = jax.lax.rsqrt(r1re * r1re + r1im * r1im + 1e-38)
        soft = jnp.concatenate([-r1re * inv * 127.0,
                                -r1im * inv * 127.0], axis=-1)
        return jnp.round(soft)

    return fn


def _fft_prec(xr, xi, precision):
    """mxu_fft_ri with an explicit matmul precision."""
    import functools
    N = xr.shape[-1]
    N1, N2, W2, Tw, W1 = fft._plan(N)
    (W2r, W2i), (Twr, Twi), (W1r, W1i) = [
        (jnp.asarray(a), jnp.asarray(b)) for a, b in (W2, Tw, W1)]
    lead = xr.shape[:-1]
    xr3 = xr.reshape(lead + (N2, N1))
    xi3 = xi.reshape(lead + (N2, N1))
    dot = functools.partial(jnp.einsum, "...ba,bc->...ac",
                            precision=precision)
    Ar = dot(xr3, W2r) - dot(xi3, W2i)
    Ai = dot(xr3, W2i) + dot(xi3, W2r)
    Br = Ar * Twr - Ai * Twi
    Bi = Ar * Twi + Ai * Twr
    dot2 = functools.partial(jnp.einsum, "...nk,nm->...mk",
                             precision=precision)
    Xr = dot2(Br, W1r) - dot2(Bi, W1i)
    Xi = dot2(Br, W1i) + dot2(Bi, W1r)
    return Xr.reshape(lead + (N,)), Xi.reshape(lead + (N,))


def main():
    p = get_mode(1)
    F = 96
    need = demod.min_frame_samples(p)
    rng = np.random.default_rng(0)
    x = (rng.standard_normal((F, need)) + 1j * rng.standard_normal((F, need))
         ).astype(np.complex64)
    rows = jax.device_put(jnp.asarray(pack_iq(x)))                # [F,n,2]
    planar = np.stack([x.real, x.imag], axis=1).astype(np.float32)
    prows = jax.device_put(jnp.asarray(planar))                   # [F,2,n]

    def v0(r):
        c = unpack_iq(r)
        fine = demod.fine_cfo_estimate(c, p)
        c = demod.apply_cfo(c, fine)
        soft, _ = demod.demodulate_frames(c, p)
        return jnp.sum(soft)

    HI = jax.lax.Precision.HIGHEST
    DEF = jax.lax.Precision.DEFAULT
    variants = [
        ("v0_current_complex", v0, rows),
        ("v1_planes_highest",
         lambda r: jnp.sum(planar_demod(p, HI)(r)), prows),
        ("v2_planes_default",
         lambda r: jnp.sum(planar_demod(p, DEF)(r)), prows),
        ("v3_planes_def_onehot",
         lambda r: jnp.sum(planar_demod(p, DEF, "onehot")(r)), prows),
    ]
    for name, fn, arg in variants:
        t = timed(fn, arg)
        print(f"{name:24s} {t*1e3:8.3f} ms", flush=True)

    # correctness: soft bits of v1 vs v0 (must be exact), v2 vs v0 (stat)
    s0 = np.asarray(jax.jit(lambda r: planar_demod(p, HI)(r))(prows))
    c = unpack_iq(rows)
    fine = demod.fine_cfo_estimate(c, p)
    c = demod.apply_cfo(c, fine)
    ref, _ = jax.jit(lambda cc: demod.demodulate_frames(cc, p))(c)
    ref = np.asarray(ref)
    print("v1 exact vs current:", np.array_equal(s0, ref),
          "| max|d|", float(np.max(np.abs(s0 - ref))))
    s2 = np.asarray(jax.jit(lambda r: planar_demod(p, DEF)(r))(prows))
    d = np.abs(s2 - ref)
    print(f"v2 vs current: frac changed {np.mean(d > 0):.4f}  "
          f"max|d| {np.max(d):.1f}  mean|d| {np.mean(d):.3f}")


if __name__ == "__main__":
    main()
