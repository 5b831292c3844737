#!/usr/bin/env python
"""Time the fused demod front-end and gate full-pipeline correctness on
golden IQ (TPU).  Not part of CI."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from dabjax.constants import get_mode
from dabjax.iq import pack_iq, unpack_iq
from dabjax.msc.subchannel import SubchGeometry
from dabjax.ofdm import demod
from dabjax.runtime.pipeline import full_ensemble_pipeline
from dabjax.tx.fig import ServiceSpec
from dabjax.tx.modulator import Modulator


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
    services = [
        ServiceSpec(label=f"S{i:02d}", sid=0x8100 + i, subch_id=i,
                    start_addr=i * 72, bitrate=96, protection="EEP-A",
                    prot_level=3, kind="DAB+")
        for i in range(12)
    ]
    geoms = tuple(
        SubchGeometry(s.subch_id, s.start_addr, s.length_cus, s.bitrate,
                      s.protection, s.prot_level) for s in services)
    F = 96
    mod = Modulator(mode=1, services=services)
    iq = mod.iq(F, snr_db=None)
    u0 = p.T_null + p.T_g
    need = demod.min_frame_samples(p)
    rows = np.stack([iq[u0 + f * p.T_F: u0 + f * p.T_F + need]
                     for f in range(F)])
    rows = jax.device_put(jnp.asarray(pack_iq(rows)))

    def s_demod(r):
        c = unpack_iq(r)
        fine = demod.fine_cfo_estimate(c, p)
        soft, _ = demod.demodulate_frames_cfo(c, fine, p)
        return jnp.sum(soft)

    t = timed(s_demod, rows)
    print(f"demod stage: {t*1e3:.3f} ms", flush=True)

    fn = jax.jit(full_ensemble_pipeline(p, geoms))
    ok, bits = jax.block_until_ready(fn(rows))
    n_ok = int(jnp.sum(ok))
    print("FIC CRC:", n_ok, "/", ok.size, flush=True)
    bits_np = np.asarray(bits)
    bad = 0
    for s in (0, 5, 11):
        for t_ in range(15, 20):
            if not np.array_equal(bits_np[s, t_], mod.payload_bits(s, t_)):
                bad += 1
    print("MSC payload mismatches:", bad, flush=True)


if __name__ == "__main__":
    main()
