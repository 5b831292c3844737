#!/usr/bin/env python
"""Benchmark: full-ensemble DAB decode throughput on one TPU chip.

Measures the jitted OFDM demod + FIC + all-subchannel MSC Viterbi pipeline
(BASELINE.json config 4: every subchannel of the CIF decoded concurrently)
on synthesized Mode I IQ, and reports the real-time factor per chip.

Baseline = the reference receiver's implicit 1.0x real-time decode of a
single subchannel at 2.048 Msps on a desktop CPU (BASELINE.md), so
vs_baseline == the measured real-time factor.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import sys
import time

import numpy as np


def _timed_run(fn, rows) -> float:
    """Wall time of one dispatch of the in-graph timing loop (the scalar
    fetch forces completion)."""
    import time as _t
    t0 = _t.perf_counter()
    float(fn(rows))
    return _t.perf_counter() - t0


def _stage_breakdown(p, geoms, rows, iters):
    """Per-stage seconds via cumulative-prefix timing (each prefix is its
    own in-graph fori_loop program; stage cost = adjacent difference)."""
    import jax
    import jax.numpy as jnp
    from dabjax.runtime.pipeline import pipeline_stages

    prefix_t = {}
    for name, fn in pipeline_stages(p, geoms).items():
        @jax.jit
        def timed(rows, fn=fn):
            def body(_, acc):
                return acc + fn(rows + acc * 0.0) * 1e-9
            return jax.lax.fori_loop(0, iters, body, jnp.float32(0))
        float(jax.block_until_ready(timed(rows)))      # compile + warm
        prefix_t[name] = min(_timed_run(timed, rows) for _ in range(3)) / iters

    order = ["demod", "fic", "deint_depunct", "viterbi_forward", "full"]
    out, prev = {}, 0.0
    for name in order:
        out[name if name != "full" else "traceback_dispersal"] = \
            round(prefix_t[name] - prev, 6)
        prev = prefix_t[name]
    return out


def _viterbi_roofline(p, geoms, n_frames, stages):
    """Speed-of-light estimate for the radix-4 Pallas Viterbi vs measured.

    Work model per decoded bit per lane (viterbi_pallas.py): MXU 4096 flops
    (one [256,16]@[16,B] branch-metric dot per pair step), HBM 96 bytes
    (64 B soft in + 64 B decision planes out + 64 B read back per pair),
    VPU ~750 ops (repeat/add/max/select forward + one-hot chainback).
    TPU v5e peaks: 197 Tflop/s bf16 MXU, 819 GB/s HBM, ~6 Tops/s VPU
    (8x128 lanes x 4 ALUs at the 1.5 GHz implied by the MXU peak).
    """
    g = geoms[0]
    nbits = 24 * g.bitrate
    # logical frames after warm-up: one per CIF (Mode I carries 4 CIFs per
    # DAB frame), minus the 15-CIF de-interleaver history the pipeline drops
    # (decode_subchannel returns T-15 rows).
    n_lf = n_frames * p.cifs_per_frame - 15
    decoded = len(geoms) * n_lf * nbits
    bounds = {
        "mxu": decoded * 4096 / 197e12,
        "hbm": decoded * 96 / 819e9,
        "vpu": decoded * 750 / 6e12,
    }
    bound = max(bounds, key=bounds.get)
    sol_t = bounds[bound]
    meas_t = stages["viterbi_forward"] + stages["traceback_dispersal"]
    coded = 4 * decoded
    return {
        "bound": bound,
        "sol_seconds_per_batch": round(sol_t, 6),
        "sol_coded_mbit_per_sec": round(coded / sol_t / 1e6, 1),
        "measured_coded_mbit_per_sec": round(coded / meas_t / 1e6, 1),
        "sol_fraction": round(sol_t / meas_t, 3),
    }


def main():
    import jax
    import jax.numpy as jnp

    from dabjax.constants import INPUT_RATE, get_mode
    from dabjax.ofdm import demod
    from dabjax.runtime.pipeline import full_ensemble_pipeline
    from dabjax.msc.subchannel import SubchGeometry
    from dabjax.tx.fig import ServiceSpec
    from dabjax.tx.modulator import Modulator

    p = get_mode(1)
    # 12 x 96 kbps EEP-A P3 services fill the CIF: 12 x 72 = 864 CUs
    services = [
        ServiceSpec(label=f"S{i:02d}", sid=0x8100 + i, subch_id=i,
                    start_addr=i * 72, bitrate=96, protection="EEP-A",
                    prot_level=3, kind="DAB+")
        for i in range(12)
    ]
    geoms = tuple(
        SubchGeometry(s.subch_id, s.start_addr, s.length_cus, s.bitrate,
                      s.protection, s.prot_level) for s in services)

    n_frames = int(sys.argv[1]) if len(sys.argv) > 1 else 96
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 20

    mod = Modulator(mode=1, services=services)
    iq = mod.iq(n_frames, snr_db=None)
    u0 = p.T_null + p.T_g
    need = demod.min_frame_samples(p)
    from dabjax.iq import pack_iq
    rows = np.stack([iq[u0 + f * p.T_F: u0 + f * p.T_F + need]
                     for f in range(n_frames)])
    rows = jax.device_put(jnp.asarray(pack_iq(rows)))

    fn = jax.jit(full_ensemble_pipeline(p, geoms))
    # compile + correctness gate: all FIBs must pass CRC.  (int32 sum, not
    # jnp.all: bool device->host transfer is unimplemented on this runtime)
    ok, bits = jax.block_until_ready(fn(rows))
    assert int(jnp.sum(ok)) == ok.size, "FIC CRC failed on clean golden IQ"
    # decode_subchannel output row t carries transmitted logical frame t
    # (the 15-CIF de-interleaver warm-up is consistent from stream start in
    # the modulator); gate on a post-warm-up span to be safe.
    bits_np = np.asarray(bits)
    for s in (0, 5, 11):
        for t in range(15, 20):
            want = mod.payload_bits(s, t)
            assert np.array_equal(bits_np[s, t], want), \
                f"MSC decode mismatch on golden IQ: subch {s} frame {t}"

    # Time `iters` pipeline executions inside ONE compiled program (a
    # fori_loop with a data dependency between iterations): the axon tunnel
    # adds large, noisy per-dispatch latency that would otherwise dominate;
    # in-graph repetition measures pure device throughput.
    pipe = full_ensemble_pipeline(p, geoms)

    @jax.jit
    def timed(rows):
        def body(_, acc):
            ok_i, bits_i = pipe(rows + acc * 0.0)
            # consume BOTH outputs or XLA dead-code-eliminates the MSC path
            return (acc + jnp.sum(ok_i).astype(jnp.float32)
                    + jnp.sum(bits_i).astype(jnp.float32) * 1e-9)
        return jax.lax.fori_loop(0, iters, body, jnp.float32(0))

    float(jax.block_until_ready(timed(rows)))          # compile + warm
    dt = min(_timed_run(timed, rows) for _ in range(3)) / iters

    stages = _stage_breakdown(p, geoms, rows, max(4, iters // 2))
    roofline = _viterbi_roofline(p, geoms, n_frames, stages)

    samples = n_frames * p.T_F
    sps = samples / dt
    rt = sps / INPUT_RATE
    # coded Viterbi throughput: full CIF (2.304 Mbit per 24 ms) + FIC
    msc_coded_bits = n_frames * 4 * 864 * 64
    fic_coded_bits = n_frames * 4 * 2304
    viterbi_mbps = (msc_coded_bits + fic_coded_bits) / dt / 1e6

    result = {
        "metric": "full_ensemble_realtime_factor_per_chip",
        "value": round(rt, 2),
        "unit": "x realtime (2.048 Msps, all 12 subchannels + FIC)",
        "vs_baseline": round(rt, 2),
        "extra": {
            "samples_per_sec": int(sps),
            "viterbi_coded_mbit_per_sec": round(viterbi_mbps, 1),
            "frames_per_batch": n_frames,
            "seconds_per_batch": round(dt, 4),
            "device": str(jax.devices()[0]),
            "stage_seconds": stages,
            "viterbi_roofline": roofline,
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
