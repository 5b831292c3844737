"""On-hardware exactness spot checks (run on the real TPU; CI runs CPU).

These verify the DEFAULT-precision / bf16-MXU exactness contracts that
CPU tests cannot exercise (CPU computes f32 dots at full precision):

  depuncture   depuncture_profile's one-hot dot is bit-identical to the
               scatter form for integer soft bits |x| <= 127
  viterbi      the Pallas kernel is bit-exact vs viterbi_decode_np
               (ties included) on random integer soft input
  demod        the fused DFT+de-interleave matmul demod produces the
               same CRC-gated FIC result as the CPU fft path

Usage: python tools/tpu_spot_checks.py [depuncture|viterbi|demod|all]
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def check_depuncture() -> None:
    import jax
    import jax.numpy as jnp
    from dabjax.fec.puncture import (depuncture, depuncture_profile,
                                     eep_profile, punctured_length,
                                     puncture_mask, uep_profile)
    rng = np.random.default_rng(0)
    for name, (lengths, pis) in (
            ("EEP-A3/96", eep_profile(96, 3, "A")),
            ("EEP-B4/64", eep_profile(64, 4, "B")),
            ("UEP 128/2", uep_profile(128, 2)),
            ("UEP 56/3", uep_profile(56, 3))):
        n_tx = punctured_length(lengths, pis)
        soft = rng.integers(-127, 128, (3, n_tx)).astype(np.float32)
        fast = np.asarray(jax.jit(
            lambda s: depuncture_profile(s, lengths, pis))(jnp.asarray(soft)))
        mask = puncture_mask(lengths, pis)
        ref = depuncture(soft, mask)
        assert np.array_equal(fast, ref), f"depuncture mismatch {name}"
        print(f"depuncture {name}: bit-identical ({n_tx} soft bits)")


def check_viterbi() -> None:
    from dabjax.fec.viterbi import viterbi_decode, viterbi_decode_np
    rng = np.random.default_rng(1)
    for nbits in (768, 2304):
        soft = rng.integers(-127, 128, (4, 4 * (nbits + 6))).astype(
            np.float32)
        got = np.asarray(viterbi_decode(soft, nbits))
        want = viterbi_decode_np(soft, nbits)
        assert np.array_equal(got, want), f"viterbi mismatch n={nbits}"
        print(f"viterbi n={nbits}: bit-exact (4 random codewords)")


def check_demod() -> None:
    import jax.numpy as jnp
    from dabjax.constants import get_mode
    from dabjax.fic.fic_decoder import decode_fic
    from dabjax.iq import pack_iq, unpack_iq
    from dabjax.ofdm import demod
    from dabjax.tx.modulator import Modulator
    from dabjax.tx.fig import ServiceSpec
    p = get_mode(1)
    svc = [ServiceSpec(label="SPOT", sid=0x9001, subch_id=1, start_addr=0,
                       bitrate=96, protection="EEP-A", prot_level=3,
                       kind="DAB+")]
    iq = Modulator(mode=1, services=svc).iq(4, snr_db=None)
    u0 = p.T_null + p.T_g
    need = demod.min_frame_samples(p)
    rows = np.stack([iq[u0 + f * p.T_F: u0 + f * p.T_F + need]
                     for f in range(4)])
    x = unpack_iq(jnp.asarray(pack_iq(rows)))
    soft, _ = demod.demodulate_frames_cfo(x, jnp.zeros(4), p)
    _, ok = decode_fic(soft[:, : p.fic_symbols, :], p)
    n_ok, n = int(jnp.sum(ok)), int(np.prod(ok.shape))
    assert n_ok == n, f"FIC CRC {n_ok}/{n} on clean golden IQ"
    print(f"demod: {n_ok}/{n} FIC CRCs pass via the MXU matmul path")


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("depuncture", "all"):
        check_depuncture()
    if which in ("viterbi", "all"):
        check_viterbi()
    if which in ("demod", "all"):
        check_demod()
    print("spot checks OK")
