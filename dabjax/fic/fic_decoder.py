"""FIC channel decoder: OFDM soft bits -> CRC-gated FIB bits.

Device-side, batched equivalent of the reference's FIC thread
(``fic-handler.cpp:143-321``): codeword regrouping, PI_16/PI_15/PI_X
depuncturing, rate-1/4 Viterbi, energy dispersal and the CRC16 gate are all
vectorized over [frames, codewords]; only the FIG *parsing* of CRC-passed
FIBs stays on the host (it is control plane — see dabjax.fic.fib).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from dabjax.constants import DabParams
from dabjax.fec import prbs, puncture, viterbi
from dabjax.fec.crc import check_crc16_bits

__all__ = ["fic_codewords_per_frame", "decode_fic"]


def fic_codewords_per_frame(p: DabParams) -> int:
    # Mode I: 3 symbols * 3072 bits = 4 codewords of 2304; Mode IV: 2;
    # Mode II: 1 (fic-handler.cpp:131-141).
    return {1: 4, 2: 1, 4: 2}[p.mode]


@functools.lru_cache(maxsize=None)
def _fic_mask_indices() -> np.ndarray:
    mask = puncture.puncture_mask([21, 3], [16, 15])
    return mask


def decode_fic(fic_soft: jnp.ndarray, p: DabParams
               ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Decode FIC soft bits for a batch of frames.

    ``fic_soft``: [F, fic_symbols, 2K] float soft bits (symbols 1..3).
    Returns ``(fib_bits, crc_ok)``:
      fib_bits: [F, n_fibs, 256] int32 (post energy-dispersal, incl. CRC16)
      crc_ok:   [F, n_fibs] bool
    where n_fibs = 3 * codewords_per_frame.
    """
    F = fic_soft.shape[0]
    n_cw = fic_codewords_per_frame(p)
    cw = fic_soft.reshape(F, n_cw, 2304)
    full = puncture.depuncture_profile(cw, [21, 3], [16, 15])  # [F,n_cw,3096]
    bits = viterbi.viterbi_decode(full, 768)           # [F, n_cw, 768]
    bits = prbs.disperse(bits)                         # energy dispersal
    fibs = bits.reshape(F, n_cw * 3, 256)
    ok = check_crc16_bits(fibs, inverted=True)
    # int32 rather than bool: device->host bool transfers are unimplemented
    # on some experimental TPU runtimes, and int32 costs nothing here
    return fibs, ok.astype(jnp.int32)
