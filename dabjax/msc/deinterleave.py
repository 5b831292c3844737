"""MSC time de-interleaver (ETSI EN 300 401 §12).

The reference keeps a 16-deep per-bit delay line updated one CIF at a time
(``dab-concurrent.cpp:41-43,162-175``).  Here the whole de-interleave over a
*block* of consecutive CIFs is one static gather:

    out[t, i] = in[t - DELAYS[i mod 16], i]

which XLA turns into 16 strided slices — no sequential state at all.  The
caller supplies 15 CIFs of history (or accepts the 15-CIF warm-up skip the
reference also has, dab-concurrent.cpp:172-175).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

__all__ = ["DELAYS", "time_deinterleave", "HISTORY"]

#: Receive-side delay per bit index mod 16 (dab-concurrent.cpp:41-43).
DELAYS = np.array([15, 7, 11, 3, 13, 5, 9, 1, 14, 6, 10, 2, 12, 4, 8, 0])
#: CIFs of history needed for a fully-primed de-interleave.
HISTORY = 15


def time_deinterleave(subch_soft: jnp.ndarray) -> jnp.ndarray:
    """De-interleave a block of consecutive CIF slices of one subchannel.

    ``subch_soft``: [..., T, n_bits] soft bits, T consecutive CIFs (T > 15);
    leading batch dims (e.g. subchannels) pass through.
    Returns [..., T - 15, n_bits]: output t corresponds to input CIF t + 15
    (fully primed; logical frame t+15's output mixes inputs t..t+15).
    """
    T, n = subch_soft.shape[-2:]
    delays = DELAYS[np.arange(n) & 15]          # [n]
    # out[t, i] = in[t + 15 - delays[i], i]
    t_idx = (np.arange(T - HISTORY)[:, None] + (HISTORY - delays)[None, :])
    col = np.broadcast_to(np.arange(n)[None, :], t_idx.shape)
    return subch_soft[..., t_idx, col]
