"""Energy-dispersal PRBS, x^9 + x^5 + 1 (ETSI EN 300 401 §10).

The reference computes this with a 9-cell shift register seeded with all
ones (``fic-handler.cpp:100-108``, ``dab-concurrent.cpp:183-190``).  Here the
sequence is precomputed once per length and applied as a vectorized XOR —
on-device this fuses into the surrounding elementwise ops.
"""

from __future__ import annotations

import functools

import numpy as np

__all__ = ["prbs", "disperse"]


@functools.lru_cache(maxsize=None)
def prbs(n: int) -> np.ndarray:
    """First ``n`` bits of the DAB energy-dispersal PRBS (uint8 0/1)."""
    reg = np.ones(9, dtype=np.uint8)
    out = np.empty(n, dtype=np.uint8)
    for i in range(n):
        b = reg[8] ^ reg[4]
        out[i] = b
        reg[1:] = reg[:-1]
        reg[0] = b
    return out


def disperse(bits, n: int | None = None):
    """XOR ``bits`` (0/1, shape (..., n)) with the PRBS. Self-inverse."""
    if n is None:
        n = bits.shape[-1]
    seq = prbs(n)
    if isinstance(bits, np.ndarray):
        return bits ^ seq
    import jax.numpy as jnp
    return jnp.bitwise_xor(bits, jnp.asarray(seq, dtype=bits.dtype))
