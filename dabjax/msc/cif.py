"""CIF assembly: demodulated soft bits -> Common Interleaved Frames.

Batched equivalent of the reference's per-symbol accumulation
(``msc-handler.cpp:125-192``): for a batch of frames the MSC symbols are a
single reshape — symbols 4..L of each frame concatenate into
``cifs_per_frame`` CIFs of 864 CUs x 64 soft bits.
"""

from __future__ import annotations

import jax.numpy as jnp

from dabjax.constants import CIF_BITS, CU_BITS, DabParams

__all__ = ["cifs_from_soft", "slice_subchannel"]


def cifs_from_soft(soft: jnp.ndarray, p: DabParams) -> jnp.ndarray:
    """[F, L-1, 2K] frame soft bits -> [F * cifs_per_frame, 55296] CIFs.

    Symbols 0..2 (FIC) are skipped; symbols 3.. are the MSC
    (reference numbering 4..L with the PRS as symbol 0;
    msc-handler.cpp:123-129, blocks-per-CIF table :62-71).
    """
    F = soft.shape[0]
    msc = soft[:, p.fic_symbols:, :]
    return msc.reshape(F * p.cifs_per_frame, CIF_BITS)


def slice_subchannel(cifs: jnp.ndarray, start_addr: int, length_cus: int
                     ) -> jnp.ndarray:
    """Static CU-range slice of a batch of CIFs (msc-handler.cpp:183-192)."""
    lo = start_addr * CU_BITS
    return cifs[..., lo: lo + length_cus * CU_BITS]
