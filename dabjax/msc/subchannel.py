"""Subchannel decode: CIF soft bits -> logical-frame bits, all services.

The reference decodes exactly ONE selected subchannel on a backend thread
(``msc-handler.cpp:183-192``, ``dab-concurrent.cpp:144-193``).  Here the
depuncture + Viterbi + energy-dispersal chain is a pure jitted function of
static subchannel geometry, and *every* active subchannel of the ensemble is
decoded concurrently by bucketing services with identical geometry shapes
(bitrate/protection) into a vmapped batch — the "expert-parallel-shaped"
axis of SURVEY.md §2.5.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from dabjax.constants import CU_BITS, DabParams
from dabjax.fec import prbs, puncture, viterbi
from dabjax.msc.deinterleave import HISTORY, time_deinterleave

__all__ = ["SubchGeometry", "subch_puncture_mask", "decode_subchannel",
           "EnsembleDecoder"]


@dataclasses.dataclass(frozen=True)
class SubchGeometry:
    """Static decode geometry of one subchannel (hashable jit key)."""
    subch_id: int
    start_addr: int
    length_cus: int
    bitrate: int
    protection: str      # "UEP" | "EEP-A" | "EEP-B"
    prot_level: int

    @classmethod
    def from_db(cls, sc) -> "SubchGeometry":
        prot = ("UEP" if sc.uep_flag == 0
                else f"EEP-{sc.eep_profile}")
        return cls(subch_id=sc.subch_id, start_addr=sc.start_addr,
                   length_cus=sc.length, bitrate=sc.bitrate,
                   protection=prot, prot_level=sc.prot_level)

    @property
    def shape_key(self) -> Tuple:
        return (self.length_cus, self.bitrate, self.protection,
                self.prot_level)


@functools.lru_cache(maxsize=None)
def subch_puncture_mask(protection: str, bitrate: int, prot_level: int
                        ) -> np.ndarray:
    if protection == "UEP":
        lengths, pis = puncture.uep_profile(bitrate, prot_level)
    else:
        lengths, pis = puncture.eep_profile(bitrate, prot_level,
                                            protection[-1])
    return puncture.puncture_mask(lengths, pis)


def decode_subchannel(subch_soft: jnp.ndarray, g: SubchGeometry,
                      deinterleave: bool = True) -> jnp.ndarray:
    """Decode one subchannel's CIF slices.

    ``subch_soft``: [..., T, length_cus*64] soft bits for T consecutive
    CIFs (leading dims batch, e.g. over subchannels of one bucket).
    Returns [..., T - 15, 24*bitrate] decoded logical-frame bits (int32),
    after time de-interleave, depuncture, Viterbi and energy dispersal
    (dab-concurrent.cpp:144-193 semantics; output CIF index t+15
    corresponds to transmitted logical frame t).
    """
    if g.protection == "UEP":
        lengths, pis = puncture.uep_profile(g.bitrate, g.prot_level)
    else:
        lengths, pis = puncture.eep_profile(g.bitrate, g.prot_level,
                                            g.protection[-1])
    soft = time_deinterleave(subch_soft) if deinterleave else subch_soft
    full = puncture.depuncture_profile(soft, lengths, pis)
    bits = viterbi.viterbi_decode(full, 24 * g.bitrate)
    return prbs.disperse(bits)


@functools.lru_cache(maxsize=None)
def _bucket_fn_cached(key: Tuple):
    """One jitted bucket decoder per shape, shared process-wide: many
    receivers (channel scan, config-5 multi-channel) with same-shaped
    subchannels reuse one compiled program instead of recompiling per
    EnsembleDecoder instance."""
    length_cus, bitrate, protection, prot_level = key
    proto = SubchGeometry(-1, 0, length_cus, bitrate, protection,
                          prot_level)

    @jax.jit
    def run(stacked):  # [n_subch, T, length*64]
        return decode_subchannel(stacked, proto)

    return run


class EnsembleDecoder:
    """All-services MSC decoder over shape buckets.

    Groups subchannels with identical (size, bitrate, protection) and
    decodes each bucket as one vmapped Viterbi batch.  Returns per-subchannel
    logical-frame bits keyed by subch_id.

    With ``mesh`` set, each bucket's subchannel axis is padded to a multiple
    of the mesh size and sharded across every device (the expert-parallel
    axis of SURVEY.md §2.5) — XLA runs the vmapped Viterbi SPMD and gathers
    the bits on readback; per-subchannel math is unchanged, so outputs stay
    bit-identical to the single-chip path.
    """

    def __init__(self, geometries: Sequence[SubchGeometry], p: DabParams,
                 mesh=None):
        self.p = p
        self.mesh = mesh
        self.geoms = list(geometries)
        self._buckets: Dict[Tuple, List[SubchGeometry]] = {}
        for g in self.geoms:
            self._buckets.setdefault(g.shape_key, []).append(g)

    def _bucket_fn(self, key: Tuple):
        return _bucket_fn_cached(key)

    def decode(self, cifs: jnp.ndarray) -> Dict[int, np.ndarray]:
        """``cifs``: [T, 55296] consecutive CIF soft bits (T > 15).

        Returns {subch_id: [T-15, 24*bitrate] bits}.
        """
        out: Dict[int, np.ndarray] = {}
        for key, geoms in self._buckets.items():
            slices = jnp.stack([
                cifs[:, g.start_addr * CU_BITS:
                     (g.start_addr + g.length_cus) * CU_BITS]
                for g in geoms])
            if self.mesh is not None:
                from jax.sharding import NamedSharding, PartitionSpec as P
                pad = (-len(geoms)) % self.mesh.size
                if pad:    # pad-to-bucket: replicate subch 0, trimmed below
                    slices = jnp.concatenate(
                        [slices, jnp.repeat(slices[:1], pad, axis=0)])
                slices = jax.device_put(slices, NamedSharding(
                    self.mesh, P(tuple(self.mesh.axis_names), None, None)))
            bits = self._bucket_fn(key)(slices)
            # ONE device->host transfer per bucket, not one per
            # subchannel: the tunnel runtime charges 30-120 ms latency
            # per pull, which would dominate the product receiver
            bits_np = np.asarray(bits)
            for i, g in enumerate(geoms):   # enumerate trims pad rows
                out[g.subch_id] = bits_np[i]
        return out
