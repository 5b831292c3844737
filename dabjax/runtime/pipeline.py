"""Jit-compiled receiver pipelines — the flagship compute graphs.

Pure functions of frame-aligned IQ with static mode/geometry parameters;
used by the runtime, the benchmark, and the multi-chip sharded step.
"""

from __future__ import annotations

import functools
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from dabjax.constants import DabParams, get_mode
from dabjax.fic.fic_decoder import decode_fic
from dabjax.iq import pack_iq, unpack_iq
from dabjax.msc.cif import cifs_from_soft
from dabjax.msc.subchannel import SubchGeometry, decode_subchannel
from dabjax.ofdm import demod

__all__ = ["frame_pipeline", "full_ensemble_pipeline", "example_rows"]


def frame_pipeline(p: DabParams):
    """Frame demod + FIC decode: rows [F, need, 2] float32 IQ pairs ->
    (soft, fib_bits, crc_ok, snr).  The single-chip forward step
    (BASELINE config 1)."""

    def fn(rows):
        rows = unpack_iq(rows)
        fine = demod.fine_cfo_estimate(rows, p)
        rows = demod.apply_cfo(rows, fine)
        soft, spec0 = demod.demodulate_frames(rows, p)
        snr = demod.snr_estimate(spec0, p)
        fibs, ok = decode_fic(soft[:, : p.fic_symbols, :], p)
        return soft, fibs, ok, snr

    return fn


def full_ensemble_pipeline(p: DabParams, geoms: Tuple[SubchGeometry, ...]):
    """Full-ensemble decode: rows [F, need, 2] float32 IQ pairs -> FIC +
    every subchannel.

    All subchannels must share a geometry shape (callers bucket first, as
    EnsembleDecoder does); returns (fib_crc_ok, subch_bits[n_subch, T-15,
    24*bitrate]).  This is BASELINE config 4 as one jittable graph.
    """
    starts = np.array([g.start_addr * 64 for g in geoms])
    n_bits = geoms[0].length_cus * 64
    proto = geoms[0]

    def fn(rows):
        rows = unpack_iq(rows)
        fine = demod.fine_cfo_estimate(rows, p)
        rows = demod.apply_cfo(rows, fine)
        soft, _ = demod.demodulate_frames(rows, p)
        fibs, ok = decode_fic(soft[:, : p.fic_symbols, :], p)
        cifs = cifs_from_soft(soft, p)
        idx = starts[:, None] + np.arange(n_bits)[None, :]
        slices = cifs[:, idx].transpose(1, 0, 2)       # [n_subch, T, bits]
        bits = decode_subchannel(slices, proto)
        return ok, bits

    return fn


def example_rows(p: DabParams, n_frames: int = 2, seed: int = 0):
    """Synthetic frame-aligned rows (float IQ pairs) for compile checks."""
    rng = np.random.default_rng(seed)
    need = demod.min_frame_samples(p)
    x = (rng.standard_normal((n_frames, need))
         + 1j * rng.standard_normal((n_frames, need))) / np.sqrt(2)
    return jnp.asarray(pack_iq(x))
