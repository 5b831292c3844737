"""AAC access-unit handling for DAB+ (ETSI TS 102 563 §5.3).

The reference delegates AAC decoding to the third-party libfaad2 codec
(``faad-decoder.h:28-165``); the framework keeps the *AU byte interface*
bit-exact (which is what SURVEY.md §4 names as the correctness boundary) and
treats PCM synthesis as a pluggable host codec:

* :func:`audio_specific_config` — the 2-byte AudioSpecificConfig selecting
  the 960-sample transform, byte-identical to faad-decoder.h:106-110.
* :class:`AacSink` — collects AUs, exposes them as a DAB+ elementary stream,
  and decodes to PCM when a host AAC decoder is available (none is bundled
  in this image; the hook accepts any callable AU->PCM).
"""

from __future__ import annotations

from typing import Callable, List, Optional

import numpy as np

__all__ = ["audio_specific_config", "aac_channel_configuration", "AacSink"]


def aac_channel_configuration(mpeg_surround: int,
                              aac_channel_mode: int) -> int:
    """Core channel config (faad-decoder.h get_aac_channel_configuration)."""
    if mpeg_surround == 0:
        return 2 if aac_channel_mode else 1
    if mpeg_surround == 1:  # 5.1
        return 6
    return -1


def audio_specific_config(dac_rate: int, sbr_flag: int,
                          mpeg_surround: int, aac_channel_mode: int) -> bytes:
    """2-byte ASC: AAC-LC, core sample-rate index, 960 transform."""
    core_sr_index = (6 if sbr_flag else 3) if dac_rate else \
                    (8 if sbr_flag else 5)   # 24/48/16/32 kHz
    core_ch = aac_channel_configuration(mpeg_surround, aac_channel_mode)
    if core_ch < 0:
        raise ValueError(f"unsupported mpegSurround {mpeg_surround}")
    asc0 = (0b00010 << 3) | (core_sr_index >> 1)
    asc1 = ((core_sr_index & 1) << 7) | (core_ch << 3) | 0b100
    return bytes([asc0, asc1])


def sample_rate(dac_rate: int, sbr_flag: int) -> int:
    """Core AAC sample rate in Hz (output rate is 2x with SBR)."""
    return (24000 if sbr_flag else 48000) if dac_rate else \
           (16000 if sbr_flag else 32000)


def decode_au_hook() -> Optional[Callable]:
    """Default AU->PCM decoder: the framework's own AAC-LC (960) core
    (:mod:`dabjax.audio.aac_lc`), stateful per stream.

    Returns a callable ``(asc: bytes, au: bytes) -> np.ndarray [n, ch]``
    (float32 in [-1, 1]) or ``None`` when the core decoder is missing —
    the sink then still records the elementary stream.
    """
    try:
        from dabjax.audio.aac_lc import AacLcDecoder
    except ImportError:                      # pragma: no cover
        return None
    state = {}

    def decode(asc: bytes, au: bytes):
        dec = state.get(asc)
        if dec is None:
            dec = state[asc] = AacLcDecoder.from_asc(asc)
        return dec.decode_au(au)

    return decode


class AacSink:
    """AU collector + PCM decode.

    ``decoder``: callable ``(asc: bytes, au: bytes) -> np.ndarray`` PCM
    frames [n, channels] (float32 [-1,1] or int16), or None to only
    record the elementary stream (the reference's .mp4 dump path,
    msc-handler.cpp setFiles).  Defaults to the framework AAC-LC core
    via :func:`decode_au_hook` — the faadDecoder::MP42PCM analog
    (faad-decoder.h:124-165).
    """

    _DEFAULT = object()

    def __init__(self, decoder: Optional[Callable] = _DEFAULT):
        self.decoder = decode_au_hook() if decoder is AacSink._DEFAULT \
            else decoder
        self.aus: List[bytes] = []
        self.pcm: List[np.ndarray] = []
        self.config: Optional[bytes] = None
        self.rate: int = 48000
        self.sbr_flag: int = 0
        self.decode_errors: int = 0
        self._core_len: int = 960            # DAB+ transform length

    def configure(self, dac_rate: int, sbr_flag: int, mpeg_surround: int,
                  aac_channel_mode: int):
        self.config = audio_specific_config(
            dac_rate, sbr_flag, mpeg_surround, aac_channel_mode)
        self.sbr_flag = sbr_flag
        self.rate = sample_rate(dac_rate, sbr_flag) * (2 if sbr_flag else 1)

    def add_au(self, au: bytes) -> Optional[np.ndarray]:
        """Collect one AU; return its decoded PCM [n, ch] (or None)."""
        au = bytes(au)
        self.aus.append(au)
        if self.decoder is None or self.config is None:
            return None
        try:
            out = self.decoder(self.config, au)
        except Exception:
            self.decode_errors += 1
            return None
        if out is None:
            return None
        out = np.asarray(out)
        if out.dtype == np.int16:
            out = out.astype(np.float32) / 32768.0
        out = out.reshape(out.shape[0], -1)
        if self.sbr_flag and out.shape[0] == self._core_len:
            # SBR signalled but this AU carried no SBR payload (or the
            # decoder lacks the tool): QMF-grade 2x upsample keeps the
            # output clock exact.  With dabjax's own SBR decoder active
            # (aac_lc._apply_sbr) frames already arrive at 2x length.
            out = np.repeat(out, 2, axis=0)
        self.pcm.append(out)
        return out

    def elementary_stream(self) -> bytes:
        return b"".join(self.aus)
