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


class AacSink:
    """AU collector + optional PCM decode hook.

    ``decoder``: optional callable ``(asc: bytes, au: bytes) -> np.ndarray``
    returning int16 PCM frames [n, channels]; when absent the sink still
    records the elementary stream (decodable offline), mirroring the
    reference's .mp4 dump path (msc-handler.cpp setFiles).
    """

    def __init__(self, decoder: Optional[Callable] = None):
        self.decoder = decoder
        self.aus: List[bytes] = []
        self.pcm: List[np.ndarray] = []
        self.config: Optional[bytes] = None
        self.rate: int = 48000

    def configure(self, dac_rate: int, sbr_flag: int, mpeg_surround: int,
                  aac_channel_mode: int):
        self.config = audio_specific_config(
            dac_rate, sbr_flag, mpeg_surround, aac_channel_mode)
        self.rate = sample_rate(dac_rate, sbr_flag) * (2 if sbr_flag else 1)

    def add_au(self, au: bytes):
        self.aus.append(au)
        if self.decoder is not None and self.config is not None:
            out = self.decoder(self.config, au)
            if out is not None:
                self.pcm.append(np.asarray(out, np.int16))

    def elementary_stream(self) -> bytes:
        return b"".join(self.aus)
