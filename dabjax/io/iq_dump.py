"""Raw-IQ dump tap — the ofdm-processor .sdr recorder analog
(``ofdm-processor.cpp:150-157,485-496``).

Writes 2-channel float32 WAV at 2048 kHz, the exact format the reference
records via libsndfile and replays through wavFiles — so dumps made here
replay through :class:`dabjax.io.sources.WavFileSource` (and through the
reference application itself).
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["IqDumpWriter"]


class IqDumpWriter:
    """Streaming float32 stereo WAV writer (I in L, Q in R)."""

    def __init__(self, path: str, sample_rate: int = 2_048_000):
        self.path = path
        self.sample_rate = sample_rate
        self._f = open(path, "wb")
        self._n_bytes = 0
        self._write_header(0)

    def _write_header(self, data_bytes: int):
        f = self._f
        f.seek(0)
        byte_rate = self.sample_rate * 2 * 4
        f.write(b"RIFF")
        f.write(struct.pack("<I", 36 + data_bytes))
        f.write(b"WAVE")
        f.write(b"fmt ")
        # fmt 3 = IEEE float, 2 channels, 32 bits
        f.write(struct.pack("<IHHIIHH", 16, 3, 2, self.sample_rate,
                            byte_rate, 8, 32))
        f.write(b"data")
        f.write(struct.pack("<I", data_bytes))

    def write(self, iq: np.ndarray) -> None:
        """Append complex64 samples."""
        x = np.asarray(iq, np.complex64)
        inter = np.empty(2 * x.shape[0], np.float32)
        inter[0::2] = np.real(x)
        inter[1::2] = np.imag(x)
        self._f.seek(0, 2)
        self._f.write(inter.tobytes())
        self._n_bytes += inter.nbytes

    def close(self) -> None:
        if self._f is not None:
            self._write_header(self._n_bytes)
            self._f.close()
            self._f = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
