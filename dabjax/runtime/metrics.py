"""Receiver quality metrics (SURVEY.md §5 observability).

The reference surfaces these through Qt LCD widgets (gui.cpp:998-1025,
1374-1412); here they are a plain counters object with a text dashboard.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional


@dataclasses.dataclass
class Metrics:
    frames: int = 0
    synced: bool = False
    snr_db: float = 0.0
    fine_cfo_hz: float = 0.0
    coarse_cfo_hz: float = 0.0
    fic_crc_ok: int = 0
    fic_crc_bad: int = 0
    superframes_ok: int = 0
    superframes_bad: int = 0
    au_ok: int = 0
    au_bad: int = 0
    mp2_frames_ok: int = 0
    mp2_frames_bad: int = 0
    packet_crc_ok: int = 0
    packet_crc_bad: int = 0
    rs_corrected: int = 0
    samples_processed: int = 0
    resyncs: int = 0          # sync losses -> full re-acquisitions (§5)
    #: subchannels signalled by the ensemble whose puncturing profile this
    #: decoder lacks (skipped, never aborting the whole-ensemble decode)
    unsupported_subch: int = 0
    #: ewma of the measured frame length in samples (T_F + timing drift) —
    #: the clock-drift proxy shown by the reference as "avg token length"
    #: (ofdm-processor.cpp:368-380, gui.cpp display slot)
    avg_frame_len: float = 0.0
    #: host wall-seconds spent in audio decode (worker-process pool path)
    audio_decode_seconds: float = 0.0
    # scope taps (numpy arrays; excluded from as_dict)
    spectrum: Optional[object] = None        # [T_u] mean |PRS spectrum|
    constellation: Optional[object] = None   # [K] complex DQPSK points

    @property
    def fic_ratio(self) -> float:
        """FIC CRC success ratio (the per-100-block GUI metric)."""
        total = self.fic_crc_ok + self.fic_crc_bad
        return self.fic_crc_ok / total if total else 0.0

    def dashboard(self) -> str:
        return (
            f"sync={'Y' if self.synced else 'N'} frames={self.frames} "
            f"snr={self.snr_db:5.1f}dB cfo={self.coarse_cfo_hz:+.0f}"
            f"{self.fine_cfo_hz:+.1f}Hz fic={100*self.fic_ratio:5.1f}% "
            f"sf={self.superframes_ok}/{self.superframes_ok+self.superframes_bad} "
            f"au={self.au_ok}/{self.au_ok+self.au_bad} "
            f"mp2={self.mp2_frames_ok} rs_fix={self.rs_corrected}")

    def as_dict(self) -> Dict[str, float]:
        d = {f.name: getattr(self, f.name)
             for f in dataclasses.fields(self)
             if f.name not in ("spectrum", "constellation")}
        return d | {"fic_ratio": self.fic_ratio}
