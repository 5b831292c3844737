"""Runtime configuration — the single config surface of the framework.

Collapses the reference's three tiers (CMake feature flags, argv, ini file +
GUI widgets; SURVEY.md §5 "Config / flag system") into one dataclass.
"""

from __future__ import annotations

import dataclasses
from typing import Optional


@dataclasses.dataclass
class ReceiverConfig:
    mode: int = 1                    # DAB transmission mode I..IV
    frames_per_block: int = 4        # frames demodulated per device batch
    sync_threshold: float = 3.0      # PRS correlation gate (phasereference)
    coarse_cfo: bool = True          # coarse corrector on (ofdm-processor)
    max_coarse_khz: float = 35.0     # +-35 kHz clamp (ofdm-processor:400)
    service: Optional[str] = None    # decode one service; None = all
    decode_audio: bool = True        # run MP2/AAC handlers on decoded bytes
    decode_data: bool = True         # run PAD/MOT/packet handlers
    # decode each service's audio on its own worker thread, overlapping
    # the next block's device work (the reference's audio-thread
    # topology); Receiver.run()/close() drain before returning
    async_audio: bool = True
    # > 0: decode audio in N worker PROCESSES instead of threads (the
    # GIL escape for many-channel scan workloads; PCM stays in the
    # workers — counters only).  0 = in-process threads (default; keeps
    # PCM sinks, dynamic labels and slides available).
    audio_workers: int = 0
    scan_attempts: int = 5           # no-signal attempts before giving up
    resync_after_bad_blocks: int = 2  # all-FIBs-bad blocks before notSynced
    dump_iq_path: Optional[str] = None     # raw-IQ tap (ofdm-processor dump)
    dump_audio_path: Optional[str] = None  # PCM tap (audiosink dump)
    dump_es_path: Optional[str] = None     # MP2 elementary-stream tap

    def save(self, path: str) -> None:
        """Persist to JSON (the ~/.jsdr-dab.ini analog, gui.cpp:274-283)."""
        import json
        with open(path, "w") as f:
            json.dump(dataclasses.asdict(self), f, indent=2)

    @classmethod
    def load(cls, path: str) -> "ReceiverConfig":
        import json
        with open(path) as f:
            data = json.load(f)
        known = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in data.items() if k in known})
