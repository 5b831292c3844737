"""The receiver runtime: source -> OFDM -> FIC/MSC -> audio/data sinks.

This is the control plane that replaces the reference's thread+ringbuffer
topology (SURVEY.md §1): instead of five threads handing single symbols
around, the host orchestrates *blocks of frames* through jit-compiled device
stages and routes the decoded bytes to per-service handlers.

Pipeline per block (all device work batched over frames):
  1. frame rows gathered at the tracked PRS position (timing from per-block
     PRS correlation — replaces the SyncOnPhase state,
     ofdm-processor.cpp:344-366)
  2. fine CFO estimated from guard correlation and applied as a phase ramp
     (replaces the 0.1-gain integrator, ofdm-processor.cpp:445-446)
  3. batched FFT demod -> soft bits (ofdm-decoder semantics)
  4. FIC: depuncture + Viterbi + CRC gate -> FIB bytes -> EnsembleDB (host)
  5. MSC: CIFs assembled, all (or one selected) subchannels decoded via
     bucketed Viterbi, logical frames routed to MP2 / DAB+ / packet handlers
"""

from __future__ import annotations

import functools
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from dabjax.constants import CIF_BITS, get_mode
from dabjax.audio.aac import AacSink, decode_au_hook
from dabjax.audio.mp2 import Mp2Decoder
from dabjax.audio.mp4 import SuperframeDecoder
from dabjax.fic.fib import EnsembleDB
from dabjax.fic.fic_decoder import decode_fic
from dabjax.iq import device_complex, pack_iq, unpack_iq
from dabjax.msc.cif import cifs_from_soft
from dabjax.msc.deinterleave import HISTORY
from dabjax.msc.subchannel import EnsembleDecoder, SubchGeometry
from dabjax.ofdm import acquisition, demod
from dabjax.runtime.config import ReceiverConfig
from dabjax.runtime.metrics import Metrics
from dabjax.runtime.profiling import StageProfiler
from dabjax.data.pad import PadHandler
from dabjax.data.packet import PacketService

__all__ = ["Receiver", "AudioService"]


def default_data_handler_factory(db: EnsembleDB, subch_id: int):
    """Build a PacketService from the ensemble DB's packet component
    signalling (the set_dataChannel analog, msc-handler.cpp:125)."""
    for comp in db.components:
        if comp.tmid == 3 and comp.subch_id == subch_id and comp.dscty >= 0:
            sc = db.subchannels.get(subch_id)
            fec = sc.fec_scheme if sc is not None else 0
            return PacketService(comp.dscty, fec_scheme=fec)
    return None


def _per_subch_path(path: Optional[str], subch_id: int) -> Optional[str]:
    """Suffix a dump path with the subchannel id so concurrent services
    never truncate each other's tap (``tap.mp2`` -> ``tap.3.mp2``)."""
    if path is None:
        return None
    import os
    stem, ext = os.path.splitext(path)
    return f"{stem}.{subch_id}{ext}"


class AudioService:
    """Per-service audio chain: logical frames -> PCM / AUs (+ PAD)."""

    def __init__(self, subch_id: int, bitrate: int, is_dab_plus: bool,
                 metrics: Metrics, es_dump_path=None, pcm_dump_path=None):
        self.subch_id = subch_id
        self.is_dab_plus = is_dab_plus
        self.metrics = metrics
        self.pad = PadHandler()
        es_dump_path = _per_subch_path(es_dump_path, subch_id)
        if is_dab_plus:
            self.superframe = SuperframeDecoder(bitrate)
            self.aac = AacSink(decoder=decode_au_hook())
            self.mp2 = None
            self._es_dump = (open(es_dump_path, "wb")
                             if es_dump_path else None)
        else:
            self.superframe = None
            self.mp2 = Mp2Decoder(es_dump_path=es_dump_path)
            self._es_dump = None
        # PCM tap (the audiosink WAV-dump path, gui.cpp:961-996)
        self._pcm_dump_path = _per_subch_path(pcm_dump_path, subch_id)
        self._pcm_sink = None
        self.pcm: List[np.ndarray] = []

    def _emit_pcm(self, pcm: np.ndarray, rate: int):
        self.pcm.append(pcm)
        if self._pcm_dump_path is not None:
            if self._pcm_sink is None:
                from dabjax.io.audio_out import WavSink
                self._pcm_sink = WavSink(self._pcm_dump_path)
            self._pcm_sink.write(pcm, rate)

    @property
    def dynamic_label(self) -> str:
        return self.pad.label

    @property
    def slides(self):
        return self.pad.mot.objects

    def add_logical_frame(self, bits: np.ndarray):
        data = np.packbits(np.asarray(bits, np.uint8))
        if self.is_dab_plus:
            pre_ok = self.superframe.superframes_ok
            aus = self.superframe.add_frame(data)
            for au in aus:
                if au.crc_ok:
                    self.metrics.au_ok += 1
                    hdr = self.superframe.header
                    self.pad.process_au(bytes(au.data))
                    self.aac.configure(hdr.dac_rate, hdr.sbr_flag,
                                       hdr.mpeg_surround,
                                       hdr.aac_channel_mode)
                    pcm = self.aac.add_au(au.data)
                    if pcm is not None and pcm.size:
                        self._emit_pcm(pcm, self.aac.rate)
                    if self._es_dump is not None:
                        self._es_dump.write(bytes(au.data))
                else:
                    self.metrics.au_bad += 1
            self.metrics.superframes_ok = self.superframe.superframes_ok
            self.metrics.superframes_bad = self.superframe.superframe_errors
            self.metrics.rs_corrected = self.superframe.rs_corrected
        else:
            for pcm in self.mp2.add_bytes(data.tobytes()):
                self._emit_pcm(pcm, self.mp2.sample_rate)
            self.metrics.mp2_frames_ok = self.mp2.frames_ok
            self.metrics.mp2_frames_bad = self.mp2.frames_bad


class Receiver:
    """Block-batched DAB receiver (the RadioInterface + ofdmProcessor +
    ficHandler + mscHandler control flow, re-architected)."""

    def __init__(self, source, config: Optional[ReceiverConfig] = None,
                 data_handler_factory=None, mesh=None):
        """``mesh``: optional jax.sharding.Mesh — the product multi-chip
        path.  Frames are sharded across every device in the demod/FIC/PRS
        block and subchannels across every device in the MSC bucket decode
        (SURVEY.md §2.5); outputs stay bit-identical to single-chip
        (tests/test_parallel.py)."""
        self.source = source
        self.cfg = config or ReceiverConfig()
        self.mesh = mesh
        if mesh is not None and self.cfg.frames_per_block % mesh.size:
            raise ValueError(
                f"frames_per_block={self.cfg.frames_per_block} must be a "
                f"multiple of the mesh size {mesh.size}")
        self.p = get_mode(self.cfg.mode)
        self.db = EnsembleDB()
        self.metrics = Metrics()
        self.profiler = StageProfiler()
        self.audio: Dict[int, AudioService] = {}
        self.data_handler_factory = (data_handler_factory
                                     or default_data_handler_factory)
        self.data_handlers: Dict[int, object] = {}
        self._audio_pools: Dict[int, object] = {}
        self._audio_futs: List[object] = []
        self._buf = np.zeros(0, np.complex64)
        self._buf_base = 0          # absolute index of _buf[0]
        self._u0: Optional[float] = None  # absolute PRS-useful-start index
        # tracked rx samples per frame: T_F plus the sample-clock drift
        # (the avgTokenLength analog, ofdm-processor.cpp:368-380)
        self._frame_len = float(self.p.T_F)
        self._coarse_hz = 0.0
        self._cif_hist = jnp.zeros((HISTORY, CIF_BITS), jnp.float32)
        self._hist_valid = 0        # CIFs of real history accumulated
        self._decoder: Optional[EnsembleDecoder] = None
        self._decoder_key = None
        self._bad_blocks = 0        # consecutive blocks with zero FIC CRCs
        self._unsupported_warned: set = set()
        self._iq_dump = None
        if self.cfg.dump_iq_path:
            from dabjax.io.iq_dump import IqDumpWriter
            self._iq_dump = IqDumpWriter(self.cfg.dump_iq_path)
        self._block_fn = self._build_block_fn()

    def reset(self, source=None) -> None:
        """Retune: clear all stream/ensemble state but keep the compiled
        device functions — the channel-hop path of the band scan
        (gui.cpp:561-638 re-enters startScanning without rebuilding the
        processor chain)."""
        if source is not None:
            self.source = source
        self.db = EnsembleDB()
        self.metrics = Metrics()
        self.audio = {}
        self._drain_audio()
        self._audio_pools = {}
        self.data_handlers = {}
        self._buf = np.zeros(0, np.complex64)
        self._buf_base = 0
        self._u0 = None
        self._frame_len = float(self.p.T_F)
        self._coarse_hz = 0.0
        self._cif_hist = jnp.zeros((HISTORY, CIF_BITS), jnp.float32)
        self._hist_valid = 0
        self._decoder = None
        self._decoder_key = None
        self._bad_blocks = 0
        self._unsupported_warned = set()

    # ------------------------------------------------------------- device

    def _build_block_fn(self):
        if self.mesh is None:
            # single-chip: one compiled block per mode, shared process-wide
            # (8 concurrent channel receivers compile once, not 8 times)
            return _block_fn_cached(self.cfg.mode)
        return _build_block_fn_for(self.p, self.mesh)


    # --------------------------------------------------------------- I/O

    def _ensure(self, abs_end: int) -> bool:
        """Grow the buffer to cover absolute sample index < abs_end."""
        need = abs_end - (self._buf_base + self._buf.shape[0])
        if need > 0:
            chunk = self.source.read(int(need))
            if chunk.shape[0] < need:
                if chunk.shape[0]:
                    self._buf = np.concatenate([self._buf, chunk])
                return False
            self._buf = np.concatenate([self._buf, chunk])
        return True

    def _drop_before(self, abs_idx: int):
        # never drop past what was actually read: _buf_base + len(_buf) must
        # stay equal to the number of samples consumed from the source
        cut = min(abs_idx - self._buf_base, self._buf.shape[0])
        if cut > 0:
            self._buf = self._buf[cut:]
            self._buf_base += cut

    # ---------------------------------------------------------- acquire

    def acquire(self) -> bool:
        p = self.p
        for _ in range(self.cfg.scan_attempts):
            if not self._ensure(self._buf_base + 2 * p.T_F + p.T_null
                                + p.T_u):
                return False
            u0 = acquisition.acquire(self._buf, p, self.cfg.sync_threshold)
            if u0 is not None:
                self._u0 = float(self._buf_base + int(u0))
                self._probe_frame_len()
                self.metrics.synced = True
                return True
            self._drop_before(self._buf_base + p.T_F)
        self.metrics.synced = False
        return False

    def _probe_frame_len(self):
        """Initial sample-clock estimate: locate the PRS k frames ahead of
        u0 and divide the residual by k, so the first full block is already
        gathered on the drifted grid (a +-100 ppm clock moves the PRS by
        ~20 samples/frame in Mode I — beyond T_g within one 96-frame block
        if uncorrected).  Refined every block by the per-frame fit in
        step(); ref: ofdm-processor.cpp:344-380."""
        p = self.p
        k = 8
        if not self._ensure(int(self._u0) + k * p.T_F + p.T_u):
            return
        base = int(self._u0) - self._buf_base + k * p.T_F
        win = self._buf[base: base + p.T_u]
        start, ok = acquisition.prs_sync(
            device_complex(win[None, :]), p, self.cfg.sync_threshold)
        if not float(np.asarray(ok)[0]):
            return
        d = int(np.asarray(start)[0])
        d = (d + p.T_u // 2) % p.T_u - p.T_u // 2
        if abs(d) <= p.T_g:
            self._frame_len = p.T_F + d / k

    # -------------------------------------------------------------- step

    def step(self) -> bool:
        """Process one block of cfg.frames_per_block frames.

        Returns False when the source is exhausted.
        """
        p = self.p
        F = self.cfg.frames_per_block
        if self._u0 is None and not self.acquire():
            return False
        need = demod.min_frame_samples(p)
        # per-frame gather positions on the drifted sample grid: frame f
        # starts frame_len (not T_F) rx samples after frame f-1
        pos = np.round(self._u0
                       + np.arange(F) * self._frame_len).astype(np.int64)
        end = int(pos[-1]) + need
        if not self._ensure(end):
            return False
        base = pos - self._buf_base
        rows = np.stack([self._buf[b: b + need] for b in base])
        if self._iq_dump is not None:        # raw-IQ tap at pipeline input
            self._iq_dump.write(self._buf[base[0]: base[0] + F * p.T_F])

        with self.profiler.stage("device_block", items=F * p.T_F):
            cifs, packed = self._block_fn(
                jnp.asarray(pack_iq(rows)), jnp.float32(self._coarse_hz))
            packed = np.asarray(packed)      # the ONE host pull per block
        # unpack by static offsets (see _build_block_fn_for's layout)
        from dabjax.fic.fic_decoder import fic_codewords_per_frame, \
            fic_profile
        n_fib = fic_codewords_per_frame(p) * fic_profile(p)[2]
        pos = 0

        def take(n, shape=None):
            nonlocal pos
            v = packed[pos: pos + n]
            pos += n
            return v if shape is None else v.reshape(shape)

        snr = take(F)
        fine = take(F)
        coarse = take(F)
        t_off = take(F)
        t_ok = take(F)
        fic_ok = take(F * n_fib, (F, n_fib))
        fibs_np = take(F * n_fib * 256, (F, n_fib, 256)).astype(np.int32)
        spectrum = take(p.T_u)
        constel = take(2 * p.K)
        # scope taps (SURVEY.md §2.4: spectrum waterfall + IQ display)
        self.metrics.spectrum = spectrum
        k = self.p.K
        self.metrics.constellation = (
            -constel[:k] - 1j * constel[k:]) / 127.0

        # ----- metrics + correctors
        self.metrics.frames += F
        self.metrics.samples_processed += F * p.T_F
        self.metrics.snr_db = float(np.mean(np.asarray(snr)))
        self.metrics.fine_cfo_hz = float(np.mean(np.asarray(fine)))
        if self.cfg.coarse_cfo:
            step = float(np.median(np.asarray(coarse))) * p.carrier_diff
            self._coarse_hz += step
            if abs(self._coarse_hz) > self.cfg.max_coarse_khz * 1000:
                self._coarse_hz = 0.0
            self.metrics.coarse_cfo_hz = self._coarse_hz
        # ----- timing tracking: per-frame PRS offsets, least-squares drift
        # fit.  Intercept corrects u0; slope corrects the tracked frame
        # length (the per-frame resync + avgTokenLength pair,
        # ofdm-processor.cpp:344-380).  Only in-guard measurements from
        # strong correlations steer the clock.
        off = np.asarray(t_off).astype(np.int64)
        off = (off + p.T_u // 2) % p.T_u - p.T_u // 2
        good = (np.asarray(t_ok) > 0) & (np.abs(off) <= p.T_g)
        if good.sum() >= 2:
            slope, intercept = np.polyfit(
                np.arange(F)[good], off[good].astype(np.float64), 1)
            self._u0 += float(np.clip(intercept, -p.T_g, p.T_g))
            self._frame_len = float(np.clip(
                self._frame_len + slope,
                p.T_F * (1 - 3e-4), p.T_F * (1 + 3e-4)))
        elif good.any():
            self._u0 += int(off[np.argmax(good)])
        self.metrics.avg_frame_len = (
            self._frame_len if self.metrics.avg_frame_len == 0.0
            else 0.9 * self.metrics.avg_frame_len + 0.1 * self._frame_len)

        # ----- FIC -> ensemble database
        block_ok = 0
        for f in range(F):
            for i in range(fibs_np.shape[1]):
                if fic_ok[f, i]:
                    self.metrics.fic_crc_ok += 1
                    block_ok += 1
                    self.db.process_fib_bits(fibs_np[f, i])
                else:
                    self.metrics.fic_crc_bad += 1

        # ----- failure detection: sync loss -> full re-acquisition (the
        # notSynced fallback, ofdm-processor.cpp:310-316; SURVEY.md §5)
        if block_ok == 0:
            self._bad_blocks += 1
            if self._bad_blocks >= self.cfg.resync_after_bad_blocks:
                self._u0 = None
                self._coarse_hz = 0.0
                self._bad_blocks = 0
                self.metrics.synced = False
                self.metrics.resyncs += 1
                self._hist_valid = 0
                return True
        else:
            self._bad_blocks = 0

        # ----- MSC (skipped entirely in FIC-only use — e.g. the band scan
        # only needs the ensemble DB, msc-handler stays cold)
        if self.cfg.decode_audio or self.cfg.decode_data:
            with self.profiler.stage("msc", items=F * p.T_F):
                self._process_cifs(cifs)    # device-resident throughout

        self._u0 += F * self._frame_len
        self._drop_before(int(self._u0) - p.T_u)
        return True

    # --------------------------------------------------------------- MSC

    def _decodable(self, g: SubchGeometry) -> bool:
        """True when a puncturing profile exists for this geometry.  An
        ensemble may signal profiles this decoder lacks; one such
        subchannel must never abort the whole-ensemble decode (the
        findIndex fallback, deconvolve.cpp:142-166)."""
        from dabjax.msc.subchannel import subch_puncture_mask
        try:
            subch_puncture_mask(g.protection, g.bitrate, g.prot_level)
            return True
        except (ValueError, KeyError):
            if g.subch_id not in self._unsupported_warned:
                self._unsupported_warned.add(g.subch_id)
                self.metrics.unsupported_subch += 1
            return False

    def _geometries(self) -> List[SubchGeometry]:
        geoms = []
        if self.cfg.service is not None:
            ad = self.db.data_for_audio_service(self.cfg.service)
            pd = (self.db.data_for_data_service(self.cfg.service)
                  if ad is None else None)
            d = ad or pd
            if d is None:
                return []
            sc = self.db.subchannels[d.subch_id]
            g = SubchGeometry.from_db(sc)
            return [g] if self._decodable(g) else []
        for sc in self.db.subchannels.values():
            if sc.bitrate > 0 and sc.length > 0:
                g = SubchGeometry.from_db(sc)
                if self._decodable(g):
                    geoms.append(g)
        return geoms

    def _process_cifs(self, cifs):
        """``cifs`` is a device array [n, CIF_BITS]; the history window
        and bucket decode stay on device — only decoded logical-frame
        bits cross to the host, at the CRC-gated routing boundary."""
        geoms = self._geometries()
        if not geoms:
            # still waiting for FIG 0/1; keep rolling history
            self._push_history(cifs)
            return
        key = tuple(sorted((g.subch_id,) + g.shape_key + (g.start_addr,)
                           for g in geoms))
        if key != self._decoder_key:
            self._decoder = EnsembleDecoder(geoms, self.p, mesh=self.mesh)
            self._decoder_key = key
        block = jnp.concatenate([self._cif_hist, cifs], axis=0)
        out = self._decoder.decode(block)
        warmup = max(0, HISTORY - self._hist_valid)
        for subch_id, frames in out.items():
            for t in range(warmup, frames.shape[0]):
                self._route(subch_id, frames[t])
        self._push_history(cifs)

    def _push_history(self, cifs):
        joined = jnp.concatenate([self._cif_hist, cifs], axis=0)
        self._cif_hist = joined[-HISTORY:]
        self._hist_valid = min(HISTORY, self._hist_valid + cifs.shape[0])

    # ------------------------------------------------------------- route

    def _audio_meta(self, subch_id: int):
        for svc in self.db.services.values():
            if not svc.has_label:
                continue
            d = self.db.data_for_audio_service(svc.label)
            if d is not None and d.subch_id == subch_id:
                return d
        return None

    def _submit_audio(self, svc: AudioService, bits: np.ndarray):
        """Feed one logical frame to a service — on its worker thread
        when async_audio is set (per-service single-thread executors keep
        frame order; host audio decode then overlaps the next block's
        device work, the reference's audio-thread topology), inline
        otherwise."""
        if not self.cfg.async_audio:
            svc.add_logical_frame(bits)
            return
        pool = self._audio_pools.get(svc.subch_id)
        if pool is None:
            from concurrent.futures import ThreadPoolExecutor
            pool = ThreadPoolExecutor(max_workers=1)
            self._audio_pools[svc.subch_id] = pool
        self._audio_futs.append(pool.submit(svc.add_logical_frame, bits))

    def _drain_audio(self):
        for f in self._audio_futs:
            f.result()                   # surfaces worker exceptions too
        self._audio_futs.clear()

    def _route(self, subch_id: int, bits: np.ndarray):
        if subch_id in self.audio:
            self._submit_audio(self.audio[subch_id], bits)
            return
        if subch_id in self.data_handlers:
            self.data_handlers[subch_id].add_logical_frame(bits)
            return
        meta = self._audio_meta(subch_id)
        if meta is not None and self.cfg.decode_audio:
            self.audio[subch_id] = AudioService(
                subch_id, meta.bitrate, meta.is_dab_plus, self.metrics,
                es_dump_path=self.cfg.dump_es_path,
                pcm_dump_path=self.cfg.dump_audio_path)
            self._submit_audio(self.audio[subch_id], bits)
            return
        if self.cfg.decode_data and self.data_handler_factory is not None:
            h = self.data_handler_factory(self.db, subch_id)
            if h is not None:
                self.data_handlers[subch_id] = h
                h.add_logical_frame(bits)

    # ---------------------------------------------------------------- run

    def run(self, n_blocks: int) -> Metrics:
        for _ in range(n_blocks):
            if not self.step():
                break
        self._drain_audio()              # metrics/pcm settled on return
        return self.metrics

    def close(self) -> None:
        self._drain_audio()
        for pool in self._audio_pools.values():
            pool.shutdown(wait=True)
        self._audio_pools = {}
        if self._iq_dump is not None:
            self._iq_dump.close()
            self._iq_dump = None


def _build_block_fn_for(p, mesh):
    """The per-block device graph: CFO -> demod -> FIC -> PRS timing ->
    scopes -> CIF assembly, one jitted program (sharded over ``mesh``
    frames when given)."""

    def block(rows, coarse_hz):
        rows = unpack_iq(rows)
        # fine CFO is measured on the uncorrected rows: the coarse part
        # is an integer number of carrier spacings, which contributes an
        # exact multiple of 2*pi to the guard-correlation angle and so
        # cancels from the estimate — one fused rotation replaces the
        # two full passes over the block.
        fine = demod.fine_cfo_estimate(rows, p)
        cfo = fine + jnp.broadcast_to(coarse_hz, rows.shape[:1])
        soft, spec0 = demod.demodulate_frames_cfo(rows, cfo, p)
        # only the PRS windows need an explicitly rotated time-domain
        # copy (T_u of ~155k samples per row — the full-stream rotation
        # the fused demod avoids)
        prs_rows = demod.apply_cfo(rows[:, : p.T_u], cfo)
        snr = demod.snr_estimate(spec0, p)
        coarse = demod.coarse_cfo_estimate(spec0, p)
        fibs, fic_ok = decode_fic(soft[:, : p.fic_symbols, :], p)
        # per-frame PRS timing: correlate EVERY frame's PRS window (the
        # batched analog of the per-frame resync, ofdm-processor.cpp:
        # 344-366); t_ok rejects weak peaks so noise never steers timing
        t_off, t_ok = acquisition.prs_sync(prs_rows, p)
        # scopes: mean PRS magnitude spectrum (fftshifted) + the
        # constellation of the first data symbol (ofdm-decoder's IQ
        # scope feed, every 8th frame -> here once per block)
        spectrum = jnp.mean(
            jnp.abs(jnp.roll(spec0, p.T_u // 2, axis=-1)), axis=0)
        # CIF assembly stays in-graph: soft bits never round-trip
        # through the host between demod and the bucket decode (the
        # round-3 VERDICT's receiver-path directive); only the small
        # FIC constellation tap leaves the device.
        cifs = cifs_from_soft(soft, p)
        constel = soft[0, p.fic_symbols, :]   # first data symbol
        # pack every host-bound tap into ONE f32 vector: the tunnel
        # runtime charges 30-120 ms of latency per device->host pull,
        # so ten separate np.asarray calls would dominate the whole
        # receiver step (all values are small integers or f32 — exact)
        packed = jnp.concatenate([
            snr.astype(jnp.float32).ravel(),
            fine.astype(jnp.float32).ravel(),
            coarse.astype(jnp.float32).ravel(),
            t_off.astype(jnp.float32).ravel(),
            t_ok.astype(jnp.float32).ravel(),
            fic_ok.astype(jnp.float32).ravel(),
            fibs.astype(jnp.float32).ravel(),
            spectrum.astype(jnp.float32).ravel(),
            constel.astype(jnp.float32).ravel(),
        ])
        return cifs, packed

    if mesh is not None:
        # product SPMD path: frames over every mesh device; the whole
        # block (PRS timing, fine+coarse CFO, SNR, demod, FIC) is one
        # sharded graph — XLA inserts the cross-device reductions for
        # the replicated statistics (spectrum mean etc.)
        from jax.sharding import NamedSharding, PartitionSpec as P
        axes = tuple(mesh.axis_names)
        rows_sh = NamedSharding(mesh, P(axes, None, None))
        rep = NamedSharding(mesh, P())
        return jax.jit(block, in_shardings=(rows_sh, rep))
    return jax.jit(block)


@functools.lru_cache(maxsize=None)
def _block_fn_cached(mode: int):
    return _build_block_fn_for(get_mode(mode), None)
