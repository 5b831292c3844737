"""Full-system test: modulated ensemble with real audio payloads through the
complete Receiver runtime (BASELINE.json configs 2+3 semantics).

* a DAB+ service carrying proper superframes (firecode + RS + AU CRC):
  recovered AUs must match the injected AU payloads byte-exactly
* a classic DAB service carrying MPEG Layer II frames of a known sine:
  the MP2 decoder must sync and decode PCM
"""

import numpy as np
import pytest

from dabjax.audio import mp4
from dabjax.audio.mp2 import Mp2Encoder
from dabjax.io.sources import SyntheticSource
from dabjax.runtime.config import ReceiverConfig
from dabjax.runtime.receiver import Receiver
from dabjax.tx.fig import ServiceSpec
from dabjax.tx.modulator import Modulator

BITRATE_PLUS = 88
BITRATE_MP2 = 96


def _dabplus_payloads():
    """Deterministic superframe stream keyed by superframe index."""
    cache = {}

    def au_bytes(sf_index: int, k: int) -> bytes:
        rng = np.random.default_rng(1000 + 17 * sf_index + k)
        return rng.integers(0, 256, 120, dtype=np.uint8).tobytes()

    def payload(cif_index: int) -> np.ndarray:
        sf, part = divmod(cif_index % (1 << 20), 5)
        if sf not in cache:
            aus = [au_bytes(sf, k) for k in range(3)]
            cache[sf] = mp4.build_superframe(
                BITRATE_PLUS, aus, dac_rate=1, sbr_flag=1)
        return np.unpackbits(cache[sf][part])

    return payload, au_bytes


def _mp2_payloads(n: int):
    enc = Mp2Encoder(bitrate=BITRATE_MP2, mode=3)
    fs = 48000
    t = np.arange(1152 * n) / fs
    sig = 0.4 * np.sin(2 * np.pi * 880 * t)
    frames = [np.unpackbits(np.frombuffer(
        enc.encode(sig[i * 1152:(i + 1) * 1152]), np.uint8))
        for i in range(n)]

    def payload(cif_index: int) -> np.ndarray:
        return frames[cif_index % n]

    return payload


@pytest.fixture(scope="module")
def rx():
    services = [
        ServiceSpec(label="PLUSRADIO", sid=0x6001, subch_id=4, start_addr=0,
                    bitrate=BITRATE_PLUS, protection="EEP-A", prot_level=3,
                    kind="DAB+"),
        ServiceSpec(label="CLASSIC", sid=0x6002, subch_id=8, start_addr=120,
                    bitrate=BITRATE_MP2, protection="EEP-A", prot_level=3,
                    kind="DAB"),
    ]
    plus_payload, au_bytes = _dabplus_payloads()
    mp2_payload = _mp2_payloads(40)
    mod = Modulator(mode=1, services=services,
                    payloads={4: plus_payload, 8: mp2_payload})
    src = SyntheticSource(mod, snr_db=30.0, lead_in=4321)
    r = Receiver(src, ReceiverConfig(frames_per_block=4))
    # 3 blocks x 4 frames x 4 CIFs = 48 CIFs -> 33 routed logical frames
    r.run(3)
    return r, au_bytes


def test_sync_and_fic(rx):
    r, _ = rx
    assert r.metrics.synced
    assert r.metrics.fic_ratio == 1.0
    assert {"PLUSRADIO", "CLASSIC"} <= set(r.db.service_labels())


def test_dabplus_aus_recovered(rx):
    r, au_bytes = rx
    svc = r.audio.get(4)
    assert svc is not None and svc.is_dab_plus
    assert svc.superframe.superframes_ok >= 3
    assert r.metrics.au_bad == 0 and r.metrics.au_ok >= 9
    # AU payloads are 120 bytes; received AUs may carry zero padding on the
    # superframe-final AU — compare prefixes against the generator.
    aus = svc.aac.aus
    assert len(aus) >= 9
    matched = 0
    for au in aus:
        for sf in range(20):
            for k in range(3):
                if au[:120] == au_bytes(sf, k):
                    matched += 1
    assert matched == len(aus)


def test_mp2_stream_decodes(rx):
    r, _ = rx
    svc = r.audio.get(8)
    assert svc is not None and not svc.is_dab_plus
    assert svc.mp2.frames_ok >= 10 and svc.mp2.frames_bad == 0
    pcm = np.concatenate(svc.pcm)
    assert pcm.shape[1] == 2
    # 880 Hz tone must dominate the spectrum
    x = pcm[2000:2000 + 8192, 0].astype(np.float64)
    spec = np.abs(np.fft.rfft(x * np.hanning(x.shape[0])))
    peak = np.argmax(spec)
    freq = peak * 48000 / 8192
    assert abs(freq - 880) < 30, freq


def test_metrics_dashboard(rx):
    r, _ = rx
    s = r.metrics.dashboard()
    assert "sync=Y" in s and "fic=100.0%" in s


def test_dabplus_audio_to_pcm():
    """The flagship DAB+ chain end to end: an 880 Hz tone AAC-encoded into
    real 960-transform AUs, packed into superframes, modulated, impaired,
    and decoded by the Receiver all the way to PCM (the faadDecoder
    MP42PCM path, faad-decoder.h:124-165 — here via the own AAC-LC core)."""
    from dabjax.tx.aac_enc import AacEncoder

    bitrate = 88
    n_superframes = 14
    fs = 48000
    t = np.arange(n_superframes * 6 * 960) / fs
    tone = 0.4 * np.sin(2 * np.pi * 880 * t)
    enc = AacEncoder(sr_index=3, channels=1, frame_len=960, max_q=500)
    aus = enc.encode(tone)
    frames = np.concatenate([
        mp4.build_superframe(bitrate, aus[6 * i: 6 * i + 6], dac_rate=1,
                             sbr_flag=0, aac_channel_mode=0)
        for i in range(n_superframes)])          # [5*n, 3*bitrate]

    def payload(cif_index: int) -> np.ndarray:
        return np.unpackbits(frames[cif_index % frames.shape[0]])

    services = [ServiceSpec(label="PLUSTONE", sid=0x6201, subch_id=5,
                            start_addr=0, bitrate=bitrate,
                            protection="EEP-A", prot_level=3, kind="DAB+")]
    mod = Modulator(mode=1, services=services, payloads={5: payload})
    r = Receiver(SyntheticSource(mod, snr_db=30.0, lead_in=987),
                 ReceiverConfig(frames_per_block=4))
    r.run(3)
    svc = r.audio.get(5)
    assert svc is not None and svc.is_dab_plus
    assert svc.superframe.superframes_ok >= 4
    assert svc.aac.decode_errors == 0
    pcm = np.concatenate(svc.pcm)
    assert pcm.shape[0] >= 20000
    # 880 Hz must dominate (same oracle as the MP2 twin test)
    x = pcm[2000:2000 + 8192, 0].astype(np.float64)
    spec = np.abs(np.fft.rfft(x * np.hanning(x.shape[0])))
    freq = np.argmax(spec) * 48000 / 8192
    assert abs(freq - 880) < 30, freq
    # and the tone must be clean: total non-peak energy bounded
    peak_band = spec[int(880 / 48000 * 8192) - 8: int(880 / 48000 * 8192) + 8]
    assert np.sum(peak_band ** 2) / np.sum(spec ** 2) > 0.95


def test_mp2_es_dump_tap(tmp_path):
    """The MP2 elementary-stream tap records a re-decodable .mp2 stream
    (mp2processor.cpp:581-583 dump analog)."""
    from dabjax.audio.mp2 import Mp2Decoder
    from dabjax.io.sources import SyntheticSource
    from dabjax.runtime.config import ReceiverConfig
    from dabjax.runtime.receiver import Receiver
    from dabjax.tx.fig import ServiceSpec
    from dabjax.tx.modulator import Modulator

    es_path = str(tmp_path / "tap.mp2")
    services = [ServiceSpec(label="TAP", sid=0x6101, subch_id=8,
                            start_addr=0, bitrate=BITRATE_MP2,
                            protection="EEP-A", prot_level=3, kind="DAB")]
    mod = Modulator(mode=1, services=services,
                    payloads={8: _mp2_payloads(40)})
    rx = Receiver(SyntheticSource(mod, snr_db=30.0),
                  ReceiverConfig(frames_per_block=4, dump_es_path=es_path))
    rx.run(3)
    # the tap is suffixed per subchannel so concurrent services never
    # truncate each other's stream (ADVICE round 1)
    data = open(str(tmp_path / "tap.8.mp2"), "rb").read()
    assert len(data) > 1000
    # the recorded stream decodes standalone
    dec = Mp2Decoder()
    pcm = dec.add_bytes(data)
    assert dec.frames_ok > 5 and len(pcm) > 5


def test_heaac_sbr_service_to_pcm():
    """HE-AAC (sbr_flag=1) service end to end: core 24 kHz AUs with SBR
    FIL payloads, superframed, modulated, impaired, Receiver-decoded —
    the PCM must contain reconstructed energy ABOVE the core band (the
    last decode-capability gap of round 2; the reference gets this from
    libfaad, faad-decoder.h:78-165, dabjax from its own SBR tool)."""
    from dabjax.audio.sbr import SbrHeader
    from dabjax.tx.sbr_enc import HeAacEncoder, SbrWriter

    bitrate = 88
    n_superframes = 14
    core_fs = 24000
    w = SbrWriter(SbrHeader(), 2 * core_fs)
    nb = w.ft.n_low
    bits = w.sce_payload([np.full(nb, 52, int)],
                         [np.full(w.ft.n_q, 10, int)],
                         freq_res=0, invf=[2] * w.ft.n_q)
    t = np.arange(n_superframes * 3 * 960) / core_fs
    tone = 0.35 * np.sin(2 * np.pi * 2000 * t) \
        + 0.1 * np.sin(2 * np.pi * 3400 * t)
    enc = HeAacEncoder(6, 1, 960, lambda i: bits, max_q=400)
    aus = enc.encode(tone)
    frames = np.concatenate([
        mp4.build_superframe(bitrate, aus[3 * i: 3 * i + 3], dac_rate=1,
                             sbr_flag=1, aac_channel_mode=0)
        for i in range(n_superframes)])

    def payload(cif_index: int) -> np.ndarray:
        return np.unpackbits(frames[cif_index % frames.shape[0]])

    services = [ServiceSpec(label="SBRTONE", sid=0x6301, subch_id=5,
                            start_addr=0, bitrate=bitrate,
                            protection="EEP-A", prot_level=3, kind="DAB+")]
    mod = Modulator(mode=1, services=services, payloads={5: payload})
    r = Receiver(SyntheticSource(mod, snr_db=30.0, lead_in=987),
                 ReceiverConfig(frames_per_block=4))
    r.run(3)
    svc = r.audio.get(5)
    assert svc is not None and svc.is_dab_plus
    assert svc.superframe.superframes_ok >= 4
    assert svc.aac.decode_errors == 0
    assert svc.aac.rate == 48000
    pcm = np.concatenate(svc.pcm)
    assert pcm.shape[0] >= 20000
    x = pcm[4000:4000 + 16384, 0].astype(np.float64)
    spec = np.abs(np.fft.rfft(x * np.hanning(x.shape[0]))) ** 2

    def peak(f0, f1):
        i0 = int(f0 * x.shape[0] / 48000)
        i1 = int(f1 * x.shape[0] / 48000)
        return float(np.max(spec[i0:i1]))

    core = peak(1900, 2100)                      # the injected tone
    # the SBR patch copies source bands up by 8 QMF bands (+3 kHz):
    # the 2 kHz / 3.4 kHz tones must reappear at 5 kHz / 6.4 kHz
    hf1 = peak(4900, 5100)
    hf2 = peak(6300, 6500)
    floor = peak(9000, 11000)                    # above kx+M: silent
    assert core > 1e6 * floor, (core, floor)
    assert hf1 > 1e5 * floor, f"no 5 kHz SBR line: {hf1:.3g} vs {floor:.3g}"
    assert hf2 > 1e5 * floor, f"no 6.4 kHz SBR line: {hf2:.3g}"
    assert hf1 > 1e-3 * core and hf2 > 1e-3 * core


def test_audio_worker_process_pool():
    """cfg.audio_workers > 0 moves the audio plane into spawned worker
    processes (the config-5 GIL escape); CRC-gated counters come back
    through drain and land in Metrics."""
    services = [
        ServiceSpec(label="POOLSVC", sid=0x6101, subch_id=2, start_addr=0,
                    bitrate=BITRATE_MP2, protection="EEP-A", prot_level=3,
                    kind="DAB"),
    ]
    mod = Modulator(mode=1, services=services,
                    payloads={2: _mp2_payloads(20)})
    src = SyntheticSource(mod, snr_db=30.0, lead_in=777)
    cfg = ReceiverConfig(frames_per_block=4, decode_audio=True,
                         decode_data=False, audio_workers=2)
    r = Receiver(src, cfg)
    m = r.run(4)
    r.close()
    assert m.fic_crc_ok > 0
    assert m.mp2_frames_ok > 0
    assert m.audio_decode_seconds > 0.0
