"""CLI surface tests: info / decode / scan over a recorded .raw ensemble
(the GUI-replacement control plane)."""

import os

import numpy as np
import pytest

from dabjax.audio.mp2 import Mp2Encoder
from dabjax.cli import main
from dabjax.io.audio_out import WavSink, low_pass_fir, resample_to_48k
from dabjax.runtime.channels import BAND_III, L_BAND, frequency_khz
from dabjax.tx.fig import ServiceSpec
from dabjax.tx.modulator import Modulator

BITRATE = 96


def _mp2_payload(n=40):
    enc = Mp2Encoder(bitrate=BITRATE, mode=3)
    t = np.arange(1152 * n) / 48000
    sig = 0.4 * np.sin(2 * np.pi * 660 * t)
    frames = [np.unpackbits(np.frombuffer(
        enc.encode(sig[i * 1152:(i + 1) * 1152]), np.uint8))
        for i in range(n)]
    return lambda ci: frames[ci % n]


@pytest.fixture(scope="module")
def raw_file(tmp_path_factory):
    d = tmp_path_factory.mktemp("iq")
    services = [ServiceSpec(label="CLITEST", sid=0x3001, subch_id=3,
                            start_addr=0, bitrate=BITRATE,
                            protection="EEP-A", prot_level=3, kind="DAB")]
    mod = Modulator(mode=1, services=services,
                    payloads={3: _mp2_payload()}, amplitude=0.3)
    iq = mod.iq(10, snr_db=40.0)
    u8 = np.empty(2 * iq.shape[0], np.uint8)
    u8[0::2] = np.clip(np.real(iq) * 128 + 128, 0, 255).astype(np.uint8)
    u8[1::2] = np.clip(np.imag(iq) * 128 + 128, 0, 255).astype(np.uint8)
    path = d / "ensemble.raw"
    path.write_bytes(u8.tobytes())
    return str(path)


def test_cli_info(raw_file, capsys):
    rc = main(["info", raw_file, "--blocks", "2"])
    out = capsys.readouterr().out
    assert rc == 0
    assert "DABJAX ENSEMBLE" in out
    assert "CLITEST" in out and "96kbps" in out


def test_cli_decode_to_wav(raw_file, capsys, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    out_wav = str(tmp_path / "out.wav")
    rc = main(["decode", raw_file, "--service", "CLITEST",
               "--out", out_wav, "--blocks", "2", "--json"])
    out = capsys.readouterr().out
    assert rc == 0
    assert os.path.exists(out_wav)
    assert "wrote" in out and "PCM frames" in out
    import wave
    with wave.open(out_wav) as w:
        assert w.getframerate() == 48000
        assert w.getnchannels() == 2
        assert w.getnframes() > 10000


def test_cli_scan(raw_file, capsys):
    rc = main(["scan", f"12C={raw_file}", "5A=null", "--blocks", "2"])
    out = capsys.readouterr().out
    assert rc == 0
    assert "12C" in out and "DABJAX ENSEMBLE" in out
    assert "5A: no signal" in out


def test_cli_scan_device_hop(raw_file, capsys, monkeypatch):
    """Live-tuner scan: a device spec hops channels via set_frequency
    with the no-signal loop (gui.cpp:561-638) — a fake tunable device
    records the tune sequence; 12C carries the recorded ensemble."""
    import dabjax.cli as cli
    from dabjax.io.sources import RawFileSource, TunedSourceBank

    tuned = []

    class FakeDevice(TunedSourceBank):
        def set_frequency(self, hz):
            tuned.append(int(hz))
            super().set_frequency(hz)

    dev = FakeDevice({"12C": RawFileSource(raw_file, loop=False)})
    monkeypatch.setattr(cli, "open_source",
                        lambda spec, frequency_hz=0: dev)
    rc = main(["scan", "rtlsdr:12C,5A", "--blocks", "2"])
    out = capsys.readouterr().out
    assert rc == 0
    assert tuned == [227_360_000, 174_928_000]
    assert "DABJAX ENSEMBLE" in out
    assert "5A: no signal" in out


def test_band_scan_full_sweep_channels():
    """scan DEVICE:all sweeps every Band III + L-band channel once."""
    from dabjax.io.sources import TunedSourceBank
    from dabjax.runtime.channels import channel_list
    from dabjax.runtime.config import ReceiverConfig
    from dabjax.runtime.scan import band_scan

    bank = TunedSourceBank({})
    seen = []

    class Spy(TunedSourceBank):
        pass

    spy = Spy({})
    orig = spy.set_frequency
    spy.set_frequency = lambda hz: (seen.append(hz), orig(hz))
    chans = channel_list("III") + channel_list("L")
    res = band_scan(spy, chans, config=ReceiverConfig(
        mode=1, scan_attempts=1), blocks=1)
    del bank
    assert len(res) == 38 + 16
    assert len(seen) == 54 and not any(r.synced for r in res)


def test_channel_tables():
    assert frequency_khz("5A") == 174928
    assert frequency_khz("13F") == 239200
    assert frequency_khz("LA") == 1452960
    assert frequency_khz("LP") == 1478640
    assert len(BAND_III) == 38 and len(L_BAND) == 16


def test_fir_and_resampler():
    taps = low_pass_fir(65, 8000, 48000)
    assert abs(taps.sum() - 1.0) < 1e-5
    # 24 kHz tone content preserved through 24k->48k resample
    t = np.arange(2400) / 24000
    x = np.sin(2 * np.pi * 1000 * t)[:, None]
    y = resample_to_48k(np.repeat(x, 2, axis=1), 24000)
    assert y.shape == (4800, 2)
    spec = np.abs(np.fft.rfft(y[:, 0] * np.hanning(4800)))
    assert abs(np.argmax(spec) * 48000 / 4800 - 1000) < 30


def test_wav_sink_mono_and_rates(tmp_path):
    p = str(tmp_path / "t.wav")
    with WavSink(p) as w:
        w.write(np.zeros(2400, np.float32), rate=24000)   # mono 24k
        w.write(np.zeros((480, 2), np.int16))             # stereo 48k int16
    import wave
    with wave.open(p) as f:
        assert f.getnframes() == 4800 + 480


def test_native_io_source(raw_file):
    from dabjax.io.native import (FORMAT_U8, NativeFileSource,
                                  native_available)
    from dabjax.io.sources import RawFileSource
    if not native_available():
        pytest.skip("no native toolchain")
    nat = NativeFileSource(raw_file, FORMAT_U8)
    ref = RawFileSource(raw_file, loop=False)
    a = nat.read(300000)
    b = ref.read(300000)
    np.testing.assert_array_equal(a, b)
    nat.close()


def test_iq_dump_record_replay(raw_file, tmp_path):
    """Closed loop: record -> replay -> compare (SURVEY.md §4)."""
    from dabjax.io.sources import WavFileSource
    from dabjax.runtime.config import ReceiverConfig
    from dabjax.runtime.receiver import Receiver
    from dabjax.cli import open_source

    dump = str(tmp_path / "tap.sdr")
    r1 = Receiver(open_source(raw_file),
                  ReceiverConfig(dump_iq_path=dump, frames_per_block=2))
    r1.run(3)
    r1.close()
    assert r1.metrics.fic_ratio == 1.0

    r2 = Receiver(WavFileSource(dump, loop=False), ReceiverConfig())
    r2.run(2)
    assert r2.metrics.synced
    assert r2.metrics.fic_ratio == 1.0
    assert "CLITEST" in r2.db.service_labels()


def test_config_roundtrip(raw_file, tmp_path, capsys):
    cfg_path = str(tmp_path / "cfg.json")
    rc = main(["--save-config", cfg_path, "info", raw_file,
               "--blocks", "2"])
    assert rc == 0
    from dabjax.runtime.config import ReceiverConfig
    cfg = ReceiverConfig.load(cfg_path)
    assert cfg.mode == 1 and cfg.frames_per_block == 4
    rc = main(["-i", cfg_path, "info", raw_file, "--blocks", "2"])
    assert rc == 0


def test_cli_device_source_unavailable():
    """Live-device specs resolve to the device layer and exit cleanly when
    no hardware is attached (null-device fallback semantics)."""
    import pytest
    from dabjax.cli import open_source
    with pytest.raises(SystemExit, match="unavailable"):
        open_source("rtlsdr:12C")


def test_cli_decode_pcm_to_stdout(raw_file, capsysbinary):
    """--out - streams raw 48 kHz stereo int16 PCM (live playback pipe)."""
    rc = main(["decode", raw_file, "--service", "CLITEST",
               "--out", "-", "--blocks", "2"])
    captured = capsysbinary.readouterr()
    assert rc == 0
    assert len(captured.out) > 40000          # PCM bytes present
    assert len(captured.out) % 4 == 0         # whole stereo int16 frames


def test_info_scope_rendering(raw_file, capsys):
    """--scope renders the spectrum + constellation taps as text (the
    scopes-qwt6/scope.cpp + iqdisplay.cpp surface, headless)."""
    from dabjax.cli import main
    rc = main(["info", raw_file, "--blocks", "2", "--scope"])
    out = capsys.readouterr().out
    assert rc == 0
    assert "spectrum" in out and "constellation" in out
    assert "█" in out or "▇" in out or "▁" in out   # spectrum bars
    assert any(c in out for c in ".:*#@")           # scatter points


def test_scope_renderers_standalone():
    import numpy as np
    from dabjax.runtime.scopes import (render_constellation,
                                       render_spectrum)
    spec = np.abs(np.fft.fftshift(np.fft.fft(np.random.default_rng(0)
                                             .standard_normal(2048))))
    s = render_spectrum(spec)
    assert len(s.splitlines()) == 10
    pts = np.exp(1j * (np.pi / 4 + np.pi / 2
                       * np.random.default_rng(1).integers(0, 4, 400)))
    pts = pts + 0.05 * (np.random.default_rng(2).standard_normal(400)
                        + 1j * np.random.default_rng(3)
                        .standard_normal(400))
    c = render_constellation(pts)
    assert "@" in c or "#" in c
    assert "re" in c and "im" in c


def test_waterfall_renderer_and_watch(raw_file, capsys):
    """--watch --scope renders the scrolling waterfall history panel
    (scope.cpp:384 waterfall analog)."""
    from dabjax.runtime.scopes import render_waterfall
    # standalone: 3 rows of history -> 3 shaded lines, same width
    spec = np.abs(np.fft.fft(np.random.default_rng(0)
                             .standard_normal(256))) + 1.0
    txt = render_waterfall([spec, spec * 2, spec * 0.5], width=40)
    lines = txt.splitlines()
    assert len(lines) == 3 and all(len(l) == 40 for l in lines)
    assert render_waterfall([]) == "(no waterfall history)"
    rc = main(["info", raw_file, "--watch", "2", "--scope"])
    out = capsys.readouterr().out
    assert rc == 0
    assert "waterfall (oldest on top):" in out


def test_cli_decode_play_via_player_cmd(raw_file, capsys, tmp_path,
                                        monkeypatch):
    """--play spawns the player command and streams S16LE PCM into it
    (the PortAudio live-sink analog, audiosink.cpp:129-220)."""
    monkeypatch.chdir(tmp_path)
    sink = tmp_path / "played.pcm"
    rc = main(["decode", raw_file, "--service", "CLITEST", "--play",
               "--player", f"dd of={sink} status=none", "--blocks", "2"])
    out = capsys.readouterr().out
    assert rc == 0 and "played" in out
    data = np.frombuffer(sink.read_bytes(), "<i2")
    assert data.size > 20000  # a meaningful run of 48 kHz stereo audio
    assert np.abs(data).max() > 500
