"""AAC-LC core decoder tests.

Three rings of evidence:
1. closed loop — the fixture encoder's 960/1024 streams decode back to the
   input within codec SNR (the record-replay pattern of SURVEY.md §4);
2. conformance — at the 1024 frame length the decoder is cross-checked
   sample-exact (float32 rounding) against libavcodec, both on our
   encoder's output and on libavcodec's own encoder output (which
   exercises codebooks 1..11, short windows, TNS and M/S stereo);
3. the DAB+ surface — ASC parsing and the AacSink decode hook
   (faad-decoder.h:124-165 analog).
"""

import shutil
import struct
import subprocess

import numpy as np
import pytest

from dabjax.audio.aac import AacSink, audio_specific_config
from dabjax.audio.aac_lc import (AacLcDecoder, BitReader, EIGHT_SHORT,
                                 parse_asc)
from dabjax.tx.aac_enc import AacEncoder

FS = 48000


def _tone(seconds=1.0, freq=880.0, amp=0.4):
    t = np.arange(int(FS * seconds)) / FS
    return amp * np.sin(2 * np.pi * freq * t)


def _snr_db(ref, out):
    err = out - ref
    return 10 * np.log10(np.mean(ref ** 2) / np.mean(err ** 2))


# ------------------------------------------------------------- closed loop


@pytest.mark.parametrize("frame_len", [960, 1024])
def test_roundtrip_mono(frame_len):
    tone = _tone()
    enc = AacEncoder(sr_index=3, channels=1, frame_len=frame_len)
    aus = enc.encode(tone)
    dec = AacLcDecoder(sr_index=3, channels=1, frame_len=frame_len)
    pcm = np.concatenate([dec.decode_au(a) for a in aus])[:, 0]
    out, ref = pcm[frame_len:], tone[: pcm.shape[0] - frame_len]
    assert _snr_db(ref, out) > 60.0


def test_roundtrip_stereo_960():
    t = np.arange(FS) / FS
    st = np.stack([0.4 * np.sin(2 * np.pi * 880 * t),
                   0.3 * np.sin(2 * np.pi * 440 * t)], axis=1)
    enc = AacEncoder(sr_index=3, channels=2, frame_len=960)
    aus = enc.encode(st)
    dec = AacLcDecoder(sr_index=3, channels=2, frame_len=960)
    pcm = np.concatenate([dec.decode_au(a) for a in aus])
    out, ref = pcm[960:], st[: pcm.shape[0] - 960]
    assert _snr_db(ref, out) > 60.0


def test_roundtrip_32k_960():
    """DAB+ dac_rate=0 core rate (32 kHz, sr index 5)."""
    t = np.arange(32000) / 32000
    tone = 0.4 * np.sin(2 * np.pi * 880 * t)
    enc = AacEncoder(sr_index=5, channels=1, frame_len=960)
    dec = AacLcDecoder(sr_index=5, channels=1, frame_len=960)
    pcm = np.concatenate([dec.decode_au(a)
                          for a in enc.encode(tone)])[:, 0]
    assert _snr_db(tone[: pcm.shape[0] - 960], pcm[960:]) > 60.0


def test_asc_roundtrip():
    """The 2-byte DAB+ ASC (faad-decoder.h:106-110) selects the 960
    transform and the right core rate."""
    asc = audio_specific_config(dac_rate=1, sbr_flag=0, mpeg_surround=0,
                                aac_channel_mode=1)
    aot, sr_index, channels, frame_len = parse_asc(asc)
    assert (aot, sr_index, channels, frame_len) == (2, 3, 2, 960)
    asc = audio_specific_config(dac_rate=0, sbr_flag=1, mpeg_surround=0,
                                aac_channel_mode=0)
    aot, sr_index, channels, frame_len = parse_asc(asc)
    assert (aot, sr_index, channels, frame_len) == (2, 8, 1, 960)


def test_aac_sink_decodes():
    """AacSink's default hook produces PCM from AUs (the flagship DAB+
    audio path)."""
    tone = _tone(0.5)
    enc = AacEncoder(sr_index=3, channels=1, frame_len=960)
    sink = AacSink()
    sink.configure(dac_rate=1, sbr_flag=0, mpeg_surround=0,
                   aac_channel_mode=0)
    for au in enc.encode(tone):
        sink.add_au(au)
    assert sink.decode_errors == 0
    pcm = np.concatenate(sink.pcm)[:, 0]
    assert _snr_db(tone[: pcm.shape[0] - 960], pcm[960:]) > 60.0
    assert sink.rate == 48000


def test_aac_sink_sbr_passthrough_rate():
    """With sbr_flag the sink upsamples core PCM 2x (documented SBR
    pass-through) so duration at the output rate is preserved."""
    t = np.arange(24000) / 24000
    tone = 0.3 * np.sin(2 * np.pi * 500 * t)
    enc = AacEncoder(sr_index=6, channels=1, frame_len=960)   # 24 kHz core
    sink = AacSink()
    sink.configure(dac_rate=1, sbr_flag=1, mpeg_surround=0,
                   aac_channel_mode=0)
    n_aus = 0
    for au in enc.encode(tone):
        sink.add_au(au)
        n_aus += 1
    assert sink.rate == 48000
    pcm = np.concatenate(sink.pcm)
    assert pcm.shape[0] == n_aus * 960 * 2


# ------------------------------------------------------------ conformance


def _build_oracle(tmp_path_factory):
    exe = tmp_path_factory.mktemp("aac_oracle") / "aac_oracle"
    src = __file__.rsplit("/tests/", 1)[0] + "/tools/aac_oracle.c"
    r = subprocess.run(["gcc", src, "-o", str(exe), "-lavcodec", "-lavutil"],
                       capture_output=True)
    if r.returncode != 0:
        pytest.skip(f"libavcodec oracle unavailable: {r.stderr.decode()}")
    return str(exe)


@pytest.fixture(scope="module")
def oracle(tmp_path_factory):
    if shutil.which("gcc") is None:
        pytest.skip("no C compiler")
    return _build_oracle(tmp_path_factory)


def _records(blob: bytes):
    pos, recs = 0, []
    while pos < len(blob):
        n = struct.unpack_from("<I", blob, pos)[0]
        pos += 4
        recs.append(blob[pos: pos + n])
        pos += n
    return recs


def _run(cmd, data):
    p = subprocess.run(cmd, input=data, capture_output=True)
    assert p.returncode == 0, p.stderr.decode()
    return _records(p.stdout)


def _asc_1024(sr_index, ch):
    b = (0b00010 << 11) | (sr_index << 7) | (ch << 3)
    return bytes([(b >> 8) & 0xFF, b & 0xFF])


def test_our_encoder_vs_libavcodec(oracle):
    """libavcodec decodes our fixture encoder's 1024-frame stream to the
    same PCM as our decoder (validates bitstream syntax + scale)."""
    tone = _tone() + 0.1 * np.sin(2 * np.pi * 3000 * np.arange(FS) / FS)
    enc = AacEncoder(sr_index=3, channels=1, frame_len=1024)
    aus = enc.encode(tone)
    feed = b"".join(struct.pack("<I", len(a)) + a for a in aus)
    ref = np.concatenate([np.frombuffer(r, np.float32) for r in
                          _run([oracle, "decode", _asc_1024(3, 1).hex()],
                               feed)])
    dec = AacLcDecoder(sr_index=3, channels=1, frame_len=1024)
    mine = np.concatenate([dec.decode_au(a) for a in aus])[:, 0]
    n = min(mine.shape[0], ref.shape[0])
    assert n >= 40 * 1024
    assert float(np.max(np.abs(mine[:n] - ref[:n]))) < 1e-5


def _stream_features(aus, dec):
    """Which decoder paths a stream exercises (window seqs, TNS, MS, cbs)."""
    seqs, cbs = set(), set()
    tns = ms = False
    probe = AacLcDecoder(dec.sr_index, dec.channels, dec.frame_len)
    for au in aus:
        br = BitReader(au)
        while True:
            ele = br.read(3)
            if ele == 7:
                break
            if ele == 0:
                br.read(4)
                cd = probe._individual_channel_stream(br)
                seqs.add(cd.ics.window_sequence)
                cbs |= set(np.unique(cd.band_type).tolist())
                tns |= cd.tns is not None
            elif ele == 1:
                br.read(4)
                common = br.read1()
                shared = None
                if common:
                    shared = probe._ics_info(br)
                    mp = br.read(2)
                    if mp == 1:
                        for g in range(shared.num_window_groups):
                            for b in range(shared.max_sfb):
                                br.read1()
                        ms = True
                    elif mp == 2:
                        ms = True
                for _ in range(2):
                    cd = probe._individual_channel_stream(br, shared)
                    seqs.add(cd.ics.window_sequence)
                    cbs |= set(np.unique(cd.band_type).tolist())
                    tns |= cd.tns is not None
            elif ele == 6:
                cnt = br.read(4)
                if cnt == 15:
                    cnt += br.read(8) - 1
                br.read(8 * cnt) if cnt < 4 else [br.read(8)
                                                  for _ in range(cnt)]
            else:
                break
        probe._overlap[:] = 0
    return seqs, cbs, tns, ms


@pytest.mark.parametrize("channels", [1, 2])
def test_libavcodec_encoder_vs_our_decoder(oracle, channels):
    """Our decoder matches libavcodec sample-exactly on libavcodec's own
    encoder output — codebooks 1..11, short windows, TNS, M/S (PNS is
    disabled: its noise is decoder-RNG-specific by design)."""
    rng = np.random.default_rng(7)
    t = np.arange(3 * FS) / FS
    sig = (0.3 * np.sin(2 * np.pi * (200 + 400 * t) * t)
           + 0.05 * rng.standard_normal(t.shape)
           + 0.2 * np.sin(2 * np.pi * 880 * t))
    sig[::9600] += 0.5                     # transients force short windows
    sig = np.clip(sig, -1, 1).astype(np.float32)
    pcm_in = (np.stack([sig, np.roll(sig, 300) * 0.8], axis=1)
              if channels == 2 else sig[:, None]).astype(np.float32)
    recs = _run([oracle, "encode", "48000", str(channels), "128000",
                 "aac_pns", "0"], pcm_in.tobytes())
    asc, aus = recs[0], recs[1:]
    feed = b"".join(struct.pack("<I", len(a)) + a for a in aus)
    ref = np.concatenate(
        [np.frombuffer(r, np.float32).reshape(-1, channels)
         for r in _run([oracle, "decode", asc.hex()], feed)])
    dec = AacLcDecoder.from_asc(asc)
    mine = np.concatenate([dec.decode_au(a) for a in aus])[:, :channels]
    n = min(mine.shape[0], ref.shape[0])
    assert n >= 100 * 1024
    assert float(np.max(np.abs(mine[:n] - ref[:n]))) < 1e-5
    # make sure the stream actually exercised the hard paths
    seqs, cbs, tns, ms = _stream_features(aus, dec)
    assert EIGHT_SHORT in seqs, "no short windows in conformance stream"
    assert len(cbs & set(range(1, 12))) >= 4, f"few codebooks: {cbs}"
    if channels == 2:
        assert ms, "no M/S stereo in conformance stream"
