"""Audio layer tests: RS, DAB+ superframes, MP2 codec, AAC shim."""

import numpy as np
import pytest

from dabjax.audio import mp4
from dabjax.audio.aac import audio_specific_config
from dabjax.audio.mp2 import Mp2Decoder, Mp2Encoder
from dabjax.fec.rs import rs_decode_batch, rs_decode_np, rs_encode


def test_rs_roundtrip_and_correction():
    rng = np.random.default_rng(0)
    data = rng.integers(0, 256, (4, 110), dtype=np.uint8)
    cw = rs_encode(data)
    out, n = rs_decode_batch(cw)
    np.testing.assert_array_equal(out, data)
    assert (n == 0).all()
    c = cw[0].copy()
    pos = rng.choice(120, 5, replace=False)
    c[pos] ^= rng.integers(1, 256, 5).astype(np.uint8)
    d, k = rs_decode_np(c)
    np.testing.assert_array_equal(d, data[0])
    assert k == 5
    c = cw[1].copy()
    pos = rng.choice(120, 7, replace=False)
    c[pos] ^= rng.integers(1, 256, 7).astype(np.uint8)
    _, k = rs_decode_np(c)
    assert k == -1


@pytest.mark.parametrize("dac_rate,sbr", [(1, 0), (1, 1), (0, 0), (0, 1)])
def test_superframe_roundtrip(dac_rate, sbr):
    rng = np.random.default_rng(dac_rate * 2 + sbr)
    bitrate = 96
    hdr = mp4.DabPlusHeader(dac_rate, sbr, 1, 0, 0)
    n = hdr.num_aus
    payloads = [rng.integers(0, 256, 80 + 10 * i, dtype=np.uint8).tobytes()
                for i in range(n)]
    frames = mp4.build_superframe(bitrate, payloads, dac_rate, sbr)
    assert frames.shape == (5, 3 * bitrate)
    dec = mp4.SuperframeDecoder(bitrate)
    aus = []
    for f in frames:
        aus.extend(dec.add_frame(f))
    assert dec.superframes_ok == 1
    assert len(aus) == n
    for i, (au, want) in enumerate(zip(aus, payloads)):
        assert au.crc_ok
        if i < n - 1:
            assert au.data == want
        else:  # final AU is zero-padded to fill the superframe exactly
            assert au.data[:len(want)] == want
            assert set(au.data[len(want):]) <= {0}


def test_superframe_alignment_self_heals():
    """Start mid-superframe: decoder slides until the firecode matches."""
    rng = np.random.default_rng(7)
    bitrate = 64
    dec = mp4.SuperframeDecoder(bitrate)
    all_aus = []
    for sfi in range(3):
        payloads = [rng.integers(0, 256, 60, dtype=np.uint8).tobytes()
                    for _ in range(3)]
        frames = mp4.build_superframe(bitrate, payloads, dac_rate=1,
                                      sbr_flag=1)
        start = 2 if sfi == 0 else 0   # drop 2 frames of the first superframe
        for f in frames[start:]:
            all_aus.extend(dec.add_frame(f))
    assert dec.superframes_ok == 2
    assert all(a.crc_ok for a in all_aus)


def test_superframe_survives_byte_errors():
    rng = np.random.default_rng(3)
    bitrate = 96
    payloads = [rng.integers(0, 256, 100, dtype=np.uint8).tobytes()
                for _ in range(3)]
    frames = mp4.build_superframe(bitrate, payloads, dac_rate=1, sbr_flag=1)
    flat = frames.reshape(-1).copy()
    # corrupt 3 bytes in distinct RS codewords, away from the header
    rd = bitrate // 8
    for j in (1, 5, 9):
        flat[20 * rd + j] ^= 0x55
    dec = mp4.SuperframeDecoder(bitrate)
    aus = []
    for f in flat.reshape(5, -1):
        aus.extend(dec.add_frame(f))
    assert dec.superframes_ok == 1 and dec.rs_corrected == 3
    for a, want in zip(aus, payloads):
        assert a.crc_ok and a.data[:len(want)] == want


def test_asc_bytes_match_reference_layout():
    # faad-decoder.h:106-110: dacRate=1, sbr=0 -> sr index 3; stereo -> cfg 2
    asc = audio_specific_config(1, 0, 0, 1)
    assert asc[0] == (0b00010 << 3) | (3 >> 1)
    assert asc[1] == ((3 & 1) << 7) | (2 << 3) | 0b100


def test_mp2_closed_loop_snr():
    fs = 48000
    t = np.arange(1152 * 4) / fs
    sig = 0.5 * np.sin(2 * np.pi * 1000 * t) + 0.2 * np.sin(2 * np.pi * 3000 * t)
    enc = Mp2Encoder(bitrate=192, mode=3)
    dec = Mp2Decoder()
    pcm = []
    for i in range(4):
        pcm.extend(dec.add_bytes(enc.encode(sig[i * 1152:(i + 1) * 1152])))
    assert dec.frames_ok == 4 and dec.frames_bad == 0
    out = np.concatenate(pcm)[:, 0] / 32768.0
    # analysis+synthesis filterbank latency is deterministic: 745 samples
    best = max(range(730, 760), key=lambda l: np.dot(
        out[l:], sig[:len(out) - l]) /
        (np.linalg.norm(out[l:]) * np.linalg.norm(sig[:len(out) - l]) + 1e-9))
    a, b = out[best:], sig[:len(out) - best]
    err = a - b
    snr = 10 * np.log10(np.dot(b, b) / (np.dot(err, err) + 1e-12))
    assert snr > 40.0, snr


def test_mp2_stream_resync_with_garbage_prefix():
    fs = 48000
    t = np.arange(1152 * 2) / fs
    sig = 0.3 * np.sin(2 * np.pi * 500 * t)
    enc = Mp2Encoder(bitrate=192, mode=3)
    data = b"\x12\x34\x56" + b"".join(
        enc.encode(sig[i * 1152:(i + 1) * 1152]) for i in range(2))
    dec = Mp2Decoder()
    pcm = dec.add_bytes(data)
    assert dec.frames_ok == 2
    assert all(p.shape == (1152, 2) for p in pcm)


def test_mp2_vectorized_decode_matches_scalar_reference():
    """The staged-extraction batched decoder must be sample-exact vs the
    per-bit scalar reference implementation (mono and stereo)."""
    from dabjax.audio.mp2 import (_SynthesisState, _SynthesisStateRef,
                                  _decode_frame_ref, decode_frame)
    rng = np.random.default_rng(7)
    t = np.arange(1152 * 4) / 48000
    sig = 0.5 * np.sin(2 * np.pi * 880 * t) + 0.1 * rng.standard_normal(
        t.shape)
    for mode, nch in ((3, 1), (0, 2)):
        enc = Mp2Encoder(bitrate=192 if nch == 1 else 256, mode=mode)
        st_new, st_ref = _SynthesisState(), _SynthesisStateRef()
        x = np.stack([sig, np.roll(sig, 11)], -1) if nch == 2 else sig
        for i in range(4):
            fb = np.frombuffer(enc.encode(x[i * 1152:(i + 1) * 1152]),
                               np.uint8)
            p_new, _ = decode_frame(fb, st_new)
            p_ref, _ = _decode_frame_ref(fb, st_ref)
            assert np.array_equal(p_new, p_ref)
