"""Parametric Stereo (HE-AAC v2) decoder tests.

Mirrors tests/test_sbr.py's rings:
1. self-contained — ps_data writer/parser roundtrip, mono fallback;
2. conformance — the full HE-AACv2 chain (AAC-LC + SBR + PS) versus
   libavcodec's float PS decoder on crafted bitstreams: IID-only,
   IID+ICC (de-correlator engaged), multi-envelope grids, fine IID.

The reference plays ps_flag services through libfaad
(faad-decoder.h:78-165, mp4processor.cpp:185-189); dabjax synthesizes
PS natively (dabjax/audio/ps.py).
"""

import shutil
import struct
import subprocess

import numpy as np
import pytest

from dabjax.audio.aac_lc import AacLcDecoder, BitReader
from dabjax.audio.ps import PsCommon, read_ps_data
from dabjax.audio.sbr import SbrHeader
from dabjax.tx.ps_enc import ps_data_bits
from dabjax.tx.sbr_enc import HeAacEncoder, SbrWriter

CORE_FS = 24000


# --------------------------------------------------------- self-contained


def _parse(bits, n_slots=32, ps=None):
    data = np.packbits(np.array(bits + [0] * ((-len(bits)) % 8),
                                np.uint8)).tobytes()
    ps = ps or PsCommon()
    read_ps_data(BitReader(data), ps, n_slots)
    return ps


def test_ps_data_roundtrip():
    iid = [np.array([2, 4, -3, 0, 1, 7, -7, 5, 3, -1,
                     0, 0, 2, 2, -2, -4, 6, 1, 0, -5])]
    icc = [np.array([0, 1, 2, 3, 4, 5, 6, 7, 6, 5,
                     4, 3, 2, 1, 0, 1, 2, 3, 4, 5])]
    ps = _parse(ps_data_bits(iid=iid, icc=icc))
    assert ps.num_env == 1
    assert ps.border_position[1] == 31
    np.testing.assert_array_equal(ps.iid_par[0, :20], iid[0])
    np.testing.assert_array_equal(ps.icc_par[0, :20], icc[0])


def test_ps_data_roundtrip_multienv_fine():
    rng = np.random.default_rng(3)
    iid = [rng.integers(-12, 13, 34) for _ in range(2)]
    icc = [rng.integers(0, 8, 34) for _ in range(2)]
    ps = _parse(ps_data_bits(iid=iid, icc=icc, iid_mode=5, icc_mode=2))
    assert ps.num_env == 2 and ps.is34 == 1
    for e in range(2):
        np.testing.assert_array_equal(ps.iid_par[e], iid[e])
        np.testing.assert_array_equal(ps.icc_par[e], icc[e])


def test_ps_data_roundtrip_ipdopd():
    iid = [np.zeros(20, int)]
    ipd = [np.array([1, 2, 3, 4, 5, 6, 7, 0, 1, 2, 3])]
    opd = [np.array([7, 6, 5, 4, 3, 2, 1, 0, 7, 6, 5])]
    ps = _parse(ps_data_bits(iid=iid, icc=None, ipd=ipd, opd=opd))
    assert ps.enable_ipdopd
    np.testing.assert_array_equal(ps.ipd_par[0, :11], ipd[0])
    np.testing.assert_array_equal(ps.opd_par[0, :11], opd[0])


# ------------------------------------------------------------ conformance


def _build_oracle(tmp_path_factory):
    exe = tmp_path_factory.mktemp("ps_oracle") / "aac_oracle"
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


def _asc_1024(sr_index, ch):
    b = (0b00010 << 11) | (sr_index << 7) | (ch << 3)
    return bytes([(b >> 8) & 0xFF, b & 0xFF])


def _oracle_pcm(oracle, aus, asc):
    feed = b"".join(struct.pack("<I", len(a)) + a for a in aus)
    p = subprocess.run([oracle, "decode", asc.hex()], input=feed,
                       capture_output=True)
    assert p.returncode == 0, p.stderr.decode()
    pos, recs = 0, []
    while pos < len(p.stdout):
        ln = struct.unpack_from("<I", p.stdout, pos)[0]
        pos += 4
        recs.append(np.frombuffer(p.stdout[pos:pos + ln], np.float32))
        pos += ln
    return np.concatenate([r.reshape(-1, 2) for r in recs]).astype(
        np.float64)


def _decode_mine(aus):
    dec = AacLcDecoder(sr_index=6, channels=1, frame_len=1024)
    outs = [dec.decode_au(a) for a in aus]
    assert outs[-1].shape[1] == 2, "PS did not produce stereo"
    return np.concatenate(outs)


def _compare(mine, oracle_pcm, min_snr):
    lo, hi = 5000, min(mine.shape[0], oracle_pcm.shape[0]) - 100
    a = mine[lo:hi].ravel()
    b = oracle_pcm[lo:hi].ravel()
    g = np.dot(a, b) / np.dot(b, b)
    err = a - g * b
    snr = 10 * np.log10(np.dot(b, b) * g * g / max(np.dot(err, err), 1e-30))
    assert snr > min_snr, f"SNR {snr:.1f} dB (gain {g:.4f})"
    assert abs(g - 1.0) < 1e-3, f"gain {g:.4f}"
    return snr


def _he_aac_ps_aus(ps_frame_bits, x, env_sf=55, noise_q=10):
    """HE-AAC AU list whose SBR payloads carry the given per-frame
    ps_data bits."""
    w = SbrWriter(SbrHeader(), 2 * CORE_FS)
    nb = w.ft.n(0)

    def payload(i):
        return w.sce_payload([np.full(nb, env_sf, int)],
                             [np.full(w.ft.n_q, noise_q, int)],
                             invf=[0] * w.ft.n_q,
                             ps_bits=ps_frame_bits(i))

    return HeAacEncoder(6, 1, 1024, payload).encode(x)


def test_ps_vs_libavcodec_iid_only(oracle):
    """Pure intensity stereo: constant per-band level differences."""
    iid = [np.array([4, 4, 3, 3, 2, 2, 1, 0, -1, -2,
                     -3, -3, -4, -4, -5, -5, -6, -6, -7, -7])]
    icc = [np.zeros(20, int)]            # rho = 1: no de-correlation
    bits = ps_data_bits(iid=iid, icc=icc)
    rng = np.random.default_rng(21)
    x = rng.standard_normal(1024 * 8) * 0.2
    aus = _he_aac_ps_aus(lambda i: bits, x)
    ref = _oracle_pcm(oracle, aus, _asc_1024(6, 1))
    mine = _decode_mine(aus)
    _compare(mine, ref, min_snr=80.0)


def test_ps_vs_libavcodec_icc_decorrelated(oracle):
    """Low coherence engages the all-pass de-correlator chain."""
    iid = [np.zeros(20, int)]
    icc = [np.full(20, 5, int)]          # rho = 0.37
    bits = ps_data_bits(iid=iid, icc=icc)
    rng = np.random.default_rng(22)
    x = rng.standard_normal(1024 * 8) * 0.2
    aus = _he_aac_ps_aus(lambda i: bits, x)
    ref = _oracle_pcm(oracle, aus, _asc_1024(6, 1))
    mine = _decode_mine(aus)
    snr = _compare(mine, ref, min_snr=80.0)
    # genuinely decorrelated output: L and R must differ
    lo = 6000
    l, r = mine[lo:lo + 20000, 0], mine[lo:lo + 20000, 1]
    rho = np.dot(l, r) / np.sqrt(np.dot(l, l) * np.dot(r, r))
    assert rho < 0.9, f"output not decorrelated (rho={rho:.3f})"


def test_ps_vs_libavcodec_ipdopd(oracle):
    """Phase parameters: IPD/OPD rotation with the two-frame smoother."""
    iid = [np.array([2, 2, 1, 1, 0, 0, -1, -1, -2, -2,
                     0, 0, 0, 0, 0, 0, 0, 0, 0, 0])]
    icc = [np.full(20, 2, int)]
    ipd = [np.array([0, 1, 2, 3, 4, 3, 2, 1, 0, 1, 2])]
    opd = [np.array([4, 4, 3, 3, 2, 2, 1, 1, 0, 0, 1])]
    bits = ps_data_bits(iid=iid, icc=icc, ipd=ipd, opd=opd)
    rng = np.random.default_rng(24)
    x = rng.standard_normal(1024 * 8) * 0.2
    aus = _he_aac_ps_aus(lambda i: bits, x)
    ref = _oracle_pcm(oracle, aus, _asc_1024(6, 1))
    mine = _decode_mine(aus)
    _compare(mine, ref, min_snr=80.0)


def test_ps_vs_libavcodec_34band(oracle):
    """34-band parameter grid (iid_mode 2)."""
    rng0 = np.random.default_rng(25)
    iid = [np.clip(np.cumsum(rng0.integers(-2, 3, 34)), -7, 7)]
    icc = [np.clip(np.cumsum(rng0.integers(-1, 2, 34)), 0, 7)]
    bits = ps_data_bits(iid=iid, icc=icc, iid_mode=2, icc_mode=2)
    x = rng0.standard_normal(1024 * 8) * 0.2
    aus = _he_aac_ps_aus(lambda i: bits, x)
    ref = _oracle_pcm(oracle, aus, _asc_1024(6, 1))
    mine = _decode_mine(aus)
    _compare(mine, ref, min_snr=80.0)


def test_dabplus_960_ps_stereo():
    """The DAB+ surface: a ps_flag-style 960-frame HE-AACv2 stream
    through AacSink yields genuinely decorrelated stereo (the round-3
    VERDICT's acceptance criterion — no mono duplication)."""
    from dabjax.audio.aac import AacSink
    iid = [np.array([5, 5, 4, 4, 3, 3, 3, 3, 2, 2,
                     2, 2, 3, 3, 4, 4, 5, 5, 6, 6])]
    icc = [np.full(20, 4, int)]
    bits_ps = ps_data_bits(iid=iid, icc=icc)
    w = SbrWriter(SbrHeader(), 2 * CORE_FS)
    nb = w.ft.n(0)
    payload = w.sce_payload([np.full(nb, 55, int)],
                            [np.full(w.ft.n_q, 10, int)],
                            invf=[0] * w.ft.n_q, ps_bits=bits_ps)
    rng = np.random.default_rng(26)
    x = rng.standard_normal(960 * 12) * 0.2
    enc = HeAacEncoder(6, 1, 960, lambda i: payload)
    sink = AacSink()
    sink.configure(dac_rate=1, sbr_flag=1, mpeg_surround=0,
                   aac_channel_mode=0)
    for au in enc.encode(x):
        sink.add_au(au)
    assert sink.decode_errors == 0
    pcm = np.concatenate(sink.pcm)
    assert pcm.shape == (12 * 1920, 2)
    l, r = pcm[6000:, 0], pcm[6000:, 1]
    assert np.dot(l, l) > 0 and np.dot(r, r) > 0
    rho = np.dot(l, r) / np.sqrt(np.dot(l, l) * np.dot(r, r))
    assert rho < 0.9, f"mono-duplicated output (rho={rho:.3f})"
    # IID tilt: L louder than R (positive low-band iid)
    assert np.dot(l, l) > 1.2 * np.dot(r, r)


def test_ps_vs_libavcodec_dynamic(oracle):
    """Multi-envelope frames with varying IID/ICC and fine quant."""
    rng = np.random.default_rng(23)

    def bits(i):
        r = np.random.default_rng(100 + i)
        iid = [np.clip(np.cumsum(r.integers(-2, 3, 20)), -12, 12)
               for _ in range(2)]
        icc = [np.clip(np.cumsum(r.integers(-1, 2, 20)), 0, 7)
               for _ in range(2)]
        return ps_data_bits(iid=iid, icc=icc, iid_mode=4, icc_mode=1)

    x = rng.standard_normal(1024 * 8) * 0.2
    aus = _he_aac_ps_aus(bits, x)
    ref = _oracle_pcm(oracle, aus, _asc_1024(6, 1))
    mine = _decode_mine(aus)
    _compare(mine, ref, min_snr=80.0)


def test_malformed_ps_data_disables_ps_keeps_sbr():
    """Garbage in the PS extension must turn PS off until the next
    header WITHOUT touching SBR state (the decoder separates the two
    failure domains, unlike a shared parse error path)."""
    import numpy as np
    from dabjax.audio.sbr import SbrDecoder, SbrHeader
    from dabjax.tx.sbr_enc import SbrWriter

    w = SbrWriter(SbrHeader(), 2 * CORE_FS)
    nb = w.ft.n(0)
    good_ps = ps_data_bits(iid=[np.zeros(20, int)],
                           icc=[np.zeros(20, int)])
    # iid deltas out of range -> decoder must reject
    bad_ps = ps_data_bits(iid=[np.full(20, 14, int)],
                          icc=[np.zeros(20, int)])

    def payload(ps_bits):
        bits = w.sce_payload([np.full(nb, 50, int)],
                             [np.full(w.ft.n_q, 10, int)],
                             invf=[0] * w.ft.n_q, ps_bits=ps_bits)
        return np.packbits(np.array(bits + [0] * ((-len(bits)) % 8),
                                    np.uint8)).tobytes()

    dec = SbrDecoder(CORE_FS, 1024, 1)
    rng = np.random.default_rng(5)
    x = (rng.standard_normal((1024, 1)) * 0.1)

    dec.parse_extension(payload(good_ps), crc=False)
    assert dec.ps_common.start
    out = dec.apply(x)
    assert out.shape[1] == 2                   # PS active -> stereo

    dec.parse_extension(payload(bad_ps), crc=False)
    assert not dec.ps_common.start             # PS off after bad data
    assert dec.parse_errors == 0               # SBR itself unaffected
    assert dec.ch_data[0] is not None
    out = dec.apply(x)
    assert out.shape[1] == 1                   # mono until next header

    dec.parse_extension(payload(good_ps), crc=False)
    assert dec.ps_common.start                 # recovers with a header
    assert dec.apply(x).shape[1] == 2
