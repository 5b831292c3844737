"""End-to-end FIC test: modulator -> acquisition -> demod -> service DB.

This is BASELINE.json config 1 ("Mode I ensemble, FIC-only decode") run on
synthesized golden IQ (SURVEY.md §4 closed-loop strategy).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from dabjax.constants import get_mode
from dabjax.fic.fib import EnsembleDB
from dabjax.fic.fic_decoder import decode_fic
from dabjax.ofdm import acquisition, demod
from dabjax.tx.fig import ServiceSpec
from dabjax.tx.modulator import Modulator

SERVICES = [
    ServiceSpec(label="JAZZ", sid=0x4001, subch_id=1, start_addr=0,
                bitrate=128, protection="EEP-A", prot_level=3, kind="DAB+"),
    ServiceSpec(label="NEWS TALK", sid=0x4002, subch_id=2, start_addr=96,
                bitrate=96, protection="UEP", prot_level=3, kind="DAB"),
]


@pytest.fixture(scope="module")
def mode1():
    return get_mode(1)


@pytest.fixture(scope="module")
def iq(mode1):
    mod = Modulator(mode=1, services=SERVICES)
    return mod.iq(3, snr_db=30.0, sample_offset=1000, seed=42)


def test_acquire_finds_prs(iq, mode1):
    p = mode1
    u0 = acquisition.acquire(iq, p)
    assert u0 is not None
    # true PRS useful start: offset + T_null + T_g
    expected = 1000 + p.T_null + p.T_g
    assert u0 % p.T_F == expected % p.T_F or abs(u0 - expected) <= 1


def test_fic_decode_and_ensemble_db(iq, mode1):
    p = mode1
    u0 = acquisition.acquire(iq, p)
    need = demod.min_frame_samples(p)
    n_frames = (iq.shape[0] - u0 - p.T_u) // p.T_F
    assert n_frames >= 2
    rows = np.stack([iq[u0 + f * p.T_F: u0 + f * p.T_F + need]
                     for f in range(n_frames)])
    soft, spec0 = demod.demodulate_frames(jnp.asarray(rows), p)
    fic_soft = soft[:, :p.fic_symbols, :]
    fibs, ok = decode_fic(fic_soft, p)
    ok = np.asarray(ok)
    assert ok.all(), f"FIC CRC failures: {ok}"

    db = EnsembleDB()
    for f in range(n_frames):
        for i in range(fibs.shape[1]):
            if ok[f, i]:
                db.process_fib_bits(np.asarray(fibs[f, i]))
    assert db.ensemble_label.strip() == "DABJAX ENSEMBLE"
    assert db.ensemble_id == 0x8001
    labels = set(db.service_labels())
    assert {"JAZZ", "NEWS TALK"} <= labels

    jazz = db.data_for_audio_service("JAZZ")
    assert jazz is not None
    assert jazz.bitrate == 128 and jazz.prot_level == 3
    assert jazz.eep_profile == "A" and jazz.uep_flag == 1
    assert jazz.is_dab_plus
    assert jazz.start_addr == 0 and jazz.length == SERVICES[0].length_cus

    news = db.data_for_audio_service("NEWS TALK")
    assert news is not None
    assert news.bitrate == 96 and news.uep_flag == 0 and news.prot_level == 3
    assert news.start_addr == 96 and not news.is_dab_plus


def test_snr_estimate_reasonable(iq, mode1):
    p = mode1
    u0 = acquisition.acquire(iq, p)
    need = demod.min_frame_samples(p)
    rows = np.stack([iq[u0: u0 + need]])
    _, spec0 = demod.demodulate_frames(jnp.asarray(rows), p)
    snr = np.asarray(demod.snr_estimate(spec0, p))
    assert snr[0] > 10.0  # 30 dB injected; estimator is coarse


def test_cfo_estimation_and_correction(mode1):
    p = mode1
    mod = Modulator(mode=1, services=SERVICES)
    cfo = 300.0  # Hz, within +-carrier_diff/2
    iq2 = mod.iq(2, snr_db=40.0, cfo_hz=cfo, sample_offset=500, seed=1)
    u0 = acquisition.acquire(iq2, p)
    assert u0 is not None
    need = demod.min_frame_samples(p)
    rows = jnp.asarray(np.stack([iq2[u0: u0 + need]]))
    est = np.asarray(demod.fine_cfo_estimate(rows, p))
    assert abs(est[0] - cfo) < 30.0, est
    fixed = demod.apply_cfo(rows, jnp.asarray(est))
    soft, _ = demod.demodulate_frames(fixed, p)
    fibs, ok = decode_fic(soft[:, :p.fic_symbols, :], p)
    assert np.asarray(ok).all()


def test_coarse_cfo_integer_carriers(mode1):
    p = mode1
    mod = Modulator(mode=1, services=SERVICES)
    off_carriers = 5
    iq3 = mod.iq(2, snr_db=40.0, cfo_hz=off_carriers * p.carrier_diff,
                 sample_offset=0, seed=2)
    # with a large CFO, null-detect still works (envelope only)
    u0 = acquisition.acquire(iq3, p)
    if u0 is None:  # PRS correlation may fail at 5-carrier offset; use truth
        u0 = p.T_null + p.T_g
    need = demod.min_frame_samples(p)
    rows = jnp.asarray(np.stack([iq3[u0: u0 + need]]))
    _, spec0 = demod.demodulate_frames(rows, p)
    est = np.asarray(demod.coarse_cfo_estimate(spec0, p))
    assert est[0] == off_carriers
