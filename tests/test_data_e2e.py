"""Data services through the full receiver: PAD (dynamic label + MOT
slideshow over X-PAD) in a DAB+ audio service, and a packet-mode MOT
service (DSCTy 60) — SURVEY.md phase 4 end-to-end."""

import numpy as np
import pytest

from dabjax.audio import mp4
from dabjax.io.sources import SyntheticSource
from dabjax.runtime.config import ReceiverConfig
from dabjax.runtime.receiver import Receiver
from dabjax.tx.fig import ServiceSpec
from dabjax.tx.modulator import Modulator
from dabjax.tx.pad import (build_mot_object_datagroups, build_pad_au,
                           dynamic_label_pad_fields, mot_pad_fields,
                           packetize_datagroups)

BITRATE_PLUS = 88
BITRATE_PKT = 32

LABEL_TEXT = "DABJAX - Now Playing"
SLIDE_BODY = bytes(np.random.default_rng(7).integers(0, 256, 300, np.uint8))
PKT_BODY = b"PacketModeSlide!" * 20


def _pad_fields():
    fields = list(dynamic_label_pad_fields(LABEL_TEXT))
    for dg in build_mot_object_datagroups(0x21, "cover.jpg", SLIDE_BODY,
                                          content_type=2, subtype=1):
        fields.extend(mot_pad_fields(dg))
    return fields


def _dabplus_payload():
    fields = _pad_fields()
    cache = {}

    def payload(cif_index: int) -> np.ndarray:
        sf, part = divmod(cif_index % (1 << 20), 5)
        if sf not in cache:
            aus = []
            for k in range(3):
                f = fields[(3 * sf + k) % len(fields)]
                aus.append(build_pad_au(f))
            cache[sf] = mp4.build_superframe(
                BITRATE_PLUS, aus, dac_rate=1, sbr_flag=1)
        return np.unpackbits(cache[sf][part])

    return payload


def _packet_payload():
    dgs = build_mot_object_datagroups(0x55, "pkt.png", PKT_BODY,
                                      content_type=2, subtype=3,
                                      seg_size=48)
    stream = packetize_datagroups(dgs, address=1, packet_len=96)
    n_pkts = len(stream) // 96
    frame_bytes = 24 * BITRATE_PKT // 8          # 96: one packet per frame

    def payload(cif_index: int) -> np.ndarray:
        pkt = stream[(cif_index % n_pkts) * 96:
                     (cif_index % n_pkts + 1) * 96]
        return np.unpackbits(np.frombuffer(pkt, np.uint8))

    assert frame_bytes == 96
    return payload


@pytest.fixture(scope="module")
def rx():
    services = [
        ServiceSpec(label="PADRADIO", sid=0x5001, subch_id=2, start_addr=0,
                    bitrate=BITRATE_PLUS, protection="EEP-A", prot_level=3,
                    kind="DAB+"),
        ServiceSpec(label="SLIDESVC", sid=0x5002, subch_id=9,
                    start_addr=200, bitrate=BITRATE_PKT, protection="EEP-A",
                    prot_level=3, kind="packet", dscty=60,
                    packet_address=1),
    ]
    mod = Modulator(mode=1, services=services,
                    payloads={2: _dabplus_payload(), 9: _packet_payload()})
    src = SyntheticSource(mod, snr_db=30.0, lead_in=1000)
    r = Receiver(src, ReceiverConfig(frames_per_block=4))
    r.run(5)          # 20 frames -> 80 CIFs
    return r


def test_packet_service_db(rx):
    pd = rx.db.data_for_data_service("SLIDESVC")
    assert pd is not None
    assert pd.dscty == 60 and pd.subch_id == 9


def test_dynamic_label_received(rx):
    svc = rx.audio.get(2)
    assert svc is not None
    assert svc.dynamic_label == LABEL_TEXT


def test_xpad_slideshow_received(rx):
    svc = rx.audio.get(2)
    slides = svc.slides
    assert len(slides) >= 1
    assert slides[0].name == "cover.jpg"
    assert slides[0].content_type == 2
    assert slides[0].body == SLIDE_BODY


def test_packet_mode_mot_received(rx):
    h = rx.data_handlers.get(9)
    assert h is not None, "packet data handler not created"
    assert h.assembler.crc_errors == 0
    objs = h.handler.objects
    assert len(objs) >= 1
    assert objs[0].name == "pkt.png"
    assert objs[0].body == PKT_BODY
