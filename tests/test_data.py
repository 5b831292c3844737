"""Data services round-trips: PAD / dynamic label / MOT / packet / IP /
Journaline (SURVEY.md §2.2 parity)."""

import numpy as np
import pytest

from dabjax.data.group import build_datagroup, parse_datagroup
from dabjax.data.ip import IpHandler
from dabjax.data.journaline import JournalineHandler
from dabjax.data.mot import MotHandler
from dabjax.data.packet import PacketAssembler, dispatch_for_dscty
from dabjax.data.pad import PadHandler
from dabjax.tx.pad import (build_mot_directory_datagroups,
                           build_mot_object_datagroups, build_pad_au,
                           build_udp_ipv4, dynamic_label_pad_fields,
                           mot_pad_fields, packetize_datagroups)


def test_datagroup_roundtrip():
    dg = build_datagroup(4, b"hello world", segment_number=3,
                         last_segment=True, transport_id=0xBEEF)
    p = parse_datagroup(dg)
    assert p is not None and p.crc_ok
    assert p.group_type == 4
    assert p.segment_number == 3 and p.last_segment
    assert p.transport_id == 0xBEEF
    assert p.payload == b"hello world"


def test_datagroup_crc_reject():
    dg = bytearray(build_datagroup(4, b"payload", transport_id=1))
    dg[-3] ^= 0xFF
    assert parse_datagroup(bytes(dg)) is None


def test_dynamic_label_roundtrip():
    h = PadHandler()
    text = "Now playing: Test Song - Artist"
    for f in dynamic_label_pad_fields(text):
        h.process_pad(f)
    assert h.label == text


def test_dynamic_label_via_au():
    h = PadHandler()
    for f in dynamic_label_pad_fields("Hi"):
        h.process_au(build_pad_au(f))
    assert h.label == "Hi"


def test_mot_over_xpad_slideshow():
    body = bytes(np.random.default_rng(1).integers(0, 256, 500, np.uint8))
    dgs = build_mot_object_datagroups(0x0042, "slide.jpg", body,
                                      content_type=2, subtype=1)
    h = PadHandler()
    for dg in dgs:
        for f in mot_pad_fields(dg):
            h.process_pad(f)
    assert len(h.mot.objects) == 1
    obj = h.mot.objects[0]
    assert obj.transport_id == 0x0042
    assert obj.content_type == 2
    assert obj.name == "slide.jpg"
    assert obj.body == body


def test_mot_over_packet_mode():
    body = b"JFIF" * 100
    dgs = build_mot_object_datagroups(7, "img.png", body, content_type=2,
                                      subtype=3, seg_size=40)
    stream = packetize_datagroups(dgs, address=2, packet_len=96)
    asm, mot = dispatch_for_dscty(60)
    # feed in 24-byte-multiple chunks like logical frames would
    for i in range(0, len(stream), 96 * 2):
        asm.add_bytes(stream[i: i + 96 * 2])
    assert asm.crc_errors == 0
    assert len(mot.objects) == 1
    assert mot.objects[0].body == body
    assert mot.objects[0].name == "img.png"


def test_mot_directory_mode():
    objs = [(11, "a.jpg", b"A" * 100, 2, 1), (12, "b.jpg", b"B" * 64, 2, 1)]
    dgs = build_mot_directory_datagroups(99, objs, seg_size=32)
    mot = MotHandler()
    for dg_bytes in dgs:
        dg = parse_datagroup(dg_bytes)
        assert dg is not None
        mot.process_msc_group(dg.payload, dg.group_type, dg.last_segment,
                              dg.segment_number or 0, dg.transport_id)
    assert sorted(o.transport_id for o in mot.objects) == [11, 12]
    by_tid = {o.transport_id: o for o in mot.objects}
    assert by_tid[11].body == b"A" * 100 and by_tid[11].name == "a.jpg"
    assert by_tid[12].body == b"B" * 64


def test_packet_crc_reject_and_resync():
    dgs = build_mot_object_datagroups(5, "x", b"Z" * 64)
    stream = bytearray(packetize_datagroups(dgs, address=1, packet_len=96))
    stream[10] ^= 0xFF                       # corrupt first packet
    asm, mot = dispatch_for_dscty(60)
    asm.add_bytes(bytes(stream))
    assert asm.crc_errors == 1


def test_ip_udp_path():
    payload = b"datagram-payload-123"
    ip = build_udp_ipv4(payload)
    dg = build_datagroup(0, ip)
    got = []
    asm, handler = dispatch_for_dscty(59, on_ip=got.append)
    stream = packetize_datagroups([dg], address=3, packet_len=96)
    asm.add_bytes(stream)
    assert got == [payload]
    assert handler.crc_errors == 0


def test_ip_checksum_reject():
    payload = b"x" * 8
    ip = bytearray(build_udp_ipv4(payload))
    ip[12] ^= 0x55                           # corrupt src address
    h = IpHandler()
    h.process_ip(bytes(ip))
    assert h.crc_errors == 1 and h.payloads == []


def test_journaline_nml():
    # menu object: id 0, type 1, title + 2 items
    nml = bytes([0, 0, (1 << 5) | 0x10, 0]) + \
        b"News Menu\x00World\x00Sports\x00"
    dg = build_datagroup(0, nml)
    jl = JournalineHandler()
    jl.add_datagroup(dg)
    menu = jl.menu()
    assert menu is not None
    assert menu.title == "News Menu"
    assert menu.items == ["World", "Sports"]
    assert menu.object_type == 1 and menu.static_flag


def test_long_dynamic_label_multi_segment():
    text = "A" * 16 + "B" * 16 + "C" * 5       # 3 segments
    h = PadHandler()
    for f in dynamic_label_pad_fields(text):
        h.process_pad(f)
    assert h.label == text
