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


def _nml_header(object_id, object_type, static=False, compressed=False,
                revision=0):
    flags = (object_type << 5) | (0x10 if static else 0) | \
        (0x08 if compressed else 0) | (revision & 0x07)
    return bytes([(object_id >> 8) & 0xFF, object_id & 0xFF, flags])


def _menu_nml(object_id, title, items, revision=0, static=True):
    """items: list of (link_id, text). NML.cpp:489-521 wire format."""
    body = b"\x01" + title.encode()
    for link, text in items:
        body += bytes([0x02, (link >> 8) & 0xFF, link & 0xFF]) + text.encode()
    return _nml_header(object_id, 1, static=static, revision=revision) + body


def test_journaline_nml_menu():
    nml = _menu_nml(0x0000, "News Menu", [(0x0101, "World"),
                                          (0x0102, "Sports")])
    dg = build_datagroup(0, nml)
    jl = JournalineHandler()
    jl.add_datagroup(dg)
    menu = jl.menu()
    assert menu is not None
    assert menu.title == "News Menu"
    assert [it.text for it in menu.items] == ["World", "Sports"]
    assert menu.links == [0x0101, 0x0102]
    assert menu.object_type == 1 and menu.static_flag


def test_journaline_nml_plain_title_list():
    jl = JournalineHandler()
    # plain-text object (code 0x03 body section)
    jl.process_nml(_nml_header(0x0101, 2) + b"\x01Headline\x03Body text")
    # title-only object
    jl.process_nml(_nml_header(0x0102, 3) + b"\x01Just a title")
    # list object (0x04 new row / 0x05 continuation)
    jl.process_nml(_nml_header(0x0103, 4) +
                   b"\x01Scores\x04Home 1:0\x05Away 2:2")
    plain = jl.get_object(0x0101)
    assert plain.title == "Headline"
    assert plain.items[0].text == "Body text"
    assert jl.get_object(0x0102).title == "Just a title"
    assert [i.text for i in jl.get_object(0x0103).items] == \
        ["Home 1:0", "Away 2:2"]


def test_journaline_escape_codes_and_data_sections():
    # 0x10 -> newline, 0x12/0x13 highlights dropped, 0x1A data section
    # (len byte, skip len+1) excised, 0x1C skips one byte (NML.cpp:799-829)
    text = b"AB\x10\x12CD\x13\x1a\x02XYZ\x1cZEF"
    jl = JournalineHandler()
    obj = jl.process_nml(_nml_header(7, 2) + b"\x01T\x03" + text)
    assert obj.items[0].text == "AB\nCDEF"


def test_journaline_compressed_object():
    import zlib
    body = b"\x01Compressed news\x03" + b"lorem ipsum " * 30
    comp = zlib.compress(body, 9)[2:-4]       # raw deflate (wbits=-15)
    nml = _nml_header(0x0202, 2, compressed=True) + b"\x08" + comp
    jl = JournalineHandler()
    obj = jl.process_nml(nml)
    assert obj is not None and obj.title == "Compressed news"
    assert obj.items[0].text.startswith("lorem ipsum")


def test_journaline_revision_and_watch():
    seen = []
    jl = JournalineHandler(on_update=seen.append)
    jl.watch([0x0000])
    jl.process_nml(_menu_nml(0x0000, "v0", [(1, "a")], revision=0))
    assert [o.title for o in seen] == ["v0"]
    # same revision: cached copy kept, no update event
    jl.process_nml(_menu_nml(0x0000, "ignored", [(1, "a")], revision=0))
    assert jl.menu().title == "v0" and len(seen) == 1
    # revision bump: replaced + update event (newssvcdec_impl.cpp:249-279)
    jl.process_nml(_menu_nml(0x0000, "v1", [(1, "b")], revision=1))
    assert jl.menu().title == "v1" and [o.title for o in seen][-1] == "v1"


def test_journaline_cache_eviction_pins():
    jl = JournalineHandler(max_objects=3)
    jl.keep_in_cache([0])
    for oid in range(5):
        jl.process_nml(_nml_header(oid, 3) + b"\x01t%d" % oid)
    assert len(jl.objects) == 3
    assert 0 in jl.objects          # pinned survives
    assert 4 in jl.objects          # newest survives
    assert 1 not in jl.objects      # oldest unpinned evicted


def test_journaline_rejects_segmented_groups():
    # Fraunhofer datagroup layer refuses segment_flag (dabdgdec_impl.c:178)
    nml = _nml_header(9, 3) + b"\x01seg"
    dg = build_datagroup(0, nml, segment_number=0, last_segment=True)
    jl = JournalineHandler()
    jl.add_datagroup(dg)
    assert jl.get_object(9) is None


def test_long_dynamic_label_multi_segment():
    text = "A" * 16 + "B" * 16 + "C" * 5       # 3 segments
    h = PadHandler()
    for f in dynamic_label_pad_fields(text):
        h.process_pad(f)
    assert h.label == text
