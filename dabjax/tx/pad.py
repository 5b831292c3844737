"""TX builders for PAD / MOT / packet-mode fixtures.

Inverse of ``dabjax.data`` parsing (the reference has no encoders; these
exist so the data-services pyramid is testable end-to-end, the role
SURVEY.md §4 assigns to the modulator).
"""

from __future__ import annotations

import struct
from typing import List, Optional, Sequence, Tuple

import numpy as np

from dabjax.data.charsets import encode_ebu_latin
from dabjax.data.group import build_datagroup
from dabjax.fec.crc import crc16_ccitt

__all__ = ["build_mot_object_datagroups", "build_mot_directory_datagroups",
           "dynamic_label_pad_fields", "mot_pad_fields", "build_pad_au",
           "packetize_datagroups", "build_udp_ipv4"]

_XPAD_LENGTHS = (4, 6, 8, 12, 16, 24, 32, 48)


def _mot_header_core(body_size: int, header_size: int, content_type: int,
                     subtype: int) -> bytes:
    return bytes([
        (body_size >> 20) & 0xFF, (body_size >> 12) & 0xFF,
        (body_size >> 4) & 0xFF,
        ((body_size & 0xF) << 4) | ((header_size >> 9) & 0x0F),
        (header_size >> 1) & 0xFF,
        ((header_size & 0x1) << 7) | ((content_type & 0x3F) << 1)
        | ((subtype >> 8) & 0x1),
        subtype & 0xFF,
    ])


def _content_name_param(name: str) -> bytes:
    raw = name.encode("latin-1")
    # PLI=3 (variable), paramId=12, short length form, charset byte 0
    return bytes([0xCC, (len(raw) + 1) & 0x7F, 0x00]) + raw


def _seg_header(seg: bytes) -> bytes:
    return bytes([(len(seg) >> 8) & 0x1F, len(seg) & 0xFF]) + seg


def build_mot_object_datagroups(transport_id: int, name: str, body: bytes,
                                content_type: int = 2, subtype: int = 1,
                                seg_size: int = 64) -> List[bytes]:
    """Header-mode MOT object -> [type-3 header DG, type-4 body DGs]."""
    params = _content_name_param(name)
    header_size = 7 + len(params)
    header_seg = _mot_header_core(len(body), header_size, content_type,
                                  subtype) + params
    dgs = [build_datagroup(3, _seg_header(header_seg), segment_number=0,
                           last_segment=True, transport_id=transport_id)]
    chunks = [body[i: i + seg_size] for i in range(0, len(body), seg_size)] \
        or [b""]
    for i, chunk in enumerate(chunks):
        dgs.append(build_datagroup(
            4, _seg_header(chunk), segment_number=i,
            last_segment=(i == len(chunks) - 1),
            transport_id=transport_id))
    return dgs


def build_mot_directory_datagroups(
        dir_transport_id: int,
        objects: Sequence[Tuple[int, str, bytes, int, int]],
        seg_size: int = 64) -> List[bytes]:
    """Directory-mode: one type-6 directory DG + type-4 body DGs per object.

    ``objects``: (transport_id, name, body, content_type, subtype) tuples.
    """
    entries = b""
    for tid, name, body, ctype, subtype in objects:
        params = _content_name_param(name)
        header_size = 7 + len(params)
        entries += struct.pack(">H", tid) + _mot_header_core(
            len(body), header_size, ctype, subtype) + params
    num = len(objects)
    total_size = 13 + len(entries)
    core = bytes([
        (total_size >> 24) & 0x3F, (total_size >> 16) & 0xFF,
        (total_size >> 8) & 0xFF, total_size & 0xFF,
        (num >> 8) & 0xFF, num & 0xFF,
        0, 0, 0,                       # data carousel period
        0, 0,                          # segment size (unused by parser)
    ]) + bytes([0, 0])                 # directory extension length = 0
    dgs = [build_datagroup(6, _seg_header(core + entries), segment_number=0,
                           last_segment=True,
                           transport_id=dir_transport_id)]
    for tid, name, body, ctype, subtype in objects:
        chunks = [body[i: i + seg_size]
                  for i in range(0, len(body), seg_size)] or [b""]
        for i, chunk in enumerate(chunks):
            dgs.append(build_datagroup(
                4, _seg_header(chunk), segment_number=i,
                last_segment=(i == len(chunks) - 1), transport_id=tid))
    return dgs


# ---------------------------------------------------------------------------
# X-PAD field assembly
# ---------------------------------------------------------------------------

def _pad_field(items: Sequence[Tuple[int, bytes]], pad_size: int,
               ci_flag: bool = True) -> bytes:
    """Build one PAD field of ``pad_size`` bytes from (CI, data) items.

    X-PAD grows downward before the 2-byte F-PAD; data bytes are stored
    reversed (EN 300 401 fig 28; pad-handler.cpp addressing).
    """
    down: List[int] = [ci for ci, _ in items]
    if len(items) < 4:
        down.append(0)                 # end-of-CI-list marker
    for ci, data in items:
        if (ci & 0x1F) == 1:
            need = 4
        else:
            need = _XPAD_LENGTHS[ci >> 5]
        padded = data + b"\x00" * (need - len(data))
        down.extend(padded)
    assert len(down) + 2 <= pad_size, (len(down), pad_size)
    buf = bytearray(pad_size)
    for k, v in enumerate(down):
        buf[pad_size - 3 - k] = v
    buf[pad_size - 2] = 0x20           # F-PAD type 0, X-PAD ind 2 (variable)
    buf[pad_size - 1] = 0x02 if ci_flag else 0x00
    return bytes(buf)


def dynamic_label_pad_fields(text: str, pad_size: int = 32,
                             charset: int = 0) -> List[bytes]:
    """Encode a dynamic label as variable X-PAD fields (CI 2 segments)."""
    raw = encode_ebu_latin(text, length=len(text))
    segs = [raw[i: i + 16] for i in range(0, len(raw), 16)] or [b""]
    fields = []
    for i, seg in enumerate(segs):
        first = 1 if i == 0 else 0
        last = 1 if i == len(segs) - 1 else 0
        field1 = len(seg) - 1
        b4 = (charset & 0xF) if first else ((i - 1) & 0x7)
        prefix = (first << 14) | (last << 13) | (0 << 12) | (field1 << 8) \
            | (b4 << 4)
        data = bytes([prefix >> 8, prefix & 0xFF]) + seg
        # pick the smallest X-PAD length that fits
        idx = next(j for j, n in enumerate(_XPAD_LENGTHS)
                   if n >= len(data))
        ci = (idx << 5) | 2
        fields.append(_pad_field([(ci, data)], pad_size))
    return fields


def mot_pad_fields(datagroup: bytes, pad_size: int = 64) -> List[bytes]:
    """Carry one MSC data group over X-PAD app types 1 + 12/13."""
    # data group length indicator (app type 1): 2 length bytes + CRC
    ln = len(datagroup)
    ind_payload = bytes([(ln >> 8) & 0x3F, ln & 0xFF])
    crc = (~crc16_ccitt(np.frombuffer(ind_payload, np.uint8))) & 0xFFFF
    indicator = ind_payload + bytes([crc >> 8, crc & 0xFF])

    chunk = _XPAD_LENGTHS[-1]          # 48-byte subfields
    chunks = [datagroup[i: i + chunk]
              for i in range(0, len(datagroup), chunk)]
    fields = [_pad_field([(0x01, indicator), ((7 << 5) | 12, chunks[0])],
                         pad_size)]
    for c in chunks[1:]:
        fields.append(_pad_field([((7 << 5) | 13, c)], pad_size))
    return fields


def build_pad_au(pad_field: bytes) -> bytes:
    """Wrap a PAD field in a type-4 access unit (mp4processor.cpp:264)."""
    return bytes([4 << 5, len(pad_field)]) + pad_field


# ---------------------------------------------------------------------------
# Packet mode
# ---------------------------------------------------------------------------

def packetize_datagroups(datagroups: Sequence[bytes], address: int = 1,
                         packet_len: int = 96) -> bytes:
    """Encode data groups as a DAB packet stream (EN 300 401 §5.3.2)."""
    assert packet_len in (24, 48, 72, 96)
    lenidx = packet_len // 24 - 1
    useful_max = packet_len - 5
    out = bytearray()
    ci = 0
    for dg in datagroups:
        chunks = [dg[i: i + useful_max]
                  for i in range(0, len(dg), useful_max)] or [b""]
        for i, chunk in enumerate(chunks):
            if len(chunks) == 1:
                fl = 0b11
            elif i == 0:
                fl = 0b10
            elif i == len(chunks) - 1:
                fl = 0b01
            else:
                fl = 0b00
            pkt = bytearray(packet_len)
            pkt[0] = (lenidx << 6) | ((ci & 0x3) << 4) | (fl << 2) \
                | ((address >> 8) & 0x3)
            pkt[1] = address & 0xFF
            pkt[2] = len(chunk) & 0x7F
            pkt[3: 3 + len(chunk)] = chunk
            crc = (~crc16_ccitt(np.frombuffer(bytes(pkt[:-2]),
                                              np.uint8))) & 0xFFFF
            pkt[-2] = crc >> 8
            pkt[-1] = crc & 0xFF
            out += pkt
            ci = (ci + 1) & 0x3
    return bytes(out)


# ---------------------------------------------------------------------------
# IP / UDP
# ---------------------------------------------------------------------------

def build_udp_ipv4(payload: bytes, src_port: int = 4000,
                   dst_port: int = 8888) -> bytes:
    """Minimal IPv4+UDP datagram with a valid header checksum."""
    udp = struct.pack(">HHHH", src_port, dst_port, 8 + len(payload), 0) \
        + payload
    total = 20 + len(udp)
    hdr = bytearray(struct.pack(">BBHHHBBH4s4s", 0x45, 0, total, 0, 0, 64,
                                17, 0, b"\x7f\x00\x00\x01",
                                b"\x7f\x00\x00\x01"))
    s = 0
    for i in range(0, 20, 2):
        s += (hdr[i] << 8) | hdr[i + 1]
    s = (s >> 16) + (s & 0xFFFF)
    s += s >> 16
    csum = ~s & 0xFFFF
    hdr[10] = csum >> 8
    hdr[11] = csum & 0xFF
    return bytes(hdr) + udp
