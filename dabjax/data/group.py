"""MSC data group codec (EN 300 401 §5.3.3).

The common envelope for MOT, IP and Journaline payloads.  Parse semantics
match the reference's three independent hand-rolled parsers
(``pad-handler.cpp:299-357``, ``mot-databuilder.cpp:37-95``,
``ip-datahandler.cpp:40-89``); the builder exists for tests/tx (the
reference has no encoder).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import numpy as np

from dabjax.fec.crc import crc16_ccitt

__all__ = ["DataGroup", "parse_datagroup", "build_datagroup"]


@dataclass
class DataGroup:
    group_type: int
    continuity: int
    repetition: int
    last_segment: bool
    segment_number: Optional[int]     # None if no segment field
    transport_id: Optional[int]       # None if no user-access field
    payload: bytes                    # segmentation header onward
    crc_ok: bool


def _crc_of(data: bytes) -> int:
    return crc16_ccitt(np.frombuffer(data, np.uint8))


def parse_datagroup(dg: bytes) -> Optional[DataGroup]:
    """Parse one MSC data group; returns None on malformed/CRC-failed input.

    ``payload`` is everything after the (extension/segment/user-access)
    headers, excluding the trailing CRC when present — for MOT group types
    this starts at the segmentation header (2 bytes), as the reference's
    ``process_mscGroup`` expects.
    """
    if len(dg) < 2:
        return None
    b0, b1 = dg[0], dg[1]
    extension = bool(b0 & 0x80)
    crc_flag = bool(b0 & 0x40)
    segment_flag = bool(b0 & 0x20)
    user_access = bool(b0 & 0x10)
    group_type = b0 & 0x0F
    continuity = (b1 >> 4) & 0x0F
    repetition = b1 & 0x0F

    crc_ok = True
    if crc_flag:
        if len(dg) < 4:
            return None
        # inverted CRC over everything before the 2 CRC bytes
        want = (~_crc_of(dg[:-2])) & 0xFFFF
        got = (dg[-2] << 8) | dg[-1]
        crc_ok = want == got
        if not crc_ok:
            return None

    idx = 2
    if extension:
        idx += 2
    last_segment = False
    segment_number: Optional[int] = None
    if segment_flag:
        if len(dg) < idx + 2:
            return None
        last_segment = bool(dg[idx] & 0x80)
        segment_number = ((dg[idx] & 0x7F) << 8) | dg[idx + 1]
        idx += 2
    transport_id: Optional[int] = None
    if user_access:
        if len(dg) < idx + 1:
            return None
        tid_flag = bool(dg[idx] & 0x10)
        length_ind = dg[idx] & 0x0F
        idx += 1
        if tid_flag:
            if len(dg) < idx + 2:
                return None
            transport_id = (dg[idx] << 8) | dg[idx + 1]
        idx += length_ind
    end = len(dg) - (2 if crc_flag else 0)
    if idx > end:
        return None
    return DataGroup(group_type=group_type, continuity=continuity,
                     repetition=repetition, last_segment=last_segment,
                     segment_number=segment_number, transport_id=transport_id,
                     payload=dg[idx:end], crc_ok=crc_ok)


def build_datagroup(group_type: int, payload: bytes,
                    segment_number: Optional[int] = None,
                    last_segment: bool = False,
                    transport_id: Optional[int] = None,
                    continuity: int = 0,
                    with_crc: bool = True) -> bytes:
    """Encode an MSC data group (inverse of parse_datagroup)."""
    b0 = group_type & 0x0F
    if with_crc:
        b0 |= 0x40
    if segment_number is not None:
        b0 |= 0x20
    if transport_id is not None:
        b0 |= 0x10
    out = bytearray([b0, ((continuity & 0x0F) << 4)])
    if segment_number is not None:
        out += bytes([(0x80 if last_segment else 0) | (segment_number >> 8),
                      segment_number & 0xFF])
    if transport_id is not None:
        out += bytes([0x12, transport_id >> 8, transport_id & 0xFF])
    out += payload
    if with_crc:
        crc = (~_crc_of(bytes(out))) & 0xFFFF
        out += bytes([crc >> 8, crc & 0xFF])
    return bytes(out)
