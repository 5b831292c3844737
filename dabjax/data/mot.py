"""MOT object transfer decoder (EN 301 234; slideshow TS 101 499).

Re-implements the reference's ``mot-data.cpp`` semantics: MOT objects are
assembled from MSC data groups — group type 3 carries the header (content
type/subtype, name), type 4 carries body segments, type 6 the MOT
directory (directory mode).  Completed objects are delivered to a callback
instead of a Qt pixmap signal; content type 2 is the slideshow image the
reference displays (``mot-data.cpp:337+``, ``gui.cpp:1396-1406``).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, Dict, List, Optional, Tuple

__all__ = ["MotObject", "MotHandler"]

# MOT content types (EN 301 234 table 17)
CONTENT_IMAGE = 2
CONTENT_EPG = 7


@dataclass
class MotObject:
    transport_id: int
    content_type: int
    content_subtype: int
    name: str
    body: bytes


class _Entry:
    def __init__(self, transport_id: int, body_size: int, content_type: int,
                 content_subtype: int, name: str):
        self.transport_id = transport_id
        self.body_size = body_size
        self.content_type = content_type
        self.content_subtype = content_subtype
        self.name = name
        self.segment_size = -1
        self.num_segments = -1
        self.segments: Dict[int, bytes] = {}

    def complete(self) -> bool:
        if self.num_segments < 0:
            return False
        return all(i in self.segments for i in range(self.num_segments))

    def body(self) -> bytes:
        return b"".join(self.segments[i] for i in range(self.num_segments))


def _parse_header_params(data: bytes, start: int, end: int) -> str:
    """Walk the MOT parameter list; returns ContentName (param 12) if present
    (mot-data.cpp:66-110 / EN 301 234 §6.2)."""
    name = ""
    p = start
    while p < end:
        pli = (data[p] >> 6) & 0x3
        param = data[p] & 0x3F
        if pli == 0:
            p += 1
        elif pli == 1:
            p += 2
        elif pli == 2:
            p += 5
        else:
            if p + 1 >= end:
                break
            if data[p + 1] & 0x80:
                if p + 2 >= end:
                    break
                length = ((data[p + 1] & 0x7F) << 8) | data[p + 2]
                p += 3
            else:
                length = data[p + 1] & 0x7F
                p += 2
            if param == 12 and length >= 1:
                # first byte is the character-set indicator
                name = bytes(data[p + 1: p + length]).decode(
                    "latin-1", errors="replace")
            p += length
    return name


class MotHandler:
    """Assembles MOT objects from MSC data groups.

    ``on_object`` fires once per completed object (the showMOT analog).
    """

    def __init__(self, on_object: Optional[Callable[[MotObject], None]]
                 = None):
        self.on_object = on_object
        self._entries: Dict[int, _Entry] = {}
        self._delivered: set = set()
        self.objects: List[MotObject] = []
        # directory mode state
        self._dir_tid: Optional[int] = None
        self._dir_segment_size = -1
        self._dir_num_segments = -1
        self._dir_segments: Dict[int, bytes] = {}
        self._dir_size = 0
        self._dir_num_objects = 0

    # -- data group entry -------------------------------------------------
    def process_msc_group(self, data: bytes, group_type: int,
                          last_segment: bool, segment_number: int,
                          transport_id: int) -> None:
        """``data`` starts at the segmentation header
        (mot-data.cpp:679-728)."""
        if len(data) < 2:
            return
        segment_size = ((data[0] & 0x1F) << 8) | data[1]
        seg = data[2: 2 + segment_size]
        if segment_number == 0 and group_type == 3:
            self._process_header(transport_id, seg, last_segment)
        elif group_type == 6:
            if segment_number == 0:
                self._process_directory(transport_id, seg, last_segment)
            else:
                self._directory_segment(transport_id, seg, segment_number,
                                        last_segment)
        elif group_type == 4:
            self._process_segment(transport_id, seg, segment_number,
                                  last_segment)

    # -- header mode ------------------------------------------------------
    def _process_header(self, transport_id: int, seg: bytes,
                        last: bool) -> None:
        if len(seg) < 7:
            return
        body_size = (seg[0] << 20) | (seg[1] << 12) | (seg[2] << 4) | \
            (seg[3] >> 4)
        header_size = ((seg[3] & 0x0F) << 9) | (seg[4] << 1) | (seg[5] >> 7)
        content_type = (seg[5] >> 1) & 0x3F
        content_subtype = ((seg[5] & 0x01) << 8) | seg[6]
        name = _parse_header_params(seg, 7, min(header_size, len(seg)))
        if transport_id in self._entries:
            return
        e = _Entry(transport_id, body_size, content_type, content_subtype,
                   name)
        self._entries[transport_id] = e
        if not last and len(seg) > header_size:
            # header group also carries the first body bytes
            self._process_segment(transport_id, seg[header_size:], 0, False)

    # -- body segments ----------------------------------------------------
    def _process_segment(self, transport_id: int, seg: bytes,
                         segment_number: int, last: bool) -> None:
        e = self._entries.get(transport_id)
        if e is None:
            return
        if segment_number in e.segments:
            return
        if not last and e.segment_size < 0:
            e.segment_size = len(seg)
        if e.segment_size < 0:
            return
        if segment_number * e.segment_size + len(seg) > e.body_size:
            return
        e.segments[segment_number] = seg
        if last:
            e.num_segments = segment_number + 1
        if e.complete():
            self._deliver(e)

    def _deliver(self, e: _Entry) -> None:
        if e.transport_id in self._delivered:
            return
        self._delivered.add(e.transport_id)
        obj = MotObject(e.transport_id, e.content_type, e.content_subtype,
                        e.name, e.body())
        self.objects.append(obj)
        if self.on_object is not None:
            self.on_object(obj)

    # -- directory mode ---------------------------------------------------
    def _process_directory(self, transport_id: int, seg: bytes,
                           last: bool) -> None:
        if self._dir_tid == transport_id:
            return
        if len(seg) < 11:
            return
        self._dir_tid = transport_id
        self._dir_size = ((seg[0] & 0x3F) << 24) | (seg[1] << 16) | \
            (seg[2] << 8) | seg[3]
        self._dir_num_objects = (seg[4] << 8) | seg[5]
        self._dir_segment_size = len(seg)
        self._dir_segments = {0: seg}
        self._dir_num_segments = 1 if last else -1
        self._try_directory()

    def _directory_segment(self, transport_id: int, seg: bytes,
                           segment_number: int, last: bool) -> None:
        if self._dir_tid != transport_id:
            return
        if segment_number in self._dir_segments:
            return
        self._dir_segments[segment_number] = seg
        if last:
            self._dir_num_segments = segment_number + 1
        self._try_directory()

    def _try_directory(self) -> None:
        n = self._dir_num_segments
        if n < 0 or not all(i in self._dir_segments for i in range(n)):
            return
        data = b"".join(self._dir_segments[i] for i in range(n))
        self._analyse_directory(data)

    def _analyse_directory(self, data: bytes) -> None:
        """Create entries for each directory object
        (mot-data.cpp:196-276)."""
        if len(data) < 13:
            return
        base = 11
        ext_len = (data[base] << 8) | data[base + 1]
        base += 2 + ext_len
        for _ in range(self._dir_num_objects):
            if base + 9 > len(data):
                return
            tid = (data[base] << 8) | data[base + 1]
            body_size = (data[base + 2] << 20) | (data[base + 3] << 12) | \
                (data[base + 4] << 4) | ((data[base + 5] & 0xF0) >> 4)
            header_size = ((data[base + 5] & 0x0F) << 9) | \
                (data[base + 6] << 1) | ((data[base + 7] >> 7) & 0x01)
            content_type = (data[base + 7] >> 1) & 0x3F
            subtype = ((data[base + 7] & 0x1) << 8) | data[base + 8]
            end = base + 2 + header_size
            name = _parse_header_params(data, base + 9, min(end, len(data)))
            if tid not in self._entries:
                self._entries[tid] = _Entry(tid, body_size, content_type,
                                            subtype, name)
            base = end
