"""Journaline (DSCTy 44) news-service decoder — full NML stack.

The reference embeds the Fraunhofer Journaline decoder
(``src/backend/data/journaline/``) but leaves its display callback empty
(``journaline-datahandler.cpp:27-33``).  We implement the decoder stack it
ships, host-side (pure control plane, never jitted):

* data-group gate: type-0 groups only, segmented groups rejected — the
  Fraunhofer datagroup layer does the same (``dabdgdec_impl.c:178-185,
  225-232``); CRC is gated in :mod:`dabjax.data.group`.
* NML object parse with the real 3-byte header — object id, 3-bit type,
  static/compressed flags, 3-bit revision index (``newsobject.cpp:73-83``,
  ``NML.cpp:341-356``).
* deflate decompression of compressed bodies (0x08 magic + raw RFC 1951
  stream, 4092-byte cap — ``NML.cpp:372-425,720-777``).
* typed section walk: title (code 0x01), plain text (0x03), menu items
  (0x02 + 2-byte link id), list rows (0x04/0x05), with in-text data
  sections (0x1A/0x1B + length) skipped exactly like ``getNextSection``
  (``NML.cpp:260-311,430-553``).
* escape-code conversion per ``RemoveNMLEscapeSequences::Convert``
  (``NML.cpp:799-829``): 0x10 -> newline, highlight markers dropped,
  extended codes skip one byte.
* a news-object cache with revision-index change detection, watch-list
  update callbacks, keep-in-cache pinning and oldest-first eviction
  (``newssvcdec_impl.cpp:233-335,352-394``).
"""

from __future__ import annotations

import zlib
from dataclasses import dataclass, field
from typing import Callable, Dict, List, Optional, Set

from dabjax.data.group import parse_datagroup

__all__ = ["NmlObject", "NmlItem", "JournalineHandler",
           "OBJ_MENU", "OBJ_PLAIN", "OBJ_TITLE", "OBJ_LIST"]

ROOT_OBJECT_ID = 0x0000

# object_type_t {INVALID, MENU, PLAIN, TITLE, LIST} (NML.h:156)
OBJ_MENU = 1
OBJ_PLAIN = 2
OBJ_TITLE = 3
OBJ_LIST = 4

_NML_HEADER_BYTES = 3          # NML.cpp:98
_NML_MAX_LEN = 4092            # NML.cpp:83
_MIN_ITEM_BYTES = 3            # NML.cpp:95


@dataclass
class NmlItem:
    text: str
    link_id: Optional[int] = None   # menu items only


@dataclass
class NmlObject:
    object_id: int
    object_type: int          # OBJ_MENU / OBJ_PLAIN / OBJ_TITLE / OBJ_LIST
    static_flag: bool
    revision: int
    title: str
    items: List[NmlItem] = field(default_factory=list)
    seq: int = 0              # reception order (cache eviction key)

    @property
    def links(self) -> List[int]:
        return [it.link_id for it in self.items if it.link_id is not None]


def _convert_escapes(raw: bytes) -> str:
    """NML escape-code removal (RemoveNMLEscapeSequences, NML.cpp:799-829)."""
    out: List[str] = []
    i = 0
    n = len(raw)
    while i < n:
        c = raw[i]
        if c == 0x10:                       # preferred line break
            out.append("\n")
        elif c in (0x12, 0x13):             # highlight begin/end
            pass
        elif c in (0x1A, 0x1B):             # data section: skip len+1 bytes
            if i + 1 >= n:
                break
            i += raw[i + 1] + 2
        elif c in (0x1C, 0x1D):             # extended code: skip next byte
            i += 1
        else:
            out.append(chr(c))
        i += 1
    return "".join(out)


def _next_section(data: bytes, pos: int) -> tuple[bytes, int]:
    """Collect text bytes until the next JML code (high nibble zero),
    skipping embedded 0x1A/0x1B data sections (NML.cpp:260-311).

    Returns (raw_text, new_pos); raises ValueError on a data section whose
    declared length runs past the buffer, matching the reference's abort.
    """
    out = bytearray()
    i = pos
    n = len(data)
    while i < n:
        c = data[i]
        if c in (0x1A, 0x1B):
            if i + 1 >= n:
                raise ValueError("truncated data section")
            dslen = data[i + 1] + 1
            if dslen > n - i:
                raise ValueError("data section length out of bounds")
            i += 2 + dslen
            continue
        if (c & 0xF0) == 0:                 # any JML code ends the section
            break
        out.append(c)
        i += 1
    return bytes(out), i


def parse_nml(data: bytes) -> Optional[NmlObject]:
    """Parse one raw NML object (NMLFactory::CreateNML, NML.cpp:324-556).

    Returns None where the reference would emit an error-dump object.
    """
    if len(data) < 4:
        return None
    object_id = (data[0] << 8) | data[1]
    object_type = (data[2] >> 5) & 0x7
    if object_type < OBJ_MENU or object_type > OBJ_LIST:
        return None
    static_flag = bool(data[2] & 0x10)
    compressed = bool(data[2] & 0x08)
    revision = data[2] & 0x07

    body = data[_NML_HEADER_BYTES:]
    if compressed:
        # 0x08 magic byte, then a raw deflate stream (NML.cpp:372-385).
        # Decompress with a hard output cap, like the reference's inflate
        # into a fixed 4092-byte buffer (NML.cpp:390) — an unbounded
        # zlib.decompress would let a hostile few-KB datagroup expand to
        # megabytes on the host before the length check.
        if not body or body[0] != 0x08:
            return None
        cap = _NML_MAX_LEN - _NML_HEADER_BYTES
        try:
            d = zlib.decompressobj(wbits=-15)
            body = d.decompress(body[1:], cap + 1)
        except zlib.error:
            return None
        if len(body) > cap or not d.eof:
            return None

    # title section is mandatory and first (NML.cpp:434-455)
    if not body or body[0] != 0x01:
        return None
    try:
        raw_title, pos = _next_section(body, 1)
    except ValueError:
        return None
    obj = NmlObject(object_id=object_id, object_type=object_type,
                    static_flag=static_flag, revision=revision,
                    title=_convert_escapes(raw_title))

    if object_type == OBJ_TITLE:
        return obj

    if object_type == OBJ_PLAIN:
        if pos >= len(body) or body[pos] != 0x03:
            return None
        try:
            raw, pos = _next_section(body, pos + 1)
        except ValueError:
            return None
        obj.items.append(NmlItem(text=_convert_escapes(raw)))
        return obj

    if object_type == OBJ_MENU:
        while len(body) - pos > _MIN_ITEM_BYTES:
            if body[pos] != 0x02:
                return None
            link_id = (body[pos + 1] << 8) | body[pos + 2]
            try:
                raw, pos = _next_section(body, pos + 3)
            except ValueError:
                return None
            obj.items.append(NmlItem(text=_convert_escapes(raw),
                                     link_id=link_id))
        return obj

    # OBJ_LIST: rows flagged 0x04 (new row) / 0x05 (continuation)
    while len(body) - pos > _MIN_ITEM_BYTES:
        if body[pos] not in (0x04, 0x05):
            return None
        try:
            raw, pos = _next_section(body, pos + 1)
        except ValueError:
            return None
        obj.items.append(NmlItem(text=_convert_escapes(raw)))
    return obj


class JournalineHandler:
    """News-service decoder: datagroup gate + NML parse + object cache.

    Mirrors ``NEWS_SVC_DEC_putData`` (``newssvcdec_impl.cpp:172-335``):
    objects are cached by id; a changed revision index replaces the cached
    object and flags an update; the cache is capped at ``max_objects`` with
    oldest-reception-first eviction that skips pinned (keep-in-cache) ids
    (``newssvcdec_impl.cpp:352-394,540-589``).  ``watch`` registers ids
    whose arrival/refresh invokes ``on_update`` — the hook the reference
    exposes as the NEWS_SVC_DEC_cb.
    """

    def __init__(self, max_objects: int = 512,
                 on_update: Optional[Callable[[NmlObject], None]] = None):
        self.objects: Dict[int, NmlObject] = {}
        self.max_objects = max_objects
        self.on_update = on_update
        self.handled = 0
        self.updated_ids: List[int] = []
        self._watch: Set[int] = set()
        self._pinned: Set[int] = set()
        self._seq = 0
        self._last_continuity: Optional[int] = None
        self.discontinuities = 0

    # -- datagroup layer (dabdgdec_impl.c:134-237) -----------------------
    def add_datagroup(self, dg_bytes: bytes) -> None:
        dg = parse_datagroup(dg_bytes)
        if dg is None:
            return
        # Track continuity over EVERY CRC-valid datagroup in the stream —
        # interleaved non-type-0 groups advance the continuity index too,
        # and counting them as gaps would report false discontinuities.
        if self._last_continuity is not None:
            if dg.continuity != (self._last_continuity + 1) % 16:
                self.discontinuities += 1
        self._last_continuity = dg.continuity
        if dg.group_type != 0 or dg.segment_number is not None:
            return                      # Fraunhofer layer rejects both
        self.process_nml(dg.payload)

    # -- news-service layer (newssvcdec_impl.cpp:172-335) ----------------
    def process_nml(self, data: bytes) -> Optional[NmlObject]:
        self.handled += 1
        obj = parse_nml(data)
        if obj is None:
            return None

        old = self.objects.get(obj.object_id)
        if old is not None and old.revision == obj.revision:
            return old                  # same revision: keep cached copy
        self._seq += 1
        obj.seq = self._seq
        self.objects[obj.object_id] = obj
        if old is not None or obj.object_id in self._watch:
            self.updated_ids.append(obj.object_id)
            if self.on_update is not None and obj.object_id in self._watch:
                self.on_update(obj)
        self._evict()
        return obj

    def _evict(self) -> None:
        while len(self.objects) > self.max_objects:
            victims = [o for o in self.objects.values()
                       if o.object_id not in self._pinned]
            if not victims:
                return
            oldest = min(victims, key=lambda o: o.seq)
            del self.objects[oldest.object_id]

    # -- application API (newssvcdec_impl.cpp:399-431,433-487,530-589) ---
    def get_object(self, object_id: int) -> Optional[NmlObject]:
        return self.objects.get(object_id)

    def watch(self, object_ids) -> None:
        self._watch.update(int(i) for i in object_ids)

    def keep_in_cache(self, object_ids) -> None:
        self._pinned.update(int(i) for i in object_ids)

    def menu(self) -> Optional[NmlObject]:
        return self.objects.get(ROOT_OBJECT_ID)
