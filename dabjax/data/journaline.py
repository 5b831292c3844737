"""Journaline (DSCTy 44) news-service decoder — NML object layer.

The reference embeds the Fraunhofer Journaline decoder but leaves its
display callback empty (``journaline-datahandler.cpp:27-33``), so parity
is: accept data groups and decode the NML (News Markup Language) object
structure.  We implement the useful core: NML object header parse
(object id, type, title) and menu/plain-text item extraction per the
NML format used by ``journaline/NML.cpp``/``dabdgdec_impl.c``.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional

from dabjax.data.group import parse_datagroup

__all__ = ["NmlObject", "JournalineHandler"]

ROOT_OBJECT_ID = 0x0000


@dataclass
class NmlObject:
    object_id: int
    object_type: int          # 1 = menu, 2 = plain text, 3 = title-only
    static_flag: bool
    title: str
    items: List[str] = field(default_factory=list)
    links: List[int] = field(default_factory=list)


# NML escape codes 0x1A..0x1F prefix 2-byte link ids / formatting
_TEXT_ESCAPES = {0x1A, 0x1B, 0x1C, 0x1D, 0x1E, 0x1F}


def _decode_nml_text(data: bytes) -> str:
    out = []
    i = 0
    while i < len(data):
        c = data[i]
        if c in _TEXT_ESCAPES:
            i += 1                      # skip escape marker
        elif c >= 0x20:
            out.append(chr(c))
        i += 1
    return "".join(out)


class JournalineHandler:
    """Assembles NML objects from Journaline data groups.

    The payload layout follows the Fraunhofer decoder
    (``journaline/newssvcdec_impl.cpp``): each data group carries one NML
    object: [2 object id][1 flags: 3b type, 1b static][1 extension length]
    [ext bytes][title, 0x00 terminated][items, each 0x00 terminated].
    """

    def __init__(self):
        self.objects: Dict[int, NmlObject] = {}
        self.handled = 0

    def add_datagroup(self, dg_bytes: bytes) -> None:
        dg = parse_datagroup(dg_bytes)
        if dg is None:
            return
        self.process_nml(dg.payload)

    def process_nml(self, data: bytes) -> Optional[NmlObject]:
        self.handled += 1
        if len(data) < 5:
            return None
        object_id = (data[0] << 8) | data[1]
        object_type = (data[2] >> 5) & 0x7
        static_flag = bool(data[2] & 0x10)
        ext_len = data[3]
        pos = 4 + ext_len
        if pos > len(data):
            return None
        parts = data[pos:].split(b"\x00")
        title = _decode_nml_text(parts[0]) if parts else ""
        items = [_decode_nml_text(p) for p in parts[1:] if p]
        obj = NmlObject(object_id=object_id, object_type=object_type,
                        static_flag=static_flag, title=title, items=items)
        self.objects[object_id] = obj
        return obj

    def menu(self) -> Optional[NmlObject]:
        return self.objects.get(ROOT_OBJECT_ID)
