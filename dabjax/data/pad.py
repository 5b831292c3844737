"""PAD (Programme Associated Data) decoder — EN 300 401 §7.4.

Parses the F-PAD/X-PAD field carried in DAB+ PAD access units
(``pad-handler.cpp:47-171`` semantics): short X-PAD (3-byte dynamic-label
chunks), variable-size X-PAD with a contents-indicator list, dynamic label
segment assembly with multi-X-PAD continuation (``:177-269``), and MOT MSC
data-group assembly from X-PAD app types 1/12/13 (``:274-357``).

X-PAD bytes are transmitted in reverse order at the end of the PAD field,
growing downward from just before the 2-byte F-PAD.
"""

from __future__ import annotations

from typing import Callable, List, Optional

from dabjax.data import charsets
from dabjax.data.group import parse_datagroup
from dabjax.data.mot import MotHandler, MotObject

__all__ = ["PadHandler"]

# X-PAD data subfield lengths by the 3-bit CI length index (§7.4.3.2)
_XPAD_LENGTHS = (4, 6, 8, 12, 16, 24, 32, 48)


class PadHandler:
    """Stateful PAD parser; one instance per audio service."""

    def __init__(self,
                 on_label: Optional[Callable[[str], None]] = None,
                 on_object: Optional[Callable[[MotObject], None]] = None):
        self.on_label = on_label
        self.mot = MotHandler(on_object=on_object)
        self.labels: List[str] = []
        # dynamic label assembly state
        self._label_parts: List[str] = []
        self._charset = charsets.EBU_LATIN
        self._more_xpad = False
        self._is_last_segment = False
        self._remain = 0
        # MOT-over-X-PAD assembly state
        self._dg_length = -1
        self._dg_buf = bytearray()
        self._last_app_type = 0

    # -- AU entry ---------------------------------------------------------
    def process_au(self, au: bytes) -> None:
        """Feed a DAB+ access unit; PAD AUs have type 4 in the top 3 bits
        (mp4processor.cpp:264-265)."""
        if len(au) < 2 or ((au[0] >> 5) & 0x7) != 4:
            return
        count = au[1]
        if count < 2 or len(au) < 2 + count:
            return
        self.process_pad(au[2: 2 + count])

    def process_pad(self, buf: bytes) -> None:
        """Feed one PAD field (X-PAD ++ F-PAD, transmitted byte order)."""
        count = len(buf)
        if count < 2:
            return
        fpad_type = (buf[count - 2] >> 6) & 0x3
        if fpad_type != 0:
            return
        xpad_ind = (buf[count - 2] >> 4) & 0x3
        if xpad_ind == 1:
            self._short_xpad(buf, count)
        elif xpad_ind == 2:
            ci_flag = (buf[count - 1] >> 1) & 0x1
            if ci_flag:
                self._variable_xpad(buf, count)

    # -- short X-PAD ------------------------------------------------------
    def _short_xpad(self, b: bytes, count: int) -> None:
        if count < 6:
            return
        ci = b[count - 3]
        data = bytes([b[count - 4], b[count - 5], b[count - 6]])
        if (ci & 0x1F) in (2, 3):
            self._dynamic_label(data, 3, ci)

    # -- variable X-PAD ---------------------------------------------------
    def _variable_xpad(self, b: bytes, count: int) -> None:
        base = count - 3          # just below the F-PAD
        ci_list = []
        while base >= 0 and (b[base] & 0x1F) != 0 and len(ci_list) < 4:
            ci_list.append(b[base])
            base -= 1
        if len(ci_list) < 4:      # explicit end-marker CI consumed
            base -= 1
        for ci in ci_list:
            app_type = ci & 0x1F
            length = _XPAD_LENGTHS[ci >> 5]
            if app_type == 1:
                # MOT data group length indicator (4 bytes incl. CRC)
                if base - 3 < 0:
                    return
                self._dg_length = ((b[base] & 0x3F) << 8) | b[base - 1]
                self._dg_buf = bytearray()
                base -= 4
                self._last_app_type = 1
                continue
            if app_type not in (2, 3, 12, 13):
                self._last_app_type = app_type
                return
            if base - (length - 1) < 0:
                return
            data = bytes(b[base - j] for j in range(length))
            if app_type in (2, 3):
                self._dynamic_label(data, length, ci)
            elif app_type == 12 and self._last_app_type == 1:
                self._add_msc_element(data)
            elif app_type == 13 and self._last_app_type in (12, 13):
                self._add_msc_element(data)
            self._last_app_type = app_type
            base -= length

    # -- dynamic label ----------------------------------------------------
    def _dynamic_label(self, data: bytes, length: int, ci: int) -> None:
        """(pad-handler.cpp:177-269 semantics)"""
        app = ci & 0x1F
        if app == 2:              # segment start
            if length < 2:
                return
            prefix = (data[0] << 8) | data[1]
            first = (prefix >> 14) & 0x1
            last = (prefix >> 13) & 0x1
            cflag = (prefix >> 12) & 0x1
            field1 = (prefix >> 8) & 0x0F
            if first:
                self._charset = (prefix >> 4) & 0x0F
                self._label_parts = []
            if cflag:             # command: clear display
                self._label_parts = []
                return
            total = field1 + 1
            if length - 2 < total:
                take = length - 2
                self._more_xpad = True
            else:
                take = total
                self._more_xpad = False
            self._label_parts.append(
                charsets.decode_label(data[2: 2 + take], self._charset))
            self._remain = total - take
            if last:
                if not self._more_xpad:
                    self._show_label()
                else:
                    self._is_last_segment = True
            else:
                self._is_last_segment = False
        elif app == 3 and self._more_xpad:   # continuation
            if self._remain > length:
                take = length
                self._remain -= length
            else:
                take = self._remain
                self._more_xpad = False
            self._label_parts.append(
                charsets.decode_label(data[:take], self._charset))
            if not self._more_xpad and self._is_last_segment:
                self._show_label()

    def _show_label(self) -> None:
        text = "".join(self._label_parts)
        self.labels.append(text)
        if self.on_label is not None:
            self.on_label(text)

    @property
    def label(self) -> str:
        return self.labels[-1] if self.labels else ""

    # -- MOT over X-PAD ---------------------------------------------------
    def _add_msc_element(self, data: bytes) -> None:
        if self._dg_length < 0:
            return
        if len(self._dg_buf) + len(data) >= 8192:
            self._dg_length = -1
            return
        self._dg_buf += data
        if len(self._dg_buf) < self._dg_length:
            return
        dg = parse_datagroup(bytes(self._dg_buf[: self._dg_length]))
        self._dg_length = -1
        if dg is None or dg.transport_id is None:
            return
        if dg.group_type in (3, 4, 6):
            self.mot.process_msc_group(dg.payload, dg.group_type,
                                       dg.last_segment,
                                       dg.segment_number or 0,
                                       dg.transport_id)
