"""Packet-mode service decode (EN 300 401 §5.3.2).

The reference assembles DAB packets into MSC data groups on a dedicated
thread (``msc-datagroup.cpp:221-319``); here the FEC/Viterbi part is done
by the batched MSC pipeline and this module is the host-side byte-plane:
packet parse + CRC gate, single-stream data-group assembly, and DSCTy
dispatch (44 Journaline / 59 IP / 60 MOT, ``msc-datagroup.cpp:68-85``).
"""

from __future__ import annotations

from typing import Callable, List, Optional

import numpy as np

from dabjax.fec.crc import crc16_ccitt
from dabjax.data.group import parse_datagroup
from dabjax.data.ip import IpHandler
from dabjax.data.journaline import JournalineHandler
from dabjax.data.mot import MotHandler, MotObject

__all__ = ["PacketAssembler", "PacketService", "dispatch_for_dscty"]

DSCTY_TDC = 5
DSCTY_JOURNALINE = 44
DSCTY_IP = 59
DSCTY_MOT = 60


def _packet_crc_ok(pkt: bytes) -> bool:
    want = (~crc16_ccitt(np.frombuffer(pkt[:-2], np.uint8))) & 0xFFFF
    return want == ((pkt[-2] << 8) | pkt[-1])


class PacketAssembler:
    """Parses a packet stream and assembles MSC data groups.

    ``on_datagroup(bytes)`` receives each completed data group (the
    ``add_mscDatagroup`` analog).  Mirrors the reference's
    single-stream-address limitation deliberately — first non-padding
    address wins (``msc-datagroup.cpp:268-272``).
    """

    def __init__(self, on_datagroup: Callable[[bytes], None]):
        self.on_datagroup = on_datagroup
        self._series = bytearray()
        self._in_series = False
        self._stream_address: Optional[int] = None
        self.crc_errors = 0
        self.handled_packets = 0

    def add_bytes(self, data: bytes) -> None:
        """Feed one logical frame (24 ms) of decoded subchannel bytes; may
        contain several packets (msc-datagroup.cpp:221-231)."""
        pos = 0
        while pos + 2 <= len(data):
            plen = (((data[pos] >> 6) & 0x3) + 1) * 24
            if pos + plen > len(data):
                return
            self._packet(data[pos: pos + plen])
            pos += plen

    def _packet(self, pkt: bytes) -> None:
        self.handled_packets += 1
        first_last = (pkt[0] >> 2) & 0x3
        address = ((pkt[0] & 0x3) << 8) | pkt[1]
        useful = pkt[2] & 0x7F
        if not _packet_crc_ok(pkt):
            self.crc_errors += 1
            return
        if address == 0:
            return                      # padding packet
        if self._stream_address is None:
            self._stream_address = address
        if self._stream_address != address:
            return
        payload = pkt[3: 3 + useful]
        if not self._in_series:
            if first_last == 0b10:      # first of a series
                self._in_series = True
                self._series = bytearray(payload)
            elif first_last == 0b11:    # single-packet group
                self.on_datagroup(bytes(payload))
        else:
            if first_last == 0b00:      # intermediate
                self._series += payload
            elif first_last == 0b01:    # last
                self._series += payload
                self.on_datagroup(bytes(self._series))
                self._in_series = False
            elif first_last == 0b10:    # new first; drop broken series
                self._series = bytearray(payload)
            else:
                self._in_series = False

    @property
    def error_rate(self) -> float:
        if self.handled_packets == 0:
            return 0.0
        return self.crc_errors / self.handled_packets


def dispatch_for_dscty(dscty: int,
                       on_object: Optional[Callable[[MotObject], None]]
                       = None,
                       on_ip: Optional[Callable[[bytes], None]] = None):
    """Build (assembler, handler) for a packet service's DSCTy
    (msc-datagroup.cpp:68-85 dispatch)."""
    if dscty == DSCTY_MOT:
        mot = MotHandler(on_object=on_object)

        def handle(dg_bytes: bytes) -> None:
            dg = parse_datagroup(dg_bytes)
            if dg is None or dg.transport_id is None:
                return
            mot.process_msc_group(dg.payload, dg.group_type,
                                  dg.last_segment, dg.segment_number or 0,
                                  dg.transport_id)

        return PacketAssembler(handle), mot
    if dscty == DSCTY_IP:
        ip = IpHandler(on_payload=on_ip)
        return PacketAssembler(ip.add_datagroup), ip
    if dscty == DSCTY_JOURNALINE:
        jl = JournalineHandler()
        return PacketAssembler(jl.add_datagroup), jl
    # unknown DSCTy -> null handler (virtual-datahandler.cpp analog)
    return PacketAssembler(lambda dg: None), None


class PacketService:
    """Logical-frame adapter: decoded MSC bits -> packet stream -> handlers.

    The receiver-facing analog of the reference's ``mscDatagroup`` backend
    (sans the FEC, which the batched MSC pipeline already did).
    """

    def __init__(self, dscty: int,
                 on_object: Optional[Callable[[MotObject], None]] = None,
                 on_ip: Optional[Callable[[bytes], None]] = None,
                 fec_scheme: int = 0):
        self.dscty = dscty
        self.assembler, self.handler = dispatch_for_dscty(
            dscty, on_object=on_object, on_ip=on_ip)
        self.fec: Optional["FecFrameDecoder"] = None
        if fec_scheme == 1:                # FIG 0/14: RS(204,188) applied
            from dabjax.data.fec_frame import FecFrameDecoder
            self.fec = FecFrameDecoder(on_packet=self.assembler._packet)

    def add_logical_frame(self, bits) -> None:
        data = np.packbits(np.asarray(bits, np.uint8)).tobytes()
        if self.fec is None:
            self.assembler.add_bytes(data)
            return
        pos = 0                            # slice packets, FEC-correct first
        while pos + 2 <= len(data):
            plen = (((data[pos] >> 6) & 0x3) + 1) * 24
            if pos + plen > len(data):
                return
            self.fec.add_packet(data[pos: pos + plen])
            pos += plen

    @property
    def error_rate(self) -> float:
        return self.assembler.error_rate
