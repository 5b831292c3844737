"""IP-over-DAB data handler (DSCTy 59) — ``ip-datahandler.cpp`` parity.

MSC data group -> IPv4 datagram: header checksum verify, UDP payload
delivered to a callback and optionally forwarded to a local UDP socket
(the reference forwards to localhost:8888 via the GUI's QUdpSocket,
``gui.cpp:1408-1412``).
"""

from __future__ import annotations

import socket
from typing import Callable, Optional, Tuple

from dabjax.data.group import parse_datagroup

__all__ = ["IpHandler", "ipv4_checksum_ok"]


def ipv4_checksum_ok(header: bytes) -> bool:
    """One's-complement sum over the IPv4 header must be 0xFFFF
    (ip-datahandler.cpp:100-111)."""
    s = 0
    for i in range(0, len(header) - 1, 2):
        s += (header[i] << 8) | header[i + 1]
    s = (s >> 16) + (s & 0xFFFF)
    s += s >> 16
    return (~s & 0xFFFF) == 0


class IpHandler:
    """Extracts UDP payloads from IP data groups."""

    def __init__(self, on_payload: Optional[Callable[[bytes], None]] = None,
                 forward: Optional[Tuple[str, int]] = None):
        self.on_payload = on_payload
        self.forward = forward
        self._sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM) \
            if forward else None
        self.crc_errors = 0
        self.handled = 0
        self.payloads: list = []

    def add_datagroup(self, dg_bytes: bytes) -> None:
        dg = parse_datagroup(dg_bytes)
        if dg is None:
            return
        self.process_ip(dg.payload)

    def process_ip(self, v: bytes) -> None:
        self.handled += 1
        if len(v) < 20 or (v[0] >> 4) != 4:
            return
        header_words = v[0] & 0x0F
        total_len = (v[2] << 8) | v[3]
        protocol = v[9]
        if not ipv4_checksum_ok(v[: 4 * header_words]):
            self.crc_errors += 1
            return
        if protocol != 17:              # UDP only, like the reference
            return
        udp = v[4 * header_words: total_len]
        if len(udp) < 8:
            return
        payload = udp[8:]
        self.payloads.append(payload)
        if self.on_payload is not None:
            self.on_payload(payload)
        if self._sock is not None:
            self._sock.sendto(payload, self.forward)
