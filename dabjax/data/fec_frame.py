"""MSC packet-mode FEC (EN 300 401 §5.3.5, signalled by FIG 0/14).

When a packet service uses ``fec_scheme == 1``, the packet stream is
organized in **FEC frames**: an application data table of 12 rows x 188
columns (2256 bytes) is filled with transmitted packets column by
column; each row is protected by RS(204,188) (gfpoly 0x11D, fcr 0 — the
same field as the DAB+ superframe code); the 12 x 16 = 192 parity bytes
are read out of the RS data table column by column and carried in nine
special *FEC packets* (packet address 0x3FE, 2-byte header carrying a
4-bit counter, 22 payload bytes, last two bytes padding).

The reference receiver parses the FEC scheme (``fib-processor.cpp:
688-705``) and ships two unwired RS codecs intended for this layer
(``src/backend/audio/rscodec.cpp``, ``src/backend/reed-solomon.cpp``);
dabjax completes the path: :class:`FecFrameEncoder` produces the
on-air packet stream for fixtures, :class:`FecFrameDecoder` corrects up
to 8 byte errors per row before the packets reach the CRC gate.
"""

from __future__ import annotations

from typing import Callable, List, Optional

import numpy as np

from dabjax.fec.rs import rs_decode_batch, rs_encode

__all__ = ["FEC_PACKET_ADDRESS", "FecFrameEncoder", "FecFrameDecoder"]

FEC_PACKET_ADDRESS = 0x3FE      # 1022: reserved for FEC packets
_ROWS = 12
_COLS = 188
_APP_BYTES = _ROWS * _COLS      # 2256
_PARITY = _ROWS * 16            # 192
_FEC_PACKETS = 9
_FEC_PAYLOAD = 22


class FecFrameEncoder:
    """Transmitter side: data packets -> packets + interleaved FEC packets.

    ``add_packets`` accepts whole 24/48/72/96-byte packets; once 2256
    bytes accumulate, the nine FEC packets for that frame are appended.
    """

    def __init__(self):
        self._buf = bytearray()
        self._out: List[bytes] = []
        self._counter = 0

    def add_packet(self, pkt: bytes) -> None:
        self._out.append(bytes(pkt))
        self._buf.extend(pkt)
        while len(self._buf) >= _APP_BYTES:
            frame = bytes(self._buf[:_APP_BYTES])
            del self._buf[:_APP_BYTES]
            self._out.extend(self._fec_packets(frame))

    def take(self) -> List[bytes]:
        out, self._out = self._out, []
        return out

    def _fec_packets(self, app: bytes) -> List[bytes]:
        # column-wise fill: table[r, c] = app[c*12 + r]
        table = np.frombuffer(app, np.uint8).reshape(_COLS, _ROWS).T
        cw = rs_encode(table, 204, 188)            # [12, 204]
        parity = cw[:, 188:]                       # [12, 16]
        pbytes = parity.T.reshape(-1)              # column-wise readout
        pkts = []
        for i in range(_FEC_PACKETS):
            payload = pbytes[i * _FEC_PAYLOAD: (i + 1) * _FEC_PAYLOAD]
            payload = np.pad(payload, (0, _FEC_PAYLOAD - payload.shape[0]))
            # header: packet length 24 (code 0), counter, address 0x3FE
            hdr = (0 << 14) | (i << 10) | FEC_PACKET_ADDRESS
            pkts.append(bytes([hdr >> 8, hdr & 0xFF]) + payload.tobytes())
        return pkts


class FecFrameDecoder:
    """Receiver side: reassembles the FEC frame, RS-corrects each row and
    hands the corrected data packets to ``on_packet``.

    Feed it every raw 24..96-byte packet *before* CRC checking; FEC
    packets (address 0x3FE) are consumed, data packets are buffered until
    the frame's parity arrives (or passed through uncorrected when the
    stream carries no FEC packets).
    """

    def __init__(self, on_packet: Callable[[bytes], None]):
        self.on_packet = on_packet
        self._app = bytearray()
        self._pkts: List[bytes] = []
        self._carry = 0      # leading bytes of _app owned by a packet that
        #                      straddled the previous frame boundary
        self._parity = np.zeros((_FEC_PACKETS, _FEC_PAYLOAD), np.uint8)
        self._have = np.zeros(_FEC_PACKETS, bool)
        self.rows_corrected = 0
        self.rows_failed = 0
        self.frames = 0

    def add_packet(self, pkt: bytes) -> None:
        if len(pkt) < 2:
            return
        address = ((pkt[0] << 8) | pkt[1]) & 0x3FF
        if address == FEC_PACKET_ADDRESS:
            counter = (pkt[0] >> 2) & 0x0F
            if counter < _FEC_PACKETS and len(pkt) >= 2 + _FEC_PAYLOAD:
                self._parity[counter] = np.frombuffer(
                    pkt[2: 2 + _FEC_PAYLOAD], np.uint8)
                self._have[counter] = True
            if self._have.all():
                self._flush()
            return
        self._pkts.append(bytes(pkt))
        self._app.extend(pkt)
        # A frame's FEC packets follow right after the data that fills it
        # (a packet may straddle the boundary); only a full extra frame of
        # data with no parity means the stream carries no FEC packets.
        if len(self._app) >= 2 * _APP_BYTES:   # lost FEC packets: pass thru
            self._passthrough()

    def _passthrough(self) -> None:
        for q in self._pkts:
            self.on_packet(q)
        self._pkts.clear()
        self._app.clear()
        self._carry = 0
        self._have[:] = False

    def _flush(self) -> None:
        app = bytes(self._app[:_APP_BYTES])
        if len(app) < _APP_BYTES:
            app = app + bytes(_APP_BYTES - len(app))
        table = np.frombuffer(app, np.uint8).reshape(_COLS, _ROWS).T.copy()
        pbytes = self._parity.reshape(-1)[:_PARITY]
        parity = pbytes.reshape(16, _ROWS).T
        cw = np.concatenate([table, parity], axis=1)   # [12, 204]
        data, ncorr = rs_decode_batch(cw, 204, 188)
        self.frames += 1
        self.rows_corrected += int((ncorr > 0).sum())
        self.rows_failed += int((ncorr < 0).sum())
        fixed = data.T.reshape(-1).tobytes()           # column-wise readback
        # re-slice into the original packet lengths; the first _carry bytes
        # belong to a packet that straddled the previous frame (already
        # delivered uncorrected), and a packet straddling THIS frame's end
        # is delivered uncorrected now and skipped next time via _carry.
        off = self._carry
        new_carry = 0
        for q in self._pkts:
            ln = len(q)
            if off + ln <= _APP_BYTES:
                self.on_packet(fixed[off: off + ln])
            else:
                self.on_packet(q)
                new_carry = off + ln - _APP_BYTES
            off += ln
        self._pkts.clear()
        self._carry = new_carry
        del self._app[:_APP_BYTES]
        self._have[:] = False
