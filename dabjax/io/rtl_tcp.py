"""rtl_tcp network IQ source — the reference's rtl_tcp client analog
(``src/input/rtl_tcp/rtl_tcp_client.h:44-60``).

Speaks the rtl_tcp wire protocol: a 12-byte "RTL0" banner from the server,
then a raw 8-bit unsigned IQ stream; the client sends 5-byte commands
(1-byte opcode + 32-bit big-endian argument) to tune.
"""

from __future__ import annotations

import socket
import struct
from typing import Optional

import numpy as np

__all__ = ["RtlTcpSource"]

CMD_SET_FREQ = 0x01
CMD_SET_RATE = 0x02
CMD_SET_GAIN_MODE = 0x03
CMD_SET_GAIN = 0x04
CMD_SET_FREQ_CORR = 0x05
CMD_SET_AGC = 0x08


class RtlTcpSource:
    """IQ samples over TCP from an rtl_tcp server."""

    sample_rate = 2_048_000

    def __init__(self, host: str, port: int = 1234,
                 frequency_hz: Optional[int] = None,
                 gain_tenth_db: Optional[int] = None,
                 timeout: float = 5.0):
        self._sock = socket.create_connection((host, port), timeout=timeout)
        banner = self._recv_exact(12)
        if banner[:4] != b"RTL0":
            raise IOError(f"not an rtl_tcp server (banner {banner[:4]!r})")
        self.tuner_type = struct.unpack(">I", banner[4:8])[0]
        self.tuner_gain_count = struct.unpack(">I", banner[8:12])[0]
        self._cmd(CMD_SET_RATE, self.sample_rate)
        if gain_tenth_db is None:
            self._cmd(CMD_SET_GAIN_MODE, 0)      # auto
        else:
            self._cmd(CMD_SET_GAIN_MODE, 1)
            self._cmd(CMD_SET_GAIN, gain_tenth_db)
        if frequency_hz is not None:
            self.set_frequency(frequency_hz)

    def _cmd(self, op: int, arg: int) -> None:
        self._sock.sendall(struct.pack(">BI", op, arg & 0xFFFFFFFF))

    def _recv_exact(self, n: int) -> bytes:
        buf = b""
        while len(buf) < n:
            chunk = self._sock.recv(n - len(buf))
            if not chunk:
                raise IOError("rtl_tcp connection closed")
            buf += chunk
        return buf

    def set_frequency(self, hz: int) -> None:
        self._cmd(CMD_SET_FREQ, hz)

    def set_freq_correction(self, ppm: int) -> None:
        self._cmd(CMD_SET_FREQ_CORR, ppm)

    def read(self, n: int) -> np.ndarray:
        raw = self._recv_exact(2 * n)
        x = (np.frombuffer(raw, np.uint8).astype(np.float32) - 128.0) / 128.0
        return (x[0::2] + 1j * x[1::2]).astype(np.complex64)

    def close(self) -> None:
        self._sock.close()
