"""SDR hardware front-ends (the reference's L0 input-device layer).

Each device binds its vendor library at runtime with ``ctypes`` — the
same late-binding strategy as the reference, which ``dlopen``s librtlsdr
(``src/input/dabstick-osmo/dabstick.h:42-66``), mir_sdr
(``src/input/sdrplay/sdrplay-loader.cpp``) and libairspy
(``src/input/airspy/airspy-handler.cpp``) — and degrades to
:class:`DeviceUnavailable` when the library or hardware is absent, the
analog of the reference's fallback to the null device
(``gui.cpp:1062-1071``).

All sources present the same pull interface as the file sources
(``read(n) -> complex64``) plus the virtualInput control surface
(``src/input/virtual-input.h:51-70``): set_frequency / set_gain /
start / stop / bit_depth.  An async callback thread fills a ring
buffer; ``read`` drains it — the device-thread -> ofdmProcessor handoff
of SURVEY.md §1 collapsed into one queue.
"""

from __future__ import annotations

import ctypes
import ctypes.util
import threading
from collections import deque
from typing import Optional

import numpy as np

from dabjax.io.resample import iq_from_u8, resample_linear

__all__ = ["DeviceUnavailable", "RingQueue", "RtlSdrSource", "AirspySource",
           "SdrplaySource", "UhdSource", "INPUT_RATE"]

INPUT_RATE = 2_048_000


class DeviceUnavailable(RuntimeError):
    """Vendor library or hardware not present."""


class RingQueue:
    """Thread-safe bounded IQ queue between a device callback thread and
    the consumer (the RingBuffer handoff of SURVEY.md §1)."""

    def __init__(self, capacity: int = 8 * INPUT_RATE):
        self._dq: deque = deque()
        self._count = 0
        self._capacity = capacity
        self._cv = threading.Condition()
        self.overruns = 0

    def push(self, chunk: np.ndarray) -> None:
        with self._cv:
            if self._count + chunk.shape[0] > self._capacity:
                self.overruns += 1
                return                     # drop, like a full ring buffer
            self._dq.append(chunk)
            self._count += chunk.shape[0]
            self._cv.notify()

    def pop(self, n: int, timeout: float = 2.0) -> np.ndarray:
        out = np.empty(n, np.complex64)
        got = 0
        with self._cv:
            while got < n:
                if not self._dq:
                    if not self._cv.wait(timeout):
                        break
                    continue
                head = self._dq[0]
                take = min(n - got, head.shape[0])
                out[got: got + take] = head[:take]
                if take == head.shape[0]:
                    self._dq.popleft()
                else:
                    self._dq[0] = head[take:]
                self._count -= take
                got += take
        return out[:got]

    @property
    def level(self) -> int:
        return self._count


def _load_lib(*names: str) -> ctypes.CDLL:
    for name in names:
        path = ctypes.util.find_library(name)
        if path:
            try:
                return ctypes.CDLL(path)
            except OSError:
                continue
        for candidate in (f"lib{name}.so", f"lib{name}.so.0",
                          f"lib{name}.so.2"):
            try:
                return ctypes.CDLL(candidate)
            except OSError:
                continue
    raise DeviceUnavailable(f"none of {names} found")


class RtlSdrSource:
    """RTL-SDR USB stick ("dabstick") via librtlsdr.

    Mirrors ``src/input/dabstick-osmo/dabstick.cpp``: async u8 read
    callback on a worker thread, tuner gain table, ppm correction and a
    kHz tuning offset.
    """

    bit_depth = 8

    def __init__(self, frequency_hz: int = 0, gain_db: Optional[float] = None,
                 ppm: int = 0, khz_offset: int = 0, device_index: int = 0):
        self._lib = _load_lib("rtlsdr")
        lib = self._lib
        lib.rtlsdr_open.argtypes = [ctypes.POINTER(ctypes.c_void_p),
                                    ctypes.c_uint32]
        self._dev = ctypes.c_void_p()
        if lib.rtlsdr_get_device_count() == 0:
            raise DeviceUnavailable("no RTL-SDR device attached")
        if lib.rtlsdr_open(ctypes.byref(self._dev), device_index) != 0:
            raise DeviceUnavailable("rtlsdr_open failed")
        self._khz_offset = khz_offset
        lib.rtlsdr_set_sample_rate(self._dev, INPUT_RATE)
        if ppm:
            lib.rtlsdr_set_freq_correction(self._dev, ppm)
        if gain_db is None:
            lib.rtlsdr_set_tuner_gain_mode(self._dev, 0)     # AGC
        else:
            lib.rtlsdr_set_tuner_gain_mode(self._dev, 1)
            lib.rtlsdr_set_tuner_gain(self._dev, int(gain_db * 10))
        if frequency_hz:
            self.set_frequency(frequency_hz)
        self._queue = RingQueue()
        self._thread: Optional[threading.Thread] = None
        self._running = False

    def gains(self) -> list:
        """Supported tuner gains in dB (the gain combobox contents)."""
        n = self._lib.rtlsdr_get_tuner_gains(self._dev, None)
        buf = (ctypes.c_int * max(n, 1))()
        self._lib.rtlsdr_get_tuner_gains(self._dev, buf)
        return [v / 10.0 for v in buf[:n]]

    def set_frequency(self, hz: int) -> None:
        self._lib.rtlsdr_set_center_freq(
            self._dev, int(hz) + self._khz_offset * 1000)

    def start(self) -> None:
        if self._running:
            return
        self._running = True
        lib = self._lib
        lib.rtlsdr_reset_buffer(self._dev)
        CB = ctypes.CFUNCTYPE(None, ctypes.POINTER(ctypes.c_ubyte),
                              ctypes.c_uint32, ctypes.c_void_p)

        def cb(buf, length, _ctx):
            raw = ctypes.string_at(buf, length)
            self._queue.push(iq_from_u8(raw))

        self._cb = CB(cb)                      # keep a reference

        def run():
            lib.rtlsdr_read_async(self._dev, self._cb, None, 0, 0)

        self._thread = threading.Thread(target=run, daemon=True)
        self._thread.start()

    def stop(self) -> None:
        if self._running:
            self._running = False
            self._lib.rtlsdr_cancel_async(self._dev)
            if self._thread:
                self._thread.join(timeout=2.0)

    def read(self, n: int) -> np.ndarray:
        if not self._running:
            self.start()
        return self._queue.pop(n)

    def close(self) -> None:
        self.stop()
        self._lib.rtlsdr_close(self._dev)


class AirspySource:
    """Airspy via libairspy: picks the native rate closest to 2048 kHz and
    linear-resamples (``airspy-handler.cpp:118-119,140-145,336-350``)."""

    bit_depth = 12

    def __init__(self, frequency_hz: int = 0, linearity_gain: int = 16):
        self._lib = _load_lib("airspy")
        lib = self._lib
        self._dev = ctypes.c_void_p()
        if lib.airspy_open(ctypes.byref(self._dev)) != 0:
            raise DeviceUnavailable("airspy_open failed")
        # native samplerates
        n = ctypes.c_uint32()
        lib.airspy_get_samplerates(self._dev, ctypes.byref(n), 0)
        rates = (ctypes.c_uint32 * n.value)()
        lib.airspy_get_samplerates(self._dev, rates, n)
        self._rate = min((int(r) for r in rates),
                         key=lambda r: abs(r - INPUT_RATE),
                         default=INPUT_RATE)
        lib.airspy_set_samplerate(self._dev, self._rate)
        lib.airspy_set_sample_type(self._dev, 0)     # AIRSPY_SAMPLE_FLOAT32_IQ
        lib.airspy_set_linearity_gain(self._dev, linearity_gain)
        if frequency_hz:
            self.set_frequency(frequency_hz)
        self._queue = RingQueue()
        self._running = False

    def set_frequency(self, hz: int) -> None:
        self._lib.airspy_set_freq(self._dev, int(hz))

    def start(self) -> None:
        if self._running:
            return
        self._running = True
        lib = self._lib

        class Transfer(ctypes.Structure):
            _fields_ = [("device", ctypes.c_void_p),
                        ("ctx", ctypes.c_void_p),
                        ("samples", ctypes.c_void_p),
                        ("sample_count", ctypes.c_int),
                        ("dropped_samples", ctypes.c_uint64),
                        ("sample_type", ctypes.c_int)]

        CB = ctypes.CFUNCTYPE(ctypes.c_int, ctypes.POINTER(Transfer))

        def cb(tp):
            t = tp.contents
            raw = ctypes.string_at(t.samples, t.sample_count * 8)
            x = np.frombuffer(raw, np.float32)
            iq = (x[0::2] + 1j * x[1::2]).astype(np.complex64)
            self._queue.push(resample_linear(iq, self._rate, INPUT_RATE))
            return 0

        self._cb = CB(cb)
        lib.airspy_start_rx(self._dev, self._cb, None)

    def stop(self) -> None:
        if self._running:
            self._running = False
            self._lib.airspy_stop_rx(self._dev)

    def read(self, n: int) -> np.ndarray:
        if not self._running:
            self.start()
        return self._queue.pop(n)

    def close(self) -> None:
        self.stop()
        self._lib.airspy_close(self._dev)


class SdrplaySource:
    """SDRplay RSP via the mir_sdr API (``src/input/sdrplay/``): worker
    reads i16 IQ blocks at 2048 kHz, gain-reduction control."""

    bit_depth = 12

    def __init__(self, frequency_hz: int = 0, gain_reduction: int = 40):
        self._lib = _load_lib("mirsdrapi-rsp", "mir_sdr_api")
        lib = self._lib
        # mir_sdr_Init(gRdB, fsMHz, rfMHz, bwType, ifType, int* sps)
        # per sdrplay-loader.h:48 / sdrplay-worker.cpp:74 — bwType 1536
        # (mir_sdr_BW_1_536), ifType 0 (mir_sdr_IF_Zero).
        lib.mir_sdr_Init.argtypes = [ctypes.c_int, ctypes.c_double,
                                     ctypes.c_double, ctypes.c_int,
                                     ctypes.c_int,
                                     ctypes.POINTER(ctypes.c_int)]
        self._gr = gain_reduction
        self._freq_mhz = frequency_hz / 1e6 if frequency_hz else 220.0
        sps = ctypes.c_int()
        r = lib.mir_sdr_Init(self._gr, 2.048, self._freq_mhz,
                             1536, 0, ctypes.byref(sps))
        if r != 0:
            raise DeviceUnavailable(f"mir_sdr_Init failed ({r})")
        self._sps = sps.value
        self._queue = RingQueue()
        self._running = False
        self._thread: Optional[threading.Thread] = None

    def set_frequency(self, hz: int) -> None:
        self._lib.mir_sdr_SetRf(ctypes.c_double(float(hz)), 1, 0)

    def set_gain_reduction(self, gr: int) -> None:
        self._gr = gr
        self._lib.mir_sdr_SetGr(gr, 1, 0)

    def start(self) -> None:
        if self._running:
            return
        self._running = True
        lib = self._lib
        sps = self._sps

        def run():
            xi = (ctypes.c_short * sps)()
            xq = (ctypes.c_short * sps)()
            fs = ctypes.c_uint()
            grc = ctypes.c_int()
            rfc = ctypes.c_int()
            fsc = ctypes.c_int()
            while self._running:
                r = lib.mir_sdr_ReadPacket(
                    xi, xq, ctypes.byref(fs), ctypes.byref(grc),
                    ctypes.byref(rfc), ctypes.byref(fsc))
                if r != 0:
                    break
                i = np.frombuffer(xi, np.int16).astype(np.float32)
                q = np.frombuffer(xq, np.int16).astype(np.float32)
                self._queue.push(((i + 1j * q) / 2048.0).astype(np.complex64))

        self._thread = threading.Thread(target=run, daemon=True)
        self._thread.start()

    def stop(self) -> None:
        self._running = False
        if self._thread:
            self._thread.join(timeout=2.0)

    def read(self, n: int) -> np.ndarray:
        if not self._running:
            self.start()
        return self._queue.pop(n)

    def close(self) -> None:
        self.stop()
        self._lib.mir_sdr_Uninit()


class UhdSource:
    """USRP via the UHD Python API (``src/input/uhd/uhd-input.cpp``)."""

    bit_depth = 14

    def __init__(self, frequency_hz: int = 0, gain_db: float = 40.0,
                 args: str = ""):
        try:
            import uhd  # type: ignore
        except ImportError as e:
            raise DeviceUnavailable("uhd python module not installed") from e
        self._usrp = uhd.usrp.MultiUSRP(args)
        self._usrp.set_rx_rate(INPUT_RATE)
        self._usrp.set_rx_gain(gain_db)
        if frequency_hz:
            self.set_frequency(frequency_hz)
        self._streamer = None
        self._uhd = uhd

    def set_frequency(self, hz: int) -> None:
        import uhd
        # Python MultiUSRP mirrors C++ set_rx_freq (uhd-input.cpp:175);
        # there is no set_rx_center_freq in the uhd Python API.
        self._usrp.set_rx_freq(uhd.types.TuneRequest(float(hz)), 0)

    def read(self, n: int) -> np.ndarray:
        uhd = self._uhd
        if self._streamer is None:
            st_args = uhd.usrp.StreamArgs("fc32", "sc16")
            self._streamer = self._usrp.get_rx_stream(st_args)
            cmd = uhd.types.StreamCMD(uhd.types.StreamMode.start_cont)
            cmd.stream_now = True
            self._streamer.issue_stream_cmd(cmd)
        out = np.empty((1, n), np.complex64)
        md = uhd.types.RXMetadata()
        got = 0
        while got < n:
            got += self._streamer.recv(out[:, got:], md)
        return out[0]

    def close(self) -> None:
        if self._streamer is not None:
            import uhd
            self._streamer.issue_stream_cmd(
                uhd.types.StreamCMD(uhd.types.StreamMode.stop_cont))
            self._streamer = None
