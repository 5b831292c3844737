"""ExtIO DLL transport host (the Winrad/HDSDR plug-in device API).

The reference wraps an ExtIO DLL as an input device
(``src/input/extio-handler/extio-handler.cpp``): load the library,
resolve the fixed entry points (InitHW / SetCallback / OpenHW / GetHWSR /
SetHWLO / StartHW / StopHW / CloseHW, :248-300), register a C callback
that receives sample blocks, and convert them with a hardware-type
format reader (``common-readers.h:12-39``: 16/24/32-bit ints or float).

dabjax's host keeps the same shape but splits transport from policy:

* :class:`ExtIOSource` — the device protocol (init -> callback -> start,
  rate check, LO tuning, ring-buffer handoff, resample-to-2.048M), with
  the DLL entry points abstracted behind a tiny ``loader``;
* :func:`dll_loader` — the real ctypes binding (``WinDLL`` on Windows —
  ExtIO DLLs are __stdcall x86 Windows binaries — ``CDLL`` for the rare
  Linux .so builds).

The split exists because ExtIO hardware DLLs are Windows-only: on this
(Linux) target the ctypes path can only be smoke-tested for symbol
resolution, while the full protocol (callback reentry, format decode,
rate adaptation) is exercised by tests through a fake loader
(tests/test_io_devices.py).
"""

from __future__ import annotations

import ctypes
import sys
from typing import Callable, Optional

import numpy as np

from dabjax.constants import INPUT_RATE
from dabjax.io.devices import DeviceUnavailable, RingQueue
from dabjax.io.resample import iq_converter, resample_linear

__all__ = ["ExtIOSource", "dll_loader", "HWTYPE_FORMATS"]

#: ExtIO hardware types -> sample format (extio-handler.h / the reader
#: dispatch at extio-handler.cpp:201-225).  Only the USB-data types are
#: supported, exactly like the reference.
HWTYPE_FORMATS = {
    3: "i16",     # exthwUSBdata16
    5: "i24",     # exthwUSBdata24
    6: "i32",     # exthwUSBdata32 (s32 ints; scaled like i16 below)
    7: "f32",     # exthwUSBfloat32
}

#: extio callback status codes < 0 carry sample data (cnt >= 0)
_CALLBACK_PROTO = ctypes.CFUNCTYPE(None, ctypes.c_int, ctypes.c_int,
                                   ctypes.c_float, ctypes.c_void_p)


def dll_loader(path: str):
    """Bind a real ExtIO DLL's entry points with ctypes.

    Returns an object with InitHW/OpenHW/StartHW/StopHW/CloseHW/GetHWSR/
    SetHWLO/SetCallback attributes (the loadFunctions() analog,
    extio-handler.cpp:246-300).  Raises DeviceUnavailable when the
    library or a mandatory symbol is missing.
    """
    try:
        lib = (ctypes.WinDLL(path) if sys.platform == "win32"  # stdcall
               else ctypes.CDLL(path))
    except OSError as e:
        raise DeviceUnavailable(f"ExtIO library {path!r}: {e}") from None

    class _Loader:
        pass

    out = _Loader()
    for sym in ("InitHW", "OpenHW", "StartHW", "StopHW", "CloseHW",
                "GetHWSR", "SetCallback"):
        try:
            setattr(out, sym, getattr(lib, sym))
        except AttributeError:
            raise DeviceUnavailable(
                f"ExtIO DLL lacks mandatory symbol {sym}") from None
    out.SetHWLO = getattr(lib, "SetHWLO", None)   # optional in the API
    out._lib = lib
    return out


class ExtIOSource:
    """IQ source over an ExtIO plug-in (extio-handler.cpp semantics).

    ``loader``: either a path to the DLL (bound via :func:`dll_loader`)
    or an already-bound loader object (tests inject a fake here).
    """

    sample_rate = INPUT_RATE

    def __init__(self, loader, frequency_hz: int = 227_360_000):
        self._l = dll_loader(loader) if isinstance(loader, str) else loader
        name = ctypes.create_string_buffer(128)
        model = ctypes.create_string_buffer(128)
        hwtype = ctypes.c_int(0)
        if not self._l.InitHW(name, model, ctypes.byref(hwtype)):
            raise DeviceUnavailable("ExtIO InitHW failed")
        self.rig_name = name.value.decode(errors="replace")
        self.hwtype = int(hwtype.value)
        fmt = HWTYPE_FORMATS.get(self.hwtype)
        if fmt is None:   # exthwNone/SDRX/HPSDR/...: same reject as ref
            raise DeviceUnavailable(
                f"ExtIO hardware type {self.hwtype} not supported")
        self._convert = (iq_converter(fmt) if fmt != "i32"
                         else self._iq_from_i32)
        # keep a reference: ctypes callbacks must outlive the DLL's use
        self._cb = _CALLBACK_PROTO(self._callback)
        self._l.SetCallback(self._cb)
        if not self._l.OpenHW():
            raise DeviceUnavailable("ExtIO OpenHW failed")
        self.input_rate = int(self._l.GetHWSR())
        # same constraint as extio-handler.cpp:192-197
        if self.input_rate < 2_000_000 or self.input_rate % 1000:
            raise DeviceUnavailable(
                f"cannot handle ExtIO rate {self.input_rate}")
        self._queue = RingQueue()
        if self._l.SetHWLO is not None:
            self._l.SetHWLO(ctypes.c_long(int(frequency_hz)))
        self._l.StartHW(ctypes.c_long(int(frequency_hz)))
        self._running = True

    # ------------------------------------------------------------ callback

    @staticmethod
    def _iq_from_i32(raw: bytes) -> np.ndarray:
        x = np.frombuffer(raw, "<i4").astype(np.float32) / 2147483648.0
        return (x[0::2] + 1j * x[1::2]).astype(np.complex64)

    def _callback(self, cnt: int, status: int, iq_offs: float, data):
        """extioCallback analog (extio-handler.cpp:58-100): cnt >= 0
        carries cnt IQ *frames*; negative cnt signals status changes."""
        if cnt < 0 or not data:
            return
        bytes_per = {"i16": 4, "i24": 6, "i32": 8, "f32": 8}[
            "i32" if self.hwtype == 6 else HWTYPE_FORMATS[self.hwtype]]
        raw = ctypes.string_at(data, cnt * bytes_per)
        self._queue.push(self._convert(raw))

    # -------------------------------------------------------------- source

    def read(self, n: int) -> np.ndarray:
        """n samples at 2.048 Msps (resampled from the device rate, the
        virtual-reader convert_ path of virtual-reader.cpp:60-106)."""
        if self.input_rate == INPUT_RATE:
            return self._queue.pop(n)
        need = int(np.ceil(n * self.input_rate / INPUT_RATE)) + 2
        raw = self._queue.pop(need)
        out = resample_linear(raw, self.input_rate, INPUT_RATE)
        return out[:n]

    def set_frequency(self, hz: int) -> None:
        if self._l.SetHWLO is not None:
            self._l.SetHWLO(ctypes.c_long(int(hz)))

    def close(self) -> None:
        if self._running:
            self._l.StopHW()
            self._l.CloseHW()
            self._running = False
