"""ctypes binding to the native IO plane (dabjax/native/dabjax_io.cc).

``NativeFileSource`` implements the Source protocol with a C++ producer
thread + lock-free ring buffer — the architecture of the reference's
device layer (SURVEY.md §2.3), replacing its per-device callback threads.
The library is built on demand with ``make`` (g++ is in the image); the
pure-Python sources remain the fallback when no compiler is available.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

__all__ = ["native_available", "NativeFileSource", "build_native"]

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "native")
_LIB_PATH = os.path.abspath(os.path.join(_NATIVE_DIR, "libdabjax_io.so"))

FORMAT_U8 = 0
FORMAT_S16 = 1
FORMAT_F32 = 2

_lib: Optional[ctypes.CDLL] = None


def build_native() -> bool:
    """Compile the native library if missing; returns availability."""
    if os.path.exists(_LIB_PATH):
        return True
    try:
        subprocess.run(["make", "-C", os.path.abspath(_NATIVE_DIR)],
                       check=True, capture_output=True, timeout=120)
    except Exception:
        return False
    return os.path.exists(_LIB_PATH)


def _load() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    if not build_native():
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    lib.dabjax_feeder_open.restype = ctypes.c_void_p
    lib.dabjax_feeder_open.argtypes = [ctypes.c_char_p, ctypes.c_int,
                                       ctypes.c_size_t, ctypes.c_int]
    lib.dabjax_feeder_from_fd.restype = ctypes.c_void_p
    lib.dabjax_feeder_from_fd.argtypes = [ctypes.c_int, ctypes.c_int,
                                          ctypes.c_size_t]
    lib.dabjax_feeder_read.restype = ctypes.c_size_t
    lib.dabjax_feeder_read.argtypes = [ctypes.c_void_p,
                                       ctypes.POINTER(ctypes.c_float),
                                       ctypes.c_size_t]
    lib.dabjax_feeder_available.restype = ctypes.c_size_t
    lib.dabjax_feeder_available.argtypes = [ctypes.c_void_p]
    lib.dabjax_feeder_eof.restype = ctypes.c_int
    lib.dabjax_feeder_eof.argtypes = [ctypes.c_void_p]
    lib.dabjax_feeder_close.argtypes = [ctypes.c_void_p]
    _lib = lib
    return lib


def native_available() -> bool:
    return _load() is not None


class NativeFileSource:
    """File-replay source backed by the C++ feeder thread.

    ``fmt``: FORMAT_U8 (rawfiles .raw), FORMAT_S16, or FORMAT_F32
    (interleaved complex float, e.g. .sdr payloads extracted to .cf32).
    """

    sample_rate = 2_048_000

    def __init__(self, path: str, fmt: int = FORMAT_U8, loop: bool = False,
                 ring_samples: int = 1 << 22):
        lib = _load()
        if lib is None:
            raise RuntimeError("native IO library unavailable (no g++?)")
        self._lib = lib
        self._h = lib.dabjax_feeder_open(path.encode(), fmt, ring_samples,
                                         1 if loop else 0)
        if not self._h:
            raise FileNotFoundError(path)

    def read(self, n: int) -> np.ndarray:
        buf = np.empty(2 * n, np.float32)
        total = 0
        ptr_t = ctypes.POINTER(ctypes.c_float)
        while total < n:
            p = buf[2 * total:].ctypes.data_as(ptr_t)
            got = self._lib.dabjax_feeder_read(self._h, p, n - total)
            total += got
            if got == 0:
                if self._lib.dabjax_feeder_eof(self._h):
                    break
        out = buf[: 2 * total]
        return (out[0::2] + 1j * out[1::2]).astype(np.complex64)

    def close(self) -> None:
        if getattr(self, "_h", None):
            self._lib.dabjax_feeder_close(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
