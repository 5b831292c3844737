"""Sample-rate conversion and native IQ format converters.

Covers the two device-side conversions of the reference's input layer:

* **linear-interpolation resampling** to 2.048 Msps for front-ends without
  a native 2048 kHz rate — the Airspy path builds per-block interpolation
  index/weight tables exactly like this
  (``src/input/airspy/airspy-handler.cpp:118-119,140-145,336-350``);
* **native sample format -> complex64** converters — the ExtIO handler's
  ``reader_16/24/32/float`` classes (``src/input/extio-handler/
  common-readers.h:12-39``) and each device's 8-bit path
  (``src/input/dabstick-osmo/dabstick.cpp`` u8 -> float).
"""

from __future__ import annotations

import numpy as np

__all__ = ["resample_linear", "iq_from_u8", "iq_from_i16", "iq_from_i24",
           "iq_from_f32", "iq_converter"]


def resample_linear(x: np.ndarray, rate_in: float, rate_out: float
                    ) -> np.ndarray:
    """Linear-interpolation resample of a complex block (stateless).

    Output sample k sits at input position k * rate_in / rate_out; the
    last fractional position is dropped (no history across blocks, like
    the reference's per-buffer mapTable).
    """
    if rate_in == rate_out:
        return x
    n_out = int(np.floor((x.shape[-1] - 1) * rate_out / rate_in))
    pos = np.arange(n_out) * (rate_in / rate_out)
    i0 = pos.astype(np.int64)
    frac = (pos - i0).astype(np.float32)
    return (x[..., i0] * (1.0 - frac) + x[..., i0 + 1] * frac).astype(
        x.dtype if np.iscomplexobj(x) else np.complex64)


def iq_from_u8(raw: bytes | np.ndarray) -> np.ndarray:
    """Interleaved unsigned-8 IQ (RTL-SDR native) -> complex64 in ~[-1,1]."""
    b = np.frombuffer(raw, np.uint8) if isinstance(raw, (bytes, bytearray)) \
        else np.asarray(raw, np.uint8)
    f = (b.astype(np.float32) - 128.0) / 128.0
    return (f[0::2] + 1j * f[1::2]).astype(np.complex64)


def iq_from_i16(raw: bytes | np.ndarray) -> np.ndarray:
    """Interleaved signed-16 IQ -> complex64 (ExtIO reader_16)."""
    b = np.frombuffer(raw, "<i2") if isinstance(raw, (bytes, bytearray)) \
        else np.asarray(raw, np.int16)
    f = b.astype(np.float32) / 32768.0
    return (f[0::2] + 1j * f[1::2]).astype(np.complex64)


def iq_from_i24(raw: bytes) -> np.ndarray:
    """Interleaved signed-24 (packed 3-byte LE) IQ -> complex64
    (ExtIO reader_24)."""
    b = np.frombuffer(raw, np.uint8).reshape(-1, 3).astype(np.uint32)
    v = (b[:, 0] | (b[:, 1] << 8) | (b[:, 2] << 16)).astype(np.int32)
    v = (v << 8) >> 8                      # sign-extend 24 -> 32
    f = v.astype(np.float32) / 8388608.0
    return (f[0::2] + 1j * f[1::2]).astype(np.complex64)


def iq_from_f32(raw: bytes | np.ndarray) -> np.ndarray:
    """Interleaved float32 IQ -> complex64 (ExtIO reader_float)."""
    f = np.frombuffer(raw, "<f4") if isinstance(raw, (bytes, bytearray)) \
        else np.asarray(raw, np.float32)
    return (f[0::2] + 1j * f[1::2]).astype(np.complex64)


def iq_converter(fmt: str):
    """Converter by name: 'u8' | 'i16' | 'i24' | 'f32'."""
    try:
        return {"u8": iq_from_u8, "i16": iq_from_i16,
                "i24": iq_from_i24, "f32": iq_from_f32}[fmt]
    except KeyError:
        raise ValueError(f"unknown IQ format {fmt!r}") from None
