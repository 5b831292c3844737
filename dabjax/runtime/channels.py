"""DAB channel plans: Band III and L-Band (gui.cpp:396-456 parity).

Frequencies in kHz, per the standard European channel raster.  Used by the
scan loop and by sources that model a tuner (a file source carries its own
center frequency; network/hardware sources tune with these).
"""

from __future__ import annotations

from typing import Dict, List, Optional

__all__ = ["BAND_III", "L_BAND", "frequency_khz", "channel_list"]

BAND_III: Dict[str, int] = {
    "5A": 174928, "5B": 176640, "5C": 178352, "5D": 180064,
    "6A": 181936, "6B": 183648, "6C": 185360, "6D": 187072,
    "7A": 188928, "7B": 190640, "7C": 192352, "7D": 194064,
    "8A": 195936, "8B": 197648, "8C": 199360, "8D": 201072,
    "9A": 202928, "9B": 204640, "9C": 206352, "9D": 208064,
    "10A": 209936, "10B": 211648, "10C": 213360, "10D": 215072,
    "11A": 216928, "11B": 218640, "11C": 220352, "11D": 222064,
    "12A": 223936, "12B": 225648, "12C": 227360, "12D": 229072,
    "13A": 230748, "13B": 232496, "13C": 234208, "13D": 235776,
    "13E": 237488, "13F": 239200,
}

L_BAND: Dict[str, int] = {
    f"L{c}": 1452960 + 1712 * i
    for i, c in enumerate("ABCDEFGHIJKLMNOP")
}


def frequency_khz(channel: str) -> Optional[int]:
    return BAND_III.get(channel) or L_BAND.get(channel)


def channel_list(band: str = "III") -> List[str]:
    return list(BAND_III if band == "III" else L_BAND)
