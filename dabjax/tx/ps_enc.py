"""Parametric Stereo bitstream writer (test fixtures).

Emits ps_data (ISO/IEC 14496-3 Table 8.11) for embedding in the SBR
extension (EXTENSION_ID_PS) via ``SbrWriter.sce_payload(ps_bits=...)``.
The companion decoder is dabjax/audio/ps.py; fixtures are cross-checked
against libavcodec's HE-AACv2 float decoder in tests/test_ps.py.
Nothing like this exists in the reference (it only decodes, via
libfaad, faad-decoder.h:78-165) or in common encoders.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import numpy as np

from dabjax.audio import _ps_tables as PT

_NR_PAR_TAB = (10, 20, 34, 10, 20, 34)
_NUM_ENV_TAB = ((0, 1, 2, 4), (1, 2, 3, 4))


def _enc(bits: List[int], v: int, n: int) -> None:
    for i in range(n - 1, -1, -1):
        bits.append((v >> i) & 1)


def _put_code(bits: List[int], codes, lens, idx: int) -> None:
    _enc(bits, int(codes[idx]), int(lens[idx]))


def _write_pars(bits, rows, prev_last, codes, lens, offset, wrap=False):
    """Freq-differential (dt=0) encoding of each envelope row."""
    for row in rows:
        bits.append(0)                   # dt = 0 (df coding)
        last = 0
        for v in row:
            delta = (int(v) - last)
            if wrap:
                delta &= 7
                if delta > 4:
                    delta -= 8           # shortest wrapped delta
            _put_code(bits, codes, lens, delta + offset)
            last = int(v)


def ps_data_bits(iid: Optional[Sequence[np.ndarray]] = None,
                 icc: Optional[Sequence[np.ndarray]] = None,
                 iid_mode: int = 1, icc_mode: int = 1,
                 frame_class: int = 0,
                 borders: Optional[Sequence[int]] = None,
                 ipd: Optional[Sequence[np.ndarray]] = None,
                 opd: Optional[Sequence[np.ndarray]] = None,
                 send_header: bool = True) -> List[int]:
    """One frame of ps_data as a bit list.

    ``iid``/``icc``: per-envelope parameter rows (lengths must match
    the modes' parameter counts); ``borders``: envelope end slots for
    frame_class 1.  All envelopes use freq-differential coding.
    """
    num_env = len(iid) if iid else (len(icc) if icc else 0)
    bits: List[int] = []
    bits.append(1 if send_header else 0)
    if send_header:
        bits.append(1 if iid is not None else 0)
        if iid is not None:
            _enc(bits, iid_mode, 3)
        bits.append(1 if icc is not None else 0)
        if icc is not None:
            _enc(bits, icc_mode, 3)
        bits.append(1 if ipd is not None else 0)   # enable_ext

    _enc(bits, frame_class, 1)
    idx = _NUM_ENV_TAB[frame_class].index(num_env)
    _enc(bits, idx, 2)
    if frame_class:
        assert borders is not None and len(borders) == num_env
        for b in borders:
            _enc(bits, int(b), 5)

    if iid is not None:
        fine = int(iid_mode > 2)
        nr = _NR_PAR_TAB[iid_mode]
        assert all(len(r) == nr for r in iid)
        codes = (PT.HUFF_IID_DF1_CODES if fine else PT.HUFF_IID_DF0_CODES)
        lens = (PT.HUFF_IID_DF1_BITS if fine else PT.HUFF_IID_DF0_BITS)
        off = (PT.HUFF_IID_DF1_OFFSET if fine else PT.HUFF_IID_DF0_OFFSET)
        _write_pars(bits, iid, 0, codes, lens, off)
    if icc is not None:
        nr = _NR_PAR_TAB[icc_mode]
        assert all(len(r) == nr for r in icc)
        _write_pars(bits, icc, 0, PT.HUFF_ICC_DF_CODES,
                    PT.HUFF_ICC_DF_BITS, PT.HUFF_ICC_DF_OFFSET)

    if ipd is not None:
        ext: List[int] = []
        ext.append(1)                    # enable_ipdopd
        for e in range(num_env):
            row = ipd[e]
            ext.append(0)                # dt = 0
            last = 0
            for v in row:
                d = (int(v) - last) & 7
                _put_code(ext, PT.HUFF_IPD_DF_CODES, PT.HUFF_IPD_DF_BITS, d)
                last = int(v)
            row = opd[e]
            ext.append(0)
            last = 0
            for v in row:
                d = (int(v) - last) & 7
                _put_code(ext, PT.HUFF_OPD_DF_CODES, PT.HUFF_OPD_DF_BITS, d)
                last = int(v)
        ext.append(0)                    # reserved_ps
        # extension container: cnt nibble counts whole bytes of
        # (ext_id + payload); pad the tail
        total = 2 + len(ext)
        cnt = (total + 7) // 8
        if cnt < 15:
            _enc(bits, cnt, 4)
        else:
            _enc(bits, 15, 4)
            _enc(bits, cnt - 15, 8)
        _enc(bits, 0, 2)                 # ps_extension_id 0 (ipdopd)
        bits.extend(ext)
        bits.extend([0] * (8 * cnt - total))
    return bits
