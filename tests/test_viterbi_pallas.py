"""Pallas Viterbi kernel vs the numpy reference decoder (interpret mode on
the CPU mesh; the real-TPU path is exercised by bench.py)."""

import numpy as np
import pytest

from dabjax.fec import conv
from dabjax.fec.viterbi import viterbi_decode_np
from dabjax.fec.viterbi_pallas import viterbi_decode_pallas


def test_pallas_high_noise_ties():
    """Heavy noise creates near-tie path metrics; decisions must still be
    bit-identical to the numpy decoder (this is where one-bf16-pass
    matmul rounding diverged on hardware before the exact formulation)."""
    nbits, shape = 768, (6,)
    rng = np.random.default_rng(99)
    bits = rng.integers(0, 2, shape + (nbits,), np.uint8)
    soft = (conv.encode(bits).astype(np.float32) * 2 - 1) * 100
    soft += np.round(rng.standard_normal(soft.shape) * 80).astype(np.float32)
    soft = np.clip(soft, -127, 127)       # the int8 soft-bit contract
    want = viterbi_decode_np(soft, nbits)
    got = np.asarray(viterbi_decode_pallas(soft, nbits, interpret=True))
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("nbits,shape", [
    (768, (4,)),          # FIC codewords
    (2304, (3, 2)),       # MSC 96 kbps, [subch, frames]
    (100, ()),            # unbatched
])
def test_pallas_matches_numpy(nbits, shape):
    rng = np.random.default_rng(nbits)
    bits = rng.integers(0, 2, shape + (nbits,), np.uint8)
    coded = np.apply_along_axis(conv.encode, -1, bits) if bits.ndim > 1 \
        else (conv.encode(bits) if bits.ndim == 1 else
              conv.encode(bits[None])[0])
    soft = (coded.astype(np.float32) * 2 - 1) * 100
    soft += np.round(rng.standard_normal(soft.shape) * 40).astype(np.float32)
    soft = np.clip(soft, -127, 127)       # the int8 soft-bit contract
    want = viterbi_decode_np(soft, nbits)
    got = np.asarray(viterbi_decode_pallas(soft, nbits, interpret=True))
    np.testing.assert_array_equal(got, want)
    np.testing.assert_array_equal(want, bits)     # noise within margin


def test_pallas_punctured_positions():
    # zeros at punctured positions ("do not know") decode like the scan path
    rng = np.random.default_rng(7)
    nbits = 768
    bits = rng.integers(0, 2, (2, nbits), np.uint8)
    coded = np.stack([conv.encode(b) for b in bits]).astype(np.float32)
    soft = (coded * 2 - 1) * 127
    mask = rng.random(soft.shape) < 0.3           # 30% punctured
    soft[mask] = 0.0
    want = viterbi_decode_np(soft, nbits)
    got = np.asarray(viterbi_decode_pallas(soft, nbits, interpret=True))
    np.testing.assert_array_equal(got, want)


def test_pallas_pure_noise_word_padding():
    """Pure uniform random soft input (no codeword structure): state 0
    does not dominate the final metrics, so unmasked word-padding steps
    would walk the traceback away from state 0 before the true last step
    (the 62/3072-bit divergence found by the r5 hardware spot check).
    Both lane kernel variants must stay bit-exact vs the numpy decoder."""
    import dabjax.fec.viterbi_pallas as VP
    rng = np.random.default_rng(1)
    for nbits in (768, 2304):     # 13 and 6 padded pair steps
        soft = rng.integers(-127, 128, (4, 4 * (nbits + 6))).astype(
            np.float32)
        want = viterbi_decode_np(soft, nbits)
        for fmt in ("i8lane", "i8lane2"):
            old = VP.SOFT_FMT
            VP.SOFT_FMT = fmt
            try:
                VP.viterbi_decode_pallas.clear_cache()
                VP.viterbi_forward_words.clear_cache()
                got = np.asarray(VP.viterbi_decode_pallas(
                    soft, nbits, interpret=True))
            finally:
                VP.SOFT_FMT = old
        np.testing.assert_array_equal(got, want)
