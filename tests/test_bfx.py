"""BFX block fixed-width codec: round-trip + format oracle tests."""

import numpy as np
import pytest

from mgard_tpu.lossless import bfx


def _rand_syms(n, scale, seed=0):
    rng = np.random.default_rng(seed)
    # heavy-near-zero distribution like quantized MGARD coefficients
    s = (rng.standard_normal(n) * scale).astype(np.int32)
    # sprinkle large outliers
    k = max(1, n // 1000)
    idx = rng.integers(0, n, k)
    s[idx] = rng.integers(-(2**30), 2**30, k).astype(np.int32)
    return s


@pytest.mark.parametrize("n", [1, 31, 32, 8192, 8193, 40000])
@pytest.mark.parametrize("scale", [0, 3, 1000])
def test_roundtrip(n, scale):
    s = _rand_syms(n, scale)
    blob = bfx.encode(s)
    out, used = bfx.decode(blob)
    assert used == len(blob)
    np.testing.assert_array_equal(np.asarray(out), s)


def test_matches_numpy_reference():
    s = _rand_syms(3 * 8192, 50, seed=3)
    blob = bfx.encode(s)
    widths_ref, words_ref = bfx.np_encode(s)
    import struct

    magic, n, total, sb_blocks, _ = struct.unpack_from(bfx._HDR, blob, 0)
    assert sb_blocks == bfx.SB_BLOCKS_SMALL  # CPU path
    p = struct.calcsize(bfx._HDR)
    nb = len(widths_ref)
    widths = np.frombuffer(blob, np.uint8, nb, p)
    words = np.frombuffer(blob, "<u4", total, p + nb)
    np.testing.assert_array_equal(widths, widths_ref)
    assert total == len(words_ref)
    np.testing.assert_array_equal(words, words_ref)


def test_all_zero_is_tiny():
    s = np.zeros(65536, np.int32)
    blob = bfx.encode(s)
    # header + widths only, no payload words
    assert len(blob) < 24 + 65536 // 32 + 16


def test_ratio_reasonable():
    s = (np.random.default_rng(0).standard_normal(262144) * 20).astype(np.int32)
    blob = bfx.encode(s)
    ratio = s.nbytes / len(blob)
    # ~6-bit values + metadata: expect at least 3.5x on 32-bit symbols
    assert ratio > 3.5


def test_extreme_magnitudes_roundtrip():
    """Full-width symbols (|v| >= 2^30) must survive: the unzigzag halving
    shift has to be logical, not arithmetic (r3 regression test)."""
    sym = np.array(
        [0, 1, -1, 2**31 - 1, -(2**31), 2**30, -(2**30) - 1] * 700, np.int32
    )
    out, used = bfx.decode(bfx.encode(sym))
    np.testing.assert_array_equal(np.asarray(out), sym)
