"""BFP codec: device round-trips, format oracle, exception ladder, e2e."""

import math

import numpy as np
import pytest

import mgard_tpu
from mgard_tpu.lossless import bfp


def _roundtrip(sym, config=None):
    blob = bfp.encode(np.asarray(sym, np.int32), config)
    out, used = bfp.decode(blob)
    assert used == len(blob)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(sym, np.int32))
    return blob


@pytest.mark.parametrize("n", [0, 1, 31, 32, 8192, 8192 * 4 + 17])
def test_roundtrip_sizes(n):
    rng = np.random.default_rng(n)
    sym = (rng.standard_normal(n) * 50).astype(np.int32)
    _roundtrip(sym)


def test_roundtrip_smooth_symbols():
    """Symbol stats shaped like quantized smooth data (narrow widths)."""
    rng = np.random.default_rng(1)
    sym = (rng.standard_normal(1 << 16) * 40).astype(np.int32)
    blob = _roundtrip(sym)
    assert len(blob) < (1 << 16) * 4 * 0.6  # actually compresses


def test_roundtrip_wide_values():
    """Exception path: a sprinkle of full-width values."""
    rng = np.random.default_rng(2)
    sym = (rng.standard_normal(1 << 15) * 20).astype(np.int32)
    idx = rng.integers(0, sym.size, 300)
    sym[idx] = rng.integers(-(2**30), 2**30, 300).astype(np.int32)
    _roundtrip(sym)


def test_roundtrip_extreme_magnitudes():
    sym = np.array(
        [0, 1, -1, 2**31 - 1, -(2**31), 12345, -99999] * 700, np.int32
    )
    _roundtrip(sym)


def test_exception_ladder_retrace():
    """Exceeding the cached exception bucket must transparently re-encode."""
    n = 1 << 15
    rng = np.random.default_rng(3)
    narrow = (rng.standard_normal(n) * 10).astype(np.int32)
    _roundtrip(narrow)  # seeds a small exception bucket for this size
    wide = narrow.copy()
    wide[:: 2] = 2**28  # ~half the blocks become exceptions
    _roundtrip(wide)


def test_all_zero_and_constant():
    _roundtrip(np.zeros(5000, np.int32))
    _roundtrip(np.full(5000, -7, np.int32))


def test_format_matches_numpy_reference():
    """Byte-level format oracle: device encode == slow numpy encode."""
    import struct

    rng = np.random.default_rng(4)
    sym = (rng.standard_normal(4096) * 30).astype(np.int32)
    sym[17] = 2**29  # force one exception block
    blob = bfp.encode(sym)
    magic, n, resid_words, K, E, sb, C, cnt = struct.unpack_from(bfp._HDR, blob, 0)
    assert magic == bfp._MAGIC and n == sym.size and cnt >= 1
    crl, base, resid, exc_ids, exc_blocks = bfp.np_encode(sym, K, E, sb, C)
    total = resid_words
    p = struct.calcsize(bfp._HDR)
    NB = bfp._pad_to(n, sb) // 32
    NC = NB // C
    nnib = (NC + 1) // 2
    nib_dev = np.frombuffer(blob, np.uint8, nnib, p)
    rl_pad = np.concatenate([crl, np.zeros(nnib * 2 - NC, np.uint8)])
    np.testing.assert_array_equal(nib_dev, rl_pad[0::2] | (rl_pad[1::2] << 4))
    p += nnib
    base_dev = np.frombuffer(blob, "<u4", K * NB, p)
    np.testing.assert_array_equal(base_dev, base)
    p += 4 * K * NB
    resid_dev = np.frombuffer(blob, "<u4", total, p)
    assert total == len(resid)
    np.testing.assert_array_equal(resid_dev, resid)
    p += 4 * total
    ids_dev = np.frombuffer(blob, "<u4", cnt, p)
    np.testing.assert_array_equal(ids_dev, exc_ids)
    p += 4 * cnt
    blk_dev = np.frombuffer(blob, "<i4", cnt * C * 32, p).reshape(cnt, C * 32)
    np.testing.assert_array_equal(blk_dev, exc_blocks)


def test_pinned_K():
    cfg = mgard_tpu.Config()
    cfg.bfp_base_planes = 4
    rng = np.random.default_rng(5)
    sym = (rng.standard_normal(20000) * 25).astype(np.int32)
    _roundtrip(sym, cfg)


@pytest.mark.parametrize("decomposition", ["multidim", "hybrid"])
def test_e2e_compress_bfp(decomposition):
    from mgard_tpu.dtypes import decomposition_type, lossless_type

    rng = np.random.default_rng(6)
    v = rng.standard_normal((48, 40, 40)).astype(np.float32)
    cfg = mgard_tpu.Config()
    cfg.lossless = lossless_type.BFP
    if decomposition == "hybrid":
        cfg.decomposition = decomposition_type.Hybrid
    blob, st = mgard_tpu.compress(v, tol=1e-2, s=math.inf, config=cfg)
    assert int(st) == 0
    out, st2 = mgard_tpu.decompress(blob)
    assert int(st2) == 0
    assert np.max(np.abs(out - v)) <= 1e-2


def test_e2e_bfp_zstd_and_sharded():
    import jax

    from mgard_tpu.dtypes import lossless_type
    from mgard_tpu.parallel import compress_sharded, make_subdomain_mesh

    rng = np.random.default_rng(7)
    v = rng.standard_normal((40, 20, 20)).astype(np.float32)
    cfg = mgard_tpu.Config()
    cfg.lossless = lossless_type.BFP_Zstd
    blob, st = mgard_tpu.compress(v, tol=1e-2, config=cfg)
    assert int(st) == 0
    out, _ = mgard_tpu.decompress(blob)
    assert np.max(np.abs(out - v)) <= 1e-2

    if len(jax.devices()) >= 8:
        cfg2 = mgard_tpu.Config()
        cfg2.lossless = lossless_type.BFP
        blob2, st2 = compress_sharded(
            v, tol=1e-2, config=cfg2, mesh=make_subdomain_mesh(8)
        )
        assert int(st2) == 0
        out2, _ = mgard_tpu.decompress(blob2)
        assert np.max(np.abs(out2 - v)) <= 1e-2


def test_wide_path_k_plus_e_over_16():
    """Pinning K so K+E > 16 forces the u32 (wide) payload path; the
    format and round-trip must be identical to the narrow path's rules."""
    cfg = mgard_tpu.Config()
    cfg.bfp_base_planes = 12  # + E_DEFAULT(8) = 20 > 16
    rng = np.random.default_rng(11)
    sym = (rng.standard_normal(40000) * 3e5).astype(np.int32)
    _roundtrip(sym, cfg)


def test_narrow_wide_byte_identity():
    """For a stream whose widths fit both paths, blobs from K+E <= 16 and
    a wide-forced config differ only via K — same machinery, and each
    round-trips. (Exception chunks serialize as zero planes on BOTH paths,
    so bytes stay deterministic per config.)"""
    rng = np.random.default_rng(12)
    sym = (rng.standard_normal(30000) * 40).astype(np.int32)
    cfg = mgard_tpu.Config()
    cfg.bfp_base_planes = 5  # K+E = 13: narrow
    b1 = _roundtrip(sym, cfg)
    b1b = _roundtrip(sym, cfg)
    assert b1 == b1b  # deterministic
    cfg2 = mgard_tpu.Config()
    cfg2.bfp_base_planes = 10  # K+E = 18: wide machinery
    _roundtrip(sym, cfg2)


def test_band_compaction_matches_index_oracle():
    """The band-sliced _compact_resid/_expand_resid (fast path: per-band
    2-D prefix copies) must be byte-identical to the per-word index oracle
    _band_src_indices across geometries, including zero-count bands."""
    L = bfp.LANES
    cases = [
        (0, 16, 7, 16, bfp.SB_BLOCKS),
        (1, 4, 7, 16, bfp.SB_BLOCKS),
        (2, 2, 15, 4, bfp.SB_BLOCKS),
        (3, 1, 1, 4, bfp.SB_BLOCKS_SMALL),
        (4, 3, 7, 16, bfp.SB_BLOCKS_SMALL),
    ]
    for seed, nsb, E, C, sb in cases:
        rng = np.random.default_rng(seed)
        NC = (sb // C) * nsb
        crl = rng.integers(0, E + 1, NC).astype(np.uint8)
        if seed == 0:
            crl[: sb // C] = 0  # a whole superblock of empty bands
        src, rows = bfp._band_src_indices(crl, E, C, sb)
        rf = rng.integers(0, 2**32, max(rows * L, 1), np.uint64).astype(
            np.uint32
        )
        ref = rf[src]
        new = bfp._compact_resid(rf, crl, E, C, sb)
        np.testing.assert_array_equal(ref, new)
        cap = E * (sb // L)
        buf_ref = np.zeros(((rows + cap) * L,), np.uint32)
        buf_ref[src] = ref
        buf_new, rows2 = bfp._expand_resid(new, crl, E, C, sb)
        assert rows2 == rows
        np.testing.assert_array_equal(buf_ref, buf_new.reshape(-1))
