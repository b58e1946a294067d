"""Lossless backend round-trips, modeled on the reference's per-backend tests
(reference: tests/mgard-x/test_{Huffman,Zstd,...}.cpp.in — random plus
adversarial symbol distributions)."""

import numpy as np
import pytest

import mgard_tpu  # noqa: F401
import jax.numpy as jnp
from mgard_tpu.config import Config
from mgard_tpu.dtypes import lossless_type
from mgard_tpu.lossless import huffman as H
from mgard_tpu.lossless import lossless_compress, lossless_decompress

RNG = np.random.default_rng(7)

DISTS = {
    "laplace": lambda n: np.clip(
        np.round(RNG.laplace(0, 3, n)).astype(np.int64) + 4096, 0, 8191
    ).astype(np.int32),
    "constant": lambda n: np.full(n, 123, np.int32),
    "uniform": lambda n: RNG.integers(0, 8192, n).astype(np.int32),
    "sparse": lambda n: RNG.choice([4096, 4097, 0, 8191], n, p=[0.9, 0.08, 0.01, 0.01]).astype(np.int32),
}


@pytest.mark.parametrize("dist", list(DISTS))
@pytest.mark.parametrize("n", [1, 100, 5000])
def test_huffman_roundtrip(dist, n):
    sym = DISTS[dist](n)
    blob = H.encode(jnp.asarray(sym), 8192)
    dec, _ = H.decode(blob)
    assert np.array_equal(np.asarray(dec), sym)


def test_huffman_near_entropy():
    sym = DISTS["laplace"](50000)
    freq = np.bincount(sym, minlength=8192)
    p = freq[freq > 0] / sym.size
    entropy = -(p * np.log2(p)).sum()
    blob = H.encode(jnp.asarray(sym), 8192)
    bits = 8 * len(blob) / sym.size
    assert bits < entropy * 1.12 + 0.3, f"{bits} vs entropy {entropy}"


@pytest.mark.parametrize(
    "lt",
    [
        lossless_type.Huffman,
        lossless_type.Huffman_Zstd,
        lossless_type.Huffman_LZ4,
        lossless_type.CPU_Lossless,
        lossless_type.LZ4,
    ],
)
def test_registry_roundtrip(lt):
    cfg = Config()
    cfg.lossless = lt
    if lt in (lossless_type.CPU_Lossless, lossless_type.LZ4):
        sym = (DISTS["laplace"](3000) - 4096).astype(np.int32)  # signed path
    else:
        sym = DISTS["laplace"](3000)
    blob = lossless_compress(jnp.asarray(sym), cfg)
    out, used = lossless_decompress(blob)
    assert used == len(blob)
    assert np.array_equal(np.asarray(out), sym)


def test_package_merge_is_length_limited():
    freq = np.zeros(8192, np.int64)
    # pathological: exponential frequencies force deep trees in plain Huffman
    for i in range(40):
        freq[i] = 2**i
    lens = H.package_merge_lengths(freq, max_len=16)
    assert lens[freq > 0].max() <= 16
    assert abs(np.sum(2.0 ** -lens[lens > 0].astype(float)) - 1.0) < 1e-9


def test_truncated_payload_raises():
    sym = DISTS["laplace"](1000)
    cfg = Config()
    blob = lossless_compress(jnp.asarray(sym), cfg)
    with pytest.raises(Exception):
        lossless_decompress(blob[: len(blob) // 2])


@pytest.mark.parametrize(
    "lt",
    [
        lossless_type.BlockDelta,
        lossless_type.SymbolRans,
        lossless_type.ZeroRLE_Rans,
    ],
)
@pytest.mark.parametrize("dist", ["laplace", "constant", "sparse"])
def test_device_backends_roundtrip(lt, dist):
    cfg = Config()
    cfg.lossless = lt
    sym = DISTS[dist](4000)
    if lt == lossless_type.BlockDelta:
        sym = sym - 4096  # signed path
    blob = lossless_compress(jnp.asarray(sym), cfg)
    out, used = lossless_decompress(blob)
    assert used == len(blob)
    assert np.array_equal(np.asarray(out), sym)


def test_rans_beats_huffman_floor_on_sparse():
    """Sub-1-bit coding on highly sparse data (the reference's stated reason
    for the ZeroRLE_Rans backend)."""
    rng = np.random.default_rng(3)
    sym = np.where(rng.random(60000) < 0.99, 4096, 4097).astype(np.int32)
    cfg = Config()
    cfg.lossless = lossless_type.ZeroRLE_Rans
    rle = lossless_compress(jnp.asarray(sym), cfg)
    cfg.lossless = lossless_type.Huffman
    huf = lossless_compress(jnp.asarray(sym), cfg)
    assert len(rle) < len(huf) / 2
    assert 8 * len(rle) / sym.size < 0.5


def test_rans_empty_roundtrip():
    """rans.encode/decode must be inverses for n == 0 (the short header)."""
    import jax.numpy as jnp

    from mgard_tpu.lossless import rans

    blob = rans.encode(jnp.zeros(0, jnp.int32), 4096)
    out = rans.decode(blob)
    assert out.shape == (0,)
