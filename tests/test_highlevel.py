"""End-to-end compress/decompress property tests.

The canonical oracle is the reference's (tests/mgard/test_compress.cpp:26-66):
compress at (s, tol), decompress, assert the error bound holds.
"""

import math

import numpy as np
import pytest

import mgard_tpu
from mgard_tpu import Config, compress, decompress, error_bound_type, lossless_type
from mgard_tpu.dtypes import compress_status_type


def smooth_field(shape, seed=3):
    rng = np.random.default_rng(seed)
    axes = [np.linspace(0, 1, n) for n in shape]
    grids = np.meshgrid(*axes, indexing="ij")
    v = np.zeros(shape)
    for _ in range(4):
        ks = rng.integers(1, 5, len(shape))
        ph = rng.uniform(0, 2 * np.pi)
        acc = ph
        for k, g in zip(ks, grids):
            acc = acc + 2 * np.pi * k * g
        v = v + rng.uniform(0.3, 1.0) * np.sin(acc)
    return v


@pytest.mark.parametrize("shape", [(65,), (40, 40), (17, 18, 19)])
@pytest.mark.parametrize("dtype", [np.float32, np.float64])
def test_abs_linf_bound(shape, dtype):
    v = smooth_field(shape).astype(dtype)
    tol = 1e-2
    blob, st = compress(v, tol=tol, s=math.inf, mode=error_bound_type.ABS)
    assert st == compress_status_type.Success
    out, st2 = decompress(blob)
    assert st2 == compress_status_type.Success
    assert out.dtype == dtype and out.shape == shape
    err = np.max(np.abs(out - v))
    assert err <= tol, f"Linf {err} > {tol}"


def test_rel_bound():
    v = 100.0 * smooth_field((33, 33))
    tol = 1e-3
    blob, st = compress(v, tol=tol, s=math.inf, mode=error_bound_type.REL)
    out, _ = decompress(blob)
    norm = np.max(np.abs(v))
    assert np.max(np.abs(out - v)) <= tol * norm


def test_s_norm_path():
    """s=0 (L2) path: orthogonal projection + volume-weighted quantization."""
    v = smooth_field((65, 65))
    tol = 1e-3
    blob, st = compress(v, tol=tol, s=0.0, mode=error_bound_type.ABS)
    assert st == compress_status_type.Success
    out, st2 = decompress(blob)
    assert st2 == compress_status_type.Success
    l2 = np.sqrt(np.mean((out - v) ** 2))
    assert l2 <= tol, f"L2 {l2} > {tol}"


def test_nonuniform_coords_roundtrip():
    rng = np.random.default_rng(5)
    shape = (33, 21)
    coords = [np.sort(rng.uniform(0, 1, n)) for n in shape]
    for c in coords:
        c[0], c[-1] = 0.0, 1.0
    v = smooth_field(shape)
    tol = 1e-2
    blob, st = compress(v, tol=tol, s=math.inf, mode=error_bound_type.ABS, coords=coords)
    assert st == compress_status_type.Success
    out, st2 = decompress(blob)
    assert st2 == compress_status_type.Success
    assert np.max(np.abs(out - v)) <= tol


@pytest.mark.parametrize(
    "lt", [lossless_type.Huffman_Zstd, lossless_type.CPU_Lossless]
)
def test_lossless_backends_e2e(lt):
    cfg = Config()
    cfg.lossless = lt
    v = smooth_field((33, 33)).astype(np.float32)
    blob, st = compress(v, tol=1e-2, config=cfg)
    out, st2 = decompress(blob)
    assert st2 == compress_status_type.Success
    assert np.max(np.abs(out - v)) <= 1e-2


def test_compression_actually_compresses():
    v = smooth_field((65, 65, 5)).astype(np.float32)
    blob, _ = compress(v, tol=1e-2)
    assert len(blob) < v.nbytes / 3


def test_corrupted_header_fails_cleanly():
    v = smooth_field((33,)).astype(np.float32)
    blob, _ = compress(v, tol=1e-2)
    bad = bytearray(blob)
    bad[12] ^= 0xFF  # flip a metadata byte -> CRC must catch
    out, st = decompress(bytes(bad))
    assert st == compress_status_type.Failure and out is None
    out2, st2 = decompress(b"garbage")
    assert st2 == compress_status_type.Failure
    out3, st3 = decompress(blob[: len(blob) // 2])
    assert st3 == compress_status_type.Failure


def test_unsupported_inputs():
    _, st = compress(np.zeros((2, 2, 2, 2, 2, 2), np.float32), tol=1e-2)
    assert st == compress_status_type.NotSupportHigherNumberOfDimensionsFailure
    _, st2 = compress(np.zeros((8, 8), np.int32), tol=1e-2)
    assert st2 == compress_status_type.NotSupportDataTypeFailure


def test_outlier_heavy_data_still_bounded():
    """Discontinuous data: many coefficients exceed the dictionary."""
    v = np.zeros((65, 65))
    v[20:40, 10:50] = 1000.0
    tol = 1e-2
    blob, st = compress(v, tol=tol)
    assert st == compress_status_type.Success
    out, _ = decompress(blob)
    assert np.max(np.abs(out - v)) <= tol


def test_roi_compression():
    """ROI region gets the finer bound; background keeps the global bound;
    blob is smaller than uniformly-fine compression."""
    from mgard_tpu.highlevel import compress_roi

    v = smooth_field((65, 65))
    mask = np.zeros(v.shape, bool)
    mask[20:40, 20:40] = True
    tol, factor = 1e-2, 100.0
    blob, st = compress_roi(v, tol, mask, roi_factor=factor)
    assert st == compress_status_type.Success
    out, st2 = decompress(blob)
    assert st2 == compress_status_type.Success
    assert np.max(np.abs((out - v)[mask])) <= tol / factor
    assert np.max(np.abs(out - v)) <= tol
    fine, _ = compress(v, tol=tol / factor)
    assert len(blob) < len(fine)


def test_adjust_shape_roundtrip():
    """ShapeAdjustment: padded compression restores the original shape and
    still meets the bound (reference: ShapeAdjustment.hpp)."""
    import math

    from mgard_tpu import Config

    v = smooth_field((30, 61, 7)).astype(np.float32)
    cfg = Config()
    cfg.adjust_shape = True
    blob, st = compress(v, tol=1e-2, s=math.inf, config=cfg)
    assert st == compress_status_type.Success
    out, st2 = decompress(blob)
    assert st2 == compress_status_type.Success
    assert out.shape == v.shape
    assert float(np.max(np.abs(out - v))) <= 1e-2
