"""Hybrid (blockwise 8^3 local + global remainder) decomposition tests."""

import math

import numpy as np
import pytest

import mgard_tpu
from mgard_tpu import Config
from mgard_tpu.dtypes import compress_status_type, decomposition_type


def _field(shape, seed=0):
    axes = [np.linspace(0, 1, n) for n in shape]
    G = np.meshgrid(*axes, indexing="ij")
    v = np.zeros(shape)
    for k in range(1, 4):
        v += np.sin(2 * np.pi * k * G[0]) / k
        if len(G) > 1:
            v += np.cos(2 * np.pi * k * G[-1]) / k
    return v.astype(np.float32)


@pytest.mark.parametrize("nl", [1, 2, 3])
@pytest.mark.parametrize("shape", [(64,), (32, 24), (16, 24, 16)])
def test_hybrid_linf_bound(shape, nl):
    v = _field(shape)
    cfg = Config()
    cfg.decomposition = decomposition_type.Hybrid
    cfg.num_local_refactoring_level = nl
    blob, st = mgard_tpu.compress(v, tol=1e-3, s=math.inf, config=cfg)
    assert st == compress_status_type.Success
    out, st2 = mgard_tpu.decompress(blob)
    assert st2 == compress_status_type.Success
    assert float(np.max(np.abs(out - v))) <= 1e-3


def test_hybrid_non_multiple_of_8():
    v = _field((35, 21))
    cfg = Config()
    cfg.decomposition = decomposition_type.Hybrid
    blob, st = mgard_tpu.compress(v, tol=1e-2, s=math.inf, config=cfg)
    assert st == compress_status_type.Success
    out, _ = mgard_tpu.decompress(blob)
    assert out.shape == v.shape
    assert float(np.max(np.abs(out - v))) <= 1e-2


def test_hybrid_compresses_smooth_data():
    v = _field((48, 48, 24))
    cfg = Config()
    cfg.decomposition = decomposition_type.Hybrid
    blob, st = mgard_tpu.compress(v, tol=1e-2, s=math.inf, config=cfg)
    assert st == compress_status_type.Success
    assert len(blob) < v.nbytes / 3


def test_hybrid_level_grouping_roundtrip():
    """hybrid_level_grouping reorders symbols by minor-axis class for
    better BFX widths; the flag travels in the header (reorder bit 0)."""
    v = _field((16, 16, 16))
    cfg = Config()
    cfg.decomposition = decomposition_type.Hybrid
    cfg.hybrid_level_grouping = True
    blob, st = mgard_tpu.compress(v, tol=1e-3, s=math.inf, config=cfg)
    assert st == compress_status_type.Success
    out, st2 = mgard_tpu.decompress(blob)
    assert st2 == compress_status_type.Success
    assert float(np.max(np.abs(out - v))) <= 1e-3
    # grouped and ungrouped blobs decode to the same quality
    blob2, _ = mgard_tpu.compress(v, tol=1e-3, s=math.inf, config=Config(
        decomposition=decomposition_type.Hybrid))
    out2, _ = mgard_tpu.decompress(blob2)
    assert np.allclose(out, out2, atol=2e-3)
