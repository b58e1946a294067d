"""ZFP-style transform compressor: bound + round-trip tests."""

import math

import numpy as np
import pytest

import mgard_tpu
from mgard_tpu import Config
from mgard_tpu.dtypes import compress_status_type, compressor_type
from mgard_tpu.zfp import compress_zfp, decompress_zfp


def _field(shape, seed=0):
    rng = np.random.default_rng(seed)
    axes = [np.linspace(0, 1, n) for n in shape]
    G = np.meshgrid(*axes, indexing="ij")
    v = np.zeros(shape)
    for k in range(1, 4):
        v += np.sin(2 * np.pi * k * G[0]) / k
        if len(G) > 1:
            v += np.cos(2 * np.pi * k * G[-1]) / k
    v += 0.05 * rng.standard_normal(shape)
    return v.astype(np.float32)


@pytest.mark.parametrize("shape", [(64,), (33, 18), (17, 16, 9)])
@pytest.mark.parametrize("tol", [1e-1, 1e-3])
def test_accuracy_bound(shape, tol):
    v = _field(shape)
    blob = compress_zfp(v, tol=tol)
    out, used = decompress_zfp(blob)
    assert used == len(blob)
    assert out.shape == v.shape
    assert float(np.max(np.abs(out - v))) <= tol


def test_precision_mode_monotone():
    v = _field((32, 32))
    errs = []
    sizes = []
    for p in (8, 16, 24):
        blob = compress_zfp(v, precision=p)
        out, _ = decompress_zfp(blob)
        errs.append(float(np.max(np.abs(out - v))))
        sizes.append(len(blob))
    assert errs[0] > errs[-1]
    assert sizes[0] < sizes[-1]


def test_highlevel_zfp_route():
    v = _field((20, 20, 12))
    cfg = Config()
    cfg.compressor = compressor_type.ZFP
    blob, st = mgard_tpu.compress(v, tol=1e-3, s=math.inf, config=cfg)
    assert st == compress_status_type.Success
    out, st2 = mgard_tpu.decompress(blob)
    assert st2 == compress_status_type.Success
    assert float(np.max(np.abs(out - v))) <= 1e-3
    # ratio sanity: should actually compress
    assert len(blob) < v.nbytes


def test_zero_block_and_tiny_values():
    v = np.zeros((16, 16), np.float32)
    v[0, 0] = 1e-30
    blob = compress_zfp(v, tol=1e-3)
    out, _ = decompress_zfp(blob)
    assert float(np.max(np.abs(out - v))) <= 1e-3
