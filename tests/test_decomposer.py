"""Domain decomposition tests: strategies, local tol, end-to-end bound."""

import math

import numpy as np
import pytest

import mgard_tpu
from mgard_tpu import Config, compress, decompress, error_bound_type
from mgard_tpu.decomposer import DomainDecomposer, calc_local_abs_tol
from mgard_tpu.dtypes import compress_status_type, domain_decomposition_type


def smooth(shape, seed=11):
    rng = np.random.default_rng(seed)
    axes = [np.linspace(0, 1, n) for n in shape]
    grids = np.meshgrid(*axes, indexing="ij")
    v = np.zeros(shape)
    for _ in range(3):
        ks = rng.integers(1, 4, len(shape))
        acc = rng.uniform(0, 2 * np.pi)
        for k, g in zip(ks, grids):
            acc = acc + 2 * np.pi * k * g
        v += rng.uniform(0.3, 1.0) * np.sin(acc)
    return v


def test_no_decomposition_when_fits():
    dd = DomainDecomposer((64, 64), np.float32, Config())
    assert not dd.domain_decomposed
    assert dd.num_subdomains == 1


def test_max_dim_strategy_forced_by_memory():
    cfg = Config()
    cfg.max_memory_footprint = 200_000  # tiny -> force split
    dd = DomainDecomposer((200, 64), np.float64, cfg, available_memory=200_000)
    assert dd.domain_decomposed
    assert dd.domain_decomposed_dim == 0
    assert dd.num_subdomains > 1
    # subdomains tile the array exactly
    covered = np.zeros((200, 64), bool)
    for i in range(dd.num_subdomains):
        covered[dd.subdomain_slices(i)] = True
    assert covered.all()


def test_block_strategy():
    cfg = Config()
    cfg.domain_decomposition = domain_decomposition_type.Block
    cfg.block_size = 32
    dd = DomainDecomposer((64, 48), np.float32, cfg)
    assert dd.domain_decomposed
    assert dd.num_subdomains == 2 * 2
    covered = np.zeros((64, 48), bool)
    for i in range(dd.num_subdomains):
        covered[dd.subdomain_slices(i)] = True
    assert covered.all()


def test_variable_strategy():
    cfg = Config()
    cfg.domain_decomposition = domain_decomposition_type.Variable
    cfg.domain_decomposition_dim = 0
    cfg.domain_decomposition_sizes = [20, 30, 14]
    dd = DomainDecomposer((64, 8), np.float32, cfg)
    assert dd.num_subdomains == 3
    assert dd.subdomain_shape(1) == (30, 8)


def test_local_tol_formulas():
    # reference ErrorToleranceCalculator.hpp:127-147
    assert calc_local_abs_tol(error_bound_type.ABS, 0, 1e-2, math.inf, 7) == 1e-2
    assert np.isclose(
        calc_local_abs_tol(error_bound_type.ABS, 0, 1e-2, 0.0, 4), 1e-2 / 2
    )
    assert np.isclose(
        calc_local_abs_tol(error_bound_type.REL, 3.0, 1e-2, math.inf, 7), 3e-2
    )
    assert np.isclose(
        calc_local_abs_tol(error_bound_type.REL, 3.0, 1e-2, 0.0, 4), 3e-2 / 2
    )


@pytest.mark.parametrize("mode", [error_bound_type.ABS, error_bound_type.REL])
def test_decomposed_roundtrip_bound(mode):
    """Global Linf bound must hold across independently compressed subdomains."""
    cfg = Config()
    cfg.domain_decomposition = domain_decomposition_type.Variable
    cfg.domain_decomposition_dim = 0
    cfg.domain_decomposition_sizes = [40, 33, 27]
    v = smooth((100, 20))
    tol = 1e-2
    blob, st = compress(v, tol=tol, mode=mode, config=cfg)
    assert st == compress_status_type.Success
    out, st2 = decompress(blob)
    assert st2 == compress_status_type.Success
    bound = tol * (np.max(np.abs(v)) if mode == error_bound_type.REL else 1.0)
    assert np.max(np.abs(out - v)) <= bound


def test_block_decomposed_roundtrip():
    cfg = Config()
    cfg.domain_decomposition = domain_decomposition_type.Block
    cfg.block_size = 17
    v = smooth((34, 34)).astype(np.float32)
    blob, st = compress(v, tol=1e-2, config=cfg)
    assert st == compress_status_type.Success
    out, st2 = decompress(blob)
    assert st2 == compress_status_type.Success
    assert np.max(np.abs(out - v)) <= 1e-2


def test_size_one_tails_are_absorbed():
    """shape % chunk == 1 must never emit a size-1 subdomain (a Hierarchy
    axis needs >= 2 nodes): the tail node is absorbed into the last chunk,
    identically on the compress-side strategy and from_metadata."""
    import numpy as np

    from mgard_tpu import Config
    from mgard_tpu.decomposer import DomainDecomposer, _block_axis_slices
    from mgard_tpu.dtypes import domain_decomposition_type

    # Block: 257 % 256 == 1 on both axes
    cfg = Config()
    cfg.domain_decomposition = domain_decomposition_type.Block
    cfg.block_size = 256
    dd = DomainDecomposer((257, 257), np.float32, cfg)
    for i in range(dd.num_subdomains):
        assert min(dd.subdomain_shape(i)) >= 2, dd.subdomain_shape(i)

    # MaxDim with a tiny budget: forced halving can hit remainder 1
    cfg2 = Config()
    dd2 = DomainDecomposer((13, 9, 9), np.float32, cfg2, available_memory=0)
    assert dd2.domain_decomposed
    for i in range(dd2.num_subdomains):
        assert min(dd2.subdomain_shape(i)) >= 2, dd2.subdomain_shape(i)
    # slices must tile the axis exactly
    covered = sum(
        dd2.subdomain_shape(i)[dd2.domain_decomposed_dim]
        for i in range(dd2.num_subdomains)
    )
    assert covered == 13

    # helper invariant across a sweep
    for s in range(4, 70):
        for bs in range(3, 20):
            sls = _block_axis_slices(s, bs)
            assert sls[0].start == 0 and sls[-1].stop == s
            assert all(b.start == a.stop for a, b in zip(sls, sls[1:]))
            assert all((sl.stop - sl.start) != 1 for sl in sls) or s == 1
