"""Multi-device sharded compression on the virtual 8-device CPU mesh.

Mirrors how the reference exercises its MPI scale-out (pmdr-x-qoi.cpp:
rank-per-GPU independent compression + Allreduce norms); here the mesh is
8 virtual CPU devices (conftest forces xla_force_host_platform_device_count).
"""

import math

import jax
import numpy as np
import pytest

import mgard_tpu
from mgard_tpu.parallel import compress_sharded, make_subdomain_mesh


def _field(shape):
    rng = np.random.default_rng(7)
    return rng.standard_normal(shape).astype(np.float32)


@pytest.fixture(scope="module")
def mesh():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    return make_subdomain_mesh(8)


def test_sharded_linf_bound(mesh):
    v = _field((8 * 9, 17, 9))
    blob, st = compress_sharded(v, tol=1e-2, s=math.inf, mesh=mesh)
    assert int(st) == 0
    out, st2 = mgard_tpu.decompress(blob)
    assert int(st2) == 0
    assert np.max(np.abs(out - v)) <= 1e-2


def test_sharded_l2_rel_bound(mesh):
    v = _field((8 * 9, 17, 9))
    blob, st = compress_sharded(
        v, tol=1e-2, s=0.0, mode=mgard_tpu.error_bound_type.REL, mesh=mesh
    )
    assert int(st) == 0
    out, st2 = mgard_tpu.decompress(blob)
    assert int(st2) == 0
    l2 = np.sqrt(np.mean((out - v).astype(np.float64) ** 2))
    l2v = np.sqrt(np.mean(v.astype(np.float64) ** 2))
    assert l2 <= 1e-2 * l2v


def test_sharded_matches_single_device_bound(mesh):
    """The sharded blob must decompress to the same data quality as the
    single-device path at the same settings."""
    v = _field((8 * 5, 9, 9))
    blob_s, _ = compress_sharded(v, tol=1e-3, s=math.inf, mesh=mesh)
    out_s, _ = mgard_tpu.decompress(blob_s)
    assert np.max(np.abs(out_s - v)) <= 1e-3


def test_sharded_rejects_indivisible(mesh):
    v = _field((13, 9, 9))
    with pytest.raises(ValueError):
        compress_sharded(v, tol=1e-2, mesh=mesh)
