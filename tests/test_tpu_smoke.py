"""Deliberate on-accelerator smoke matrix.

These tests only run with MGARD_TPU_TEST_TPU=1 (the conftest otherwise
pins the suite to CPU): a small end-to-end matrix on the real device,
including the float64 path whose rounding lowering regressed on TPU in
round 1 (see ops/quantize.py) and the fused Pallas hybrid kernels.
"""

import math
import os

import numpy as np
import pytest

import mgard_tpu
from mgard_tpu import Config
from mgard_tpu.dtypes import compress_status_type, decomposition_type

pytestmark = pytest.mark.skipif(
    not os.environ.get("MGARD_TPU_TEST_TPU"),
    reason="TPU smoke matrix is opt-in (MGARD_TPU_TEST_TPU=1)",
)


def _field(shape, dtype):
    axes = [np.linspace(0, 1, n) for n in shape]
    G = np.meshgrid(*axes, indexing="ij")
    v = np.sin(4 * np.pi * G[0])
    if len(G) > 1:
        v = v * np.cos(3 * np.pi * G[-1])
    return v.astype(dtype)


@pytest.mark.parametrize("dtype", [np.float32, np.float64])
def test_e2e_on_device(dtype):
    v = _field((128, 128, 128), dtype)
    blob, st = mgard_tpu.compress(v, tol=1e-4, s=math.inf)
    assert st == compress_status_type.Success
    out, st2 = mgard_tpu.decompress(blob)
    assert st2 == compress_status_type.Success
    assert float(np.max(np.abs(out - v))) <= 1e-4


def test_hybrid_fused_on_device():
    v = _field((128, 128, 128), np.float32)
    cfg = Config()
    cfg.decomposition = decomposition_type.Hybrid
    blob, st = mgard_tpu.compress(v, tol=1e-4, s=math.inf, config=cfg)
    assert st == compress_status_type.Success
    out, st2 = mgard_tpu.decompress(blob)
    assert st2 == compress_status_type.Success
    assert float(np.max(np.abs(out - v))) <= 1e-4


def test_s_norm_on_device():
    v = _field((64, 64, 64), np.float32)
    blob, st = mgard_tpu.compress(
        v, tol=1e-3, s=0.0, mode=mgard_tpu.error_bound_type.REL
    )
    assert st == compress_status_type.Success
    out, st2 = mgard_tpu.decompress(blob)
    assert st2 == compress_status_type.Success
    l2 = np.sqrt(np.mean((out - v).astype(np.float64) ** 2))
    l2v = np.sqrt(np.mean(v.astype(np.float64) ** 2))
    assert l2 <= 1e-3 * l2v


def test_bfp_mxu_sort_matches_gather_path():
    """The in-kernel MXU width sort (bf16 permutation matmuls inside the
    pack/unpack kernels) must produce byte-identical streams to the
    external-gather path, and decode must return natural order."""
    import jax
    import jax.numpy as jnp

    from mgard_tpu.lossless import bfp

    rng = np.random.default_rng(11)
    C = 16
    sb = bfp.SB_BLOCKS
    K, E = 4, 8
    NB = 4 * sb  # 4 superblocks
    NC = NB // C
    # zigzag u16 rows with width <= K+E and varied per-chunk widths
    widths = rng.integers(0, K + E + 1, NC)
    rows = (
        rng.integers(0, 2, (NC, C * 32), np.uint32)
        * ((1 << np.maximum(widths, 1)) - 1)[:, None]
    ).astype(np.uint16)
    crl = jnp.asarray(np.clip(widths - K, 0, E), jnp.int32)
    pay16 = jnp.asarray(rows)

    base_m, resid_m, rr_m = jax.jit(
        lambda p, c: bfp.encode_core_zz(p, c, K, E, sb, True, C)
    )(pay16, crl)
    # force the gather path by feeding u32 (same values)
    base_g, resid_g, rr_g = jax.jit(
        lambda p, c: bfp.encode_core_zz(p, c, K, E, sb, True, C)
    )(pay16.astype(jnp.uint32), crl)
    rows_used = int(rr_m)
    assert rows_used == int(rr_g)
    assert np.array_equal(np.asarray(base_m), np.asarray(base_g))
    assert np.array_equal(
        np.asarray(resid_m)[:rows_used], np.asarray(resid_g)[:rows_used]
    )
    dec = jax.jit(
        lambda b, c, r: bfp.decode_core_zz(b, c, r, K, E, sb, True, NB, C)
    )(base_m, crl, resid_m)
    assert np.array_equal(np.asarray(dec), rows)


def test_hybrid_v2_kernel_matches_oracle_on_device():
    """The fused v2 kernels (integer byte-matmul group permutation) must
    match the plain-XLA oracles ON THE REAL DEVICE: payload/cw bit-exact
    (integer domain throughout), remainder exact (0/1 selection matmul at
    HIGHEST is exact), inverse within ulp-class fma variance."""
    import jax
    import jax.numpy as jnp

    from mgard_tpu.ops import hybrid as Hy

    nl, C = 3, 4
    shape = (32, 32, 128)
    rng = np.random.default_rng(5)
    v = jnp.asarray(
        _field(shape, np.float32)
        + 0.05 * rng.standard_normal(shape).astype(np.float32)
    )
    q = jnp.float32(1.7e-4)
    pay_k, cw_k, rem_k = jax.jit(
        lambda x: Hy.local_transform_fused_v2(x, 1.0 / q, nl, C)
    )(v)
    pay_o, cw_o, rem_o = jax.jit(
        lambda x: Hy.local_transform_v2_xla(x, 1.0 / q, nl, C)
    )(v)
    assert int(jnp.max(cw_o)) <= 16
    assert np.array_equal(np.asarray(pay_k), np.asarray(pay_o))
    assert np.array_equal(np.asarray(cw_k), np.asarray(cw_o))
    assert np.array_equal(np.asarray(rem_k), np.asarray(rem_o))
    out_k = jax.jit(
        lambda p, r: Hy.local_inverse_fused_v2(p, r, q, nl, jnp.float32)
    )(pay_k, rem_k)
    out_o = jax.jit(
        lambda p, r: Hy.local_inverse_v2_xla(p, r, q, nl, jnp.float32)
    )(pay_o, rem_o)
    np.testing.assert_allclose(
        np.asarray(out_k), np.asarray(out_o), rtol=0, atol=1e-6
    )


def test_hybrid_v3_fused_pack_on_device():
    """Opt-in fused transform+pack (flag-2 stream) through the public API
    on the real chip, plus the written stream's v3 geometry."""
    v = _field((128, 128, 256), np.float32)
    cfg = Config()
    cfg.hybrid_fused_pack = True
    cfg.bfp_base_planes = 4
    blob, st = mgard_tpu.compress(v, tol=1e-4, s=math.inf, config=cfg)
    assert st == compress_status_type.Success
    out, st2 = mgard_tpu.decompress(blob)
    assert st2 == compress_status_type.Success
    assert float(np.max(np.abs(out - v))) <= 1e-4


def test_f64_demoted_fast_path_on_device():
    """r4 VERDICT weak #3: double rides the f32 flagship pipeline when the
    budget covers the cast error; bound certified on the DOUBLE data."""
    from mgard_tpu.formats.metadata import Metadata

    v = _field((128, 128, 128), np.float64)
    tol = 1e-4
    blob, st = mgard_tpu.compress(v, tol=tol, s=math.inf)
    assert st == compress_status_type.Success
    m, _ = Metadata.deserialize(blob)
    assert m.demoted
    out, st2 = mgard_tpu.decompress(blob)
    assert st2 == compress_status_type.Success
    assert out.dtype == np.float64
    assert float(np.max(np.abs(out - v))) <= tol


def test_f64_native_tight_tolerance_on_device():
    """Budget below the f64->f32 cast error: the native double transform
    must carry the bound on-chip (emulated-f64 lowering regression
    guard)."""
    from mgard_tpu.formats.metadata import Metadata

    v = _field((48, 48, 48), np.float64)
    cast_err = float(np.max(np.abs(v - v.astype(np.float32).astype(np.float64))))
    tol = max(cast_err, 1e-12)
    blob, st = mgard_tpu.compress(v, tol=tol, s=math.inf)
    assert st == compress_status_type.Success
    m, _ = Metadata.deserialize(blob)
    assert not m.demoted
    out, st2 = mgard_tpu.decompress(blob)
    assert st2 == compress_status_type.Success
    assert float(np.max(np.abs(out - v))) <= tol


def test_non_uniform_coords_on_device():
    shape = (96, 96, 96)
    rng = np.random.default_rng(2)
    coords = [np.sort(rng.uniform(0, 1, n)) for n in shape]
    for c in coords:
        c[0], c[-1] = 0.0, 1.0
    v = _field(shape, np.float32)
    blob, st = mgard_tpu.compress(v, tol=1e-3, s=math.inf, coords=coords)
    assert st == compress_status_type.Success
    out, st2 = mgard_tpu.decompress(blob)
    assert st2 == compress_status_type.Success
    assert float(np.max(np.abs(out - v))) <= 1e-3


def test_mdr_progressive_reconstruct_on_device():
    """MDR refactor + two-round incremental retrieval on the real chip:
    each round's reconstruction must meet its requested tolerance."""
    from mgard_tpu.mdr.api import MDReconstruct, MDRefactor, MDRequest

    v = _field((96, 96, 96), np.float32)
    meta, data = MDRefactor(v)
    for tol in (1e-2, 1e-4):
        counts = MDRequest(meta, tol)
        meta.prev_used = []
        rec = MDReconstruct(meta, data, counts)
        assert float(np.max(np.abs(rec.data - v))) <= tol
