"""Fused v3 path (one kernel per direction): kernel/oracle parity, wire
roundtrip, tile-major layout, CPU decode, and the public-API route.

The v3 scheme ties each (8, 128, Z) transform tile to one BFP superblock
(sb = 32*Z, sbc = 1024 chunks of C = Z/32 blocks) so the payload never
round-trips HBM between the transform and the codec; the sort plan is
recomputed in-kernel from the crl sidecar on both sides
(hybrid.py `_v3_plan_kernel` == bfp.py `_sort_plan`)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import mgard_tpu
import mgard_tpu.highlevel as H
from mgard_tpu.lossless import bfp
from mgard_tpu.ops import hybrid as Hy
from mgard_tpu.utils.bytesink import join

SHAPE = (16, 256, 256)
NL = 3
E = 8


def _field(shape, seed=5):
    rng = np.random.default_rng(seed)
    x = np.linspace(0, 1, shape[0], dtype=np.float32)
    v = (
        np.sin(2 * np.pi * x)[:, None, None]
        * np.cos(np.linspace(0, 3, shape[1], dtype=np.float32))[None, :, None]
        + np.linspace(-1, 1, shape[2], dtype=np.float32)[None, None, :] ** 2
        + 0.05 * rng.standard_normal(shape).astype(np.float32)
    )
    return jnp.asarray(v)


def _production_K(v, q):
    C = SHAPE[2] // 32
    _, cw0, _ = Hy.local_transform_v2_xla(v, 1.0 / q, NL, C)
    hist = np.bincount(np.clip(np.asarray(cw0), 0, 32), minlength=33)
    return bfp.choose_K(hist, E, C)


def _hybrid_flag(blob: bytes) -> int:
    """The hybrid front-end flag byte sits 9 bytes before the cf blob's
    BFP5 magic (flag u8 + cf_len u64) for flag-1/2 streams."""
    i = bytes(blob).index(b"BFP5")
    return blob[i - 9]


def _fitting_K(v, shape, tol, nl=NL, E_=E):
    """Production-style K for the v3 C = Z/32 from the oracle widths,
    clamped so the stream is exception-free (cw_max <= K + E)."""
    import mgard_tpu.highlevel as _H
    from mgard_tpu.hierarchy import get_hierarchy as _gh
    from mgard_tpu.ops.hybrid import (hybrid_l_total, pad_to8,
                                      remainder_shape)

    padded = pad_to8(shape)
    rem_hier = _gh(remainder_shape(padded, nl), np.float32, None,
                   mgard_tpu.Config())
    q = _H._hybrid_quantizer(tol, hybrid_l_total(padded, nl, rem_hier))
    C_ = padded[-1] // 32
    _, cw, _ = Hy.local_transform_v2_xla(jnp.asarray(v),
                                         jnp.float32(1.0 / q), nl, C_)
    cw_h = np.asarray(cw)
    hist = np.bincount(np.clip(cw_h, 0, 32), minlength=33)
    K = max(bfp.choose_K(hist, E_, C_), int(cw_h.max()) - E_)
    assert K + E_ <= 16, (K, E_)
    return K


def test_v3_plan_matches_sort_plan():
    """The in-kernel counting sort must be bit-identical to bfp._sort_plan
    (decode recomputes the identical plan from the sidecar)."""
    rng = np.random.default_rng(0)
    sbc = 1024
    crl = jnp.asarray(rng.integers(0, E + 1, (1, sbc)).astype(np.int32))
    rank_ref, _cnt_ref = bfp._sort_plan(crl, E)

    U = jnp.asarray(np.triu(np.ones((sbc, sbc), np.float32), 1), jnp.bfloat16)

    class _URef:
        def __getitem__(self, _):
            return U

    rank = Hy._v3_plan_kernel(crl, E, _URef())
    np.testing.assert_array_equal(np.asarray(rank), np.asarray(rank_ref))


def test_v3_kernels_match_oracle_and_roundtrip():
    v = _field(SHAPE)
    q = jnp.float32(1.7e-4)
    K = _production_K(v, q)
    base_o, resid_o, cw_o, rem_o = Hy.transform_pack_v3_xla(
        v, 1.0 / q, NL, K, E
    )
    out = Hy.local_transform_pack_v3(v, 1.0 / q, NL, K, E, interpret=True)
    assert out is not None
    base_k, resid_k, cw_k, rem_k = out
    # widths and the residual payload are bit-exact; base planes may differ
    # at a trace fraction of one-symbol quantize flips (fma .5-boundary
    # variance between the kernel graph and the whole-array oracle)
    np.testing.assert_array_equal(np.asarray(cw_k), np.asarray(cw_o))
    np.testing.assert_array_equal(np.asarray(resid_k), np.asarray(resid_o))
    bm = (np.asarray(base_k) != np.asarray(base_o)).mean()
    assert bm < 1e-3, bm
    np.testing.assert_allclose(np.asarray(rem_k), np.asarray(rem_o),
                               rtol=0, atol=1e-6)
    crl = jnp.clip(cw_k - K, 0, E)
    # fused inverse (interpret) inverts the fused forward exactly up to
    # quantization
    rec_k = Hy.unpack_inverse_v3(base_k, crl, resid_k, rem_k, q, NL, K, E,
                                 jnp.float32, SHAPE, interpret=True)
    err = float(jnp.max(jnp.abs(rec_k - v)))
    assert err <= float(q) * (NL + 2), err
    # XLA inverse decodes the KERNEL-written payload to the same field
    rec_o = Hy.unpack_inverse_v3_xla(base_k, crl, resid_k, rem_k, q, NL,
                                     K, E, jnp.float32, SHAPE)
    np.testing.assert_allclose(np.asarray(rec_k), np.asarray(rec_o),
                               rtol=0, atol=1e-6)


def test_v3_wire_roundtrip_static_cap():
    """serialize(static_cap) -> deserialize(static_cap) reproduces the
    device arrays' decode exactly; wire bytes carry no row padding."""
    v = _field(SHAPE)
    q = jnp.float32(1.7e-4)
    K = _production_K(v, q)
    base, resid, cw, rem = Hy.transform_pack_v3_xla(v, 1.0 / q, NL, K, E)
    crl_h = np.clip(np.asarray(cw).ravel() - K, 0, E).astype(np.int32)
    Z = SHAPE[2]
    C, sb = Z // 32, 32 * Z
    n_cf = int(np.prod(SHAPE))
    parts = bfp.serialize_prepared_parts(n_cf, K, E, sb, C, crl_h, base,
                                         resid, 0, static_cap=True)
    blob = join(parts)
    wire_words = bfp.resid_wire_words(crl_h, E, C, sb)
    assert len(blob) < wire_words * 4 + K * (n_cf // 32) * 4 + 4096 + len(crl_h)
    b2, rl2, r2, (n2, K2, E2, sb2, C2), used = bfp.deserialize_prepared(
        blob, 0, static_cap=True
    )
    assert (n2, K2, E2, sb2, C2) == (n_cf, K, E, sb, C)
    np.testing.assert_array_equal(np.asarray(rl2), crl_h)
    out = Hy.unpack_inverse_v3_xla(b2, rl2, r2[: resid.shape[0]], rem, q,
                                   NL, K, E, jnp.float32, SHAPE)
    ref = Hy.unpack_inverse_v3_xla(base, jnp.asarray(crl_h), resid, rem, q,
                                   NL, K, E, jnp.float32, SHAPE)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_v3_tilemajor_order_helpers_invert():
    rng = np.random.default_rng(3)
    a = jnp.asarray(rng.integers(0, 1 << 16, SHAPE).astype(np.uint16))
    rows = Hy.field_rows_tilemajor(a)
    back = Hy.rows_tilemajor_field(rows, SHAPE)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(a))


def test_v3_stream_via_public_api_cpu(monkeypatch):
    """A flag-2 stream written through compress() (XLA oracle stand-in for
    the kernel on CPU) decodes through the public decompress() on a host
    without the TPU Pallas backend, within the bound."""
    if jax.default_backend() == "tpu":
        pytest.skip("CPU-only scenario")
    monkeypatch.setattr(H, "_hybrid_v3_ok", lambda *a, **k: True)
    monkeypatch.setattr(Hy, "local_transform_pack_v3",
                        lambda v, iq, nl, K, E:
                        Hy.transform_pack_v3_xla(v, iq, nl, K, E))
    shape = (16, 128, 256)
    v = np.asarray(_field(shape, seed=9))
    cfg = mgard_tpu.Config()
    cfg.bfp_base_planes = _fitting_K(v, shape, 1e-3)
    blob, st = mgard_tpu.compress(v, tol=1e-3, s=np.inf,
                                  mode=mgard_tpu.error_bound_type.ABS,
                                  config=cfg)
    assert int(st) == 0
    assert _hybrid_flag(blob) == 2  # genuinely the fused-v3 stream layout
    out, st2 = mgard_tpu.decompress(blob)
    assert int(st2) == 0
    err = float(np.max(np.abs(out - v)))
    assert err <= 1e-3, err


def test_v3_gate_requires_known_K():
    cfg = mgard_tpu.Config()
    cfg.bfp_base_planes = 0
    bfp._K_CACHE.pop(("v2", int(np.prod(SHAPE)), E, SHAPE[2] // 32, 0), None)
    K, _, _ = H._v3_params(cfg, SHAPE)
    assert K is None
    # sticky cache primes the gate
    bfp._K_CACHE[("v2", int(np.prod(SHAPE)), E, SHAPE[2] // 32, 0)] = (5, None)
    K2, _, _ = H._v3_params(cfg, SHAPE)
    assert K2 == 5
    bfp._K_CACHE.pop(("v2", int(np.prod(SHAPE)), E, SHAPE[2] // 32, 0), None)


def test_v3_shape_gate():
    assert Hy.v3_ok_shape((8, 128, 512))
    assert Hy.v3_ok_shape((64, 256, 768))
    assert not Hy.v3_ok_shape((8, 128))          # not 3D
    assert not Hy.v3_ok_shape((12, 128, 512))    # X % 8
    assert not Hy.v3_ok_shape((8, 64, 512))      # Y % 128
    assert not Hy.v3_ok_shape((8, 128, 96))      # Z < 128
    assert not Hy.v3_ok_shape((8, 128, 1152))    # Z > 1024


def test_v3_flag_rejects_bad_geometry(monkeypatch):
    """A flag-2 stream whose BFP5 header does not match the v3 tile=SB
    scheme must raise FormatError (clean rejection), not crash in a
    reshape."""
    if jax.default_backend() == "tpu":
        pytest.skip("CPU-only scenario")
    monkeypatch.setattr(H, "_hybrid_v3_ok", lambda *a, **k: True)
    monkeypatch.setattr(Hy, "local_transform_pack_v3",
                        lambda v, iq, nl, K, E:
                        Hy.transform_pack_v3_xla(v, iq, nl, K, E))
    shape = (16, 128, 256)
    v = np.asarray(_field(shape, seed=11))
    cfg = mgard_tpu.Config()
    cfg.bfp_base_planes = _fitting_K(v, shape, 1e-3)
    blob, st = mgard_tpu.compress(v, tol=1e-3, s=np.inf,
                                  mode=mgard_tpu.error_bound_type.ABS,
                                  config=cfg)
    assert int(st) == 0
    assert _hybrid_flag(blob) == 2
    # corrupt the BFP5 header's sb field (offset: magic4 + n8 + rows8 +
    # K1 + E1 -> sb u32); the v3 branch must reject sb != 32*Z
    # (Z=256 -> the correct sb IS 8192, so write a genuinely wrong value)
    i = blob.index(b"BFP5")
    bad = bytearray(blob)
    import struct as S

    S.pack_into("<I", bad, i + 22, 16384)
    out, st2 = mgard_tpu.decompress(bytes(bad))
    assert out is None and int(st2) != 0


def test_minor_version_forward_rejection(monkeypatch):
    """Streams with a HIGHER minor file version than this build must be
    rejected cleanly (they may carry front-end flags this build cannot
    parse). Written with a VALID CRC so the version gate itself is what
    rejects."""
    import struct as S
    import zlib as _zlib

    from mgard_tpu.formats import metadata as M

    v = np.linspace(0, 1, 4096, dtype=np.float32).reshape(16, 16, 16)
    blob, st = mgard_tpu.compress(v, tol=1e-3, s=np.inf,
                                  mode=mgard_tpu.error_bound_type.ABS)
    assert int(st) == 0
    # streams stamp the MINIMUM minor their features need; forge a
    # future minor (with a valid CRC) to exercise the forward gate
    buf = bytearray(blob)
    hdr = len(M.MAGIC)
    (size,) = S.unpack_from("<I", buf, hdr)
    body_off = hdr + 8
    buf[body_off + 4] = M.FILE_VERSION[1] + 1  # file-version minor byte
    crc = _zlib.crc32(bytes(buf[body_off : body_off + size])) & 0xFFFFFFFF
    S.pack_into("<II", buf, hdr, size, crc)
    out, st2 = mgard_tpu.decompress(bytes(buf))
    assert out is None and int(st2) != 0


def test_wire_minor_is_minimum_needed():
    """Flag-0/1 streams must stamp file minor 0 (2.0-reader parseable);
    only fused-v3 (flag-2) sections require minor 1."""
    from mgard_tpu.formats import metadata as M

    v = np.linspace(0, 1, 4096, dtype=np.float32).reshape(16, 16, 16)
    blob, st = mgard_tpu.compress(v, tol=1e-3, s=np.inf,
                                  mode=mgard_tpu.error_bound_type.ABS)
    assert int(st) == 0
    body_off = len(M.MAGIC) + 8
    assert blob[body_off + 3] == M.FILE_VERSION[0]
    assert blob[body_off + 4] == 0


def test_v3_params_falls_back_to_v2_chunk_key():
    """For Z where v3's C = Z/32 differs from the v2 serializer's chunk
    pick, the sticky-cache lookup must also try the v2 key (768: C=24 vs
    C2=8) so v2 priming engages the fused path."""
    padded = (768, 768, 768)
    cfg = mgard_tpu.Config()
    cfg.bfp_base_planes = 0
    C = 768 // 32                      # 24 — v3's chunk size
    C2 = H._pick_v2_chunk(padded, cfg)  # 8 — what v2 caches under
    assert C2 != C
    n_cf = int(np.prod(padded))
    for key in [("v2", n_cf, E, C, 0), ("v2", n_cf, E, C2, 0)]:
        bfp._K_CACHE.pop(key, None)
    K, _, _ = H._v3_params(cfg, padded)
    assert K is None
    bfp._K_CACHE[("v2", n_cf, E, C2, 0)] = (6, None)
    K2, _, _ = H._v3_params(cfg, padded)
    assert K2 == 6
    bfp._K_CACHE.pop(("v2", n_cf, E, C2, 0), None)
