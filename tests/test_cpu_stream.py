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


_WRITE_CASES = [
    ("3d151617_f64_sinf", "input_3d15x16x17_f64.bin", np.float64,
     (15, 16, 17), np.inf, 1e-3, None),
    ("3d151617_f64_s0", "input_3d15x16x17_f64.bin", np.float64,
     (15, 16, 17), 0.0, 1e-3, None),
    ("3d9917_f32_sinf", "input_3d9x9x17_f32.bin", np.float32,
     (9, 9, 17), np.inf, 1e-3, None),
    ("2d179_f64_nonuni", "cpu_input_2d179_f64_nonuni.bin", np.float64,
     (17, 9), np.inf, 1e-3,
     ("cpu_coords_2d179_f64_nonuni_d0.bin",
      "cpu_coords_2d179_f64_nonuni_d1.bin")),
]


@pytest.mark.parametrize("case", _WRITE_CASES, ids=lambda c: c[0])
def test_cpu_write_accepted_by_reference(case):
    """Bidirectional interop for the CPU generation: cpuwrite_*.mgard was
    WRITTEN by compress_cpu and cpuwrite_dec_*.bin is the REFERENCE CPU
    library's own reconstruction of it (generate_cpu_write.sh). The
    writer must still reproduce the committed bytes (so the pinned
    reference acceptance applies to current code), and the reference's
    reconstruction must hold the certified bound."""
    from mgard_tpu.formats.cpu_stream import compress_cpu

    tag, inp, dt, shape, s, tol, coord_files = case
    v = np.fromfile(os.path.join(GOLD, inp), dt).reshape(shape)
    coords = None
    if coord_files:
        coords = [np.fromfile(os.path.join(GOLD, c), np.float64)
                  for c in coord_files]
    blob = compress_cpu(v, tol, s, coords=coords)
    with open(os.path.join(GOLD, f"cpuwrite_{tag}.mgard"), "rb") as f:
        assert blob == f.read(), "writer bytes drifted from pinned stream"

    ref_dec = np.fromfile(
        os.path.join(GOLD, f"cpuwrite_dec_{tag}.bin"), dt
    ).reshape(shape)
    if np.isinf(s):
        err = float(np.max(np.abs(ref_dec.astype(np.float64) - v)))
        assert err <= tol

    # our own decoder agrees with the reference's reconstruction
    out, st = mgard_tpu.decompress(blob)
    assert int(st) == 0
    atol = 2e-6 if dt == np.float32 else 1e-12
    np.testing.assert_allclose(out.astype(np.float64), ref_dec, rtol=0,
                               atol=atol)


def test_cpu_stream_truncation_fails_cleanly():
    """Truncated CPU streams must come back as a clean Failure status, not
    an uncaught exception or garbage output."""
    tag = "3d9917_f32_s0"
    with open(os.path.join(GOLD, f"cpu_stream_{tag}.mgard"), "rb") as f:
        blob = f.read()
    for cut in (10, 80, len(blob) // 2, len(blob) - 3):
        out, st = mgard_tpu.decompress(blob[:cut])
        assert out is None and int(st) != 0, f"cut={cut}"
