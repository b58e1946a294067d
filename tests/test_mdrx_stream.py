"""Cross-reading of reference MDR-X refactored-data directories.

Goldens: tests/golden/mdrx/ is a directory archive written by the
reference MDR-X SERIAL build itself (generate_mdrx.sh: 33^3 f32, default
ComposedRefactor config), with the reference's OWN reconstructions at two
tolerances as oracles. Pins the whole read pipeline: metadata struct
parse, the greedy plane request (including the 4-plane group round-up),
the RegisterBlock sign-magnitude bitplane decode, the LevelLinearizer
reposition, and the hierarchical-basis recompose."""

import math
import os

import numpy as np
import pytest

from mgard_tpu.formats.mdrx_stream import (
    read_metadata,
    reconstruct_mdrx,
    request_planes,
)

GOLD = os.path.join(os.path.dirname(__file__), "golden")
ARCHIVE = os.path.join(GOLD, "mdrx")


def _input():
    return np.fromfile(os.path.join(GOLD, "mdrx_input.bin"),
                       np.float32).reshape(33, 33, 33)


def test_mdrx_metadata_parses():
    md = read_metadata(ARCHIVE)[0]
    assert int(md.num_levels) == 6 and int(md.num_bitplanes) == 32
    assert int(md.level_num_elems[-1]) == 31024
    assert int(md.level_num_elems.sum()) == 33 ** 3


@pytest.mark.parametrize(
    "tol,ref_name,ref_planes",
    [
        (1e-1, "mdrx_rec_1e-01.bin", [12, 12, 12, 12, 4, 4]),
        (1e-3, "mdrx_rec_1e-03.bin", [20, 20, 20, 20, 12, 12]),
    ],
)
def test_mdrx_reconstruction_matches_reference(tol, ref_name, ref_planes):
    """Our greedy request must pick exactly the planes the reference's
    GenerateRequest picks, and the reconstruction must match the
    reference's own progressive reconstruction to f32 rounding while
    holding the requested bound against the original data."""
    md = read_metadata(ARCHIVE)[0]
    assert request_planes(md, tol) == ref_planes
    out = reconstruct_mdrx(ARCHIVE, tol)
    ref = np.fromfile(os.path.join(GOLD, ref_name),
                      np.float32).reshape(33, 33, 33)
    np.testing.assert_allclose(out.astype(np.float64), ref, rtol=0,
                               atol=1e-6)
    v = _input()
    assert float(np.max(np.abs(out.astype(np.float64) - v))) <= tol


def test_mdrx_progressive_improves_with_planes():
    """More planes per level must monotonically reduce the error."""
    v = _input()
    errs = []
    for planes in ([4] * 6, [8] * 6, [16] * 6):
        out = reconstruct_mdrx(ARCHIVE, 1.0, planes=planes)
        errs.append(float(np.max(np.abs(out.astype(np.float64) - v))))
    assert errs[0] > errs[1] > errs[2]


def test_mdrx_cli_roundtrip(tmp_path, capsys):
    """mdr-tpu -x on a reference directory archive reconstructs within
    bound through the CLI."""
    from mgard_tpu.mdr.cli import main as mdr_main

    inp = os.path.join(GOLD, "mdrx_input.bin")
    out_path = str(tmp_path / "out.raw")
    mdr_main(["-x", "-i", ARCHIVE, "-o", out_path, "-e", "1e-2",
              "-g", inp])
    printed = capsys.readouterr().out
    assert "OK" in printed
    out = np.fromfile(out_path, np.float32).reshape(33, 33, 33)
    assert float(np.max(np.abs(out - _input()))) <= 1e-2


def _make_field(shape):
    """Replicates gen_mdrx.cpp make_field exactly (f64 accumulate, f32
    cast) — verified bit-equal against the committed 33^3 input."""
    n = int(np.prod(shape))
    idx = np.arange(n)
    acc = np.zeros(n)
    prod = np.ones(n)
    rem = idx.copy()
    for d in range(len(shape) - 1, -1, -1):
        x = (rem % shape[d]) / (shape[d] - 1 if shape[d] > 1 else 1)
        rem //= shape[d]
        acc += np.sin(2 * np.pi * (d + 1) * x)
        prod *= np.cos(np.pi * x + 0.3 * (d + 1))
    return (acc + 0.5 * prod).astype(np.float32).reshape(shape)


def test_mdrx_field_replication_matches():
    """gen_mdrx.cpp's make_field uses libm sin/cos, so bit-equality with
    the generation machine isn't portable; 1-ulp-class agreement is all
    the dependent tests (bound checks at tol >= 2e-1) need."""
    ref = np.fromfile(os.path.join(GOLD, "mdrx_input.bin"),
                      np.float32).reshape(33, 33, 33)
    np.testing.assert_allclose(_make_field((33, 33, 33)).astype(np.float64),
                               ref.astype(np.float64), rtol=0, atol=1e-6)


def test_mdrx_at_scale_161():
    """9-level 161^3 archive (trimmed to the requested components): the
    request must match the reference's (including the uint8-promotion
    quirk that rounds zero-plane levels up to one 4-plane group), the
    reconstruction must hold the bound against the (regenerated) input,
    and its leading 35937 values must match the reference's own
    reconstruction to f32 rounding (prefix oracle from
    generate_mdrx.sh; 9 f32 recompose levels accumulate ~1 ulp of
    order-dependent rounding vs the reference)."""
    import zlib

    archive = os.path.join(GOLD, "mdrx2")
    md = read_metadata(archive)[0]
    assert int(md.num_levels) == 9
    assert request_planes(md, 2e-1) == [8, 12, 8, 8, 8, 4, 4, 4, 4]
    out = reconstruct_mdrx(archive, 2e-1)
    v = _make_field((161, 161, 161))
    assert float(np.max(np.abs(out.astype(np.float64) - v))) <= 2e-1
    with open(os.path.join(GOLD, "mdrx2_rec_2e-01.bin.zz"), "rb") as f:
        ref_prefix = np.frombuffer(zlib.decompress(f.read()), np.float32)
    np.testing.assert_allclose(
        out.ravel()[: ref_prefix.size].astype(np.float64),
        ref_prefix.astype(np.float64), rtol=0, atol=1e-6)


def test_mdrx3_compressed_groups():
    """105^3 archive whose finest level crosses HybridLevelCompressor's
    1 MB gate with BOTH compressed wire forms live: group 0 is a real
    MGXRLEC container and group 1 a real MGXHUFF byte-Huffman container,
    written by the reference build itself (generate_mdrx3.sh; field
    engineered by gen_mdrx3_field.py). Pins the greedy request, both
    group decoders on reference-written payloads, the bound, and the
    reference's own reconstruction (600 kB prefix oracle)."""
    import importlib.util
    import zlib

    from mgard_tpu.formats.mdrx_stream import MDRXArchive

    archive = os.path.join(GOLD, "mdrx3")
    with open(os.path.join(archive, "component_0_7_0"), "rb") as f:
        assert f.read(7) == b"MGXRLEC"
    with open(os.path.join(archive, "component_0_7_4"), "rb") as f:
        assert f.read(7) == b"MGXHUFF"

    a = MDRXArchive(archive)
    assert a.request(2e-2) == [8, 8, 16, 4, 4, 4, 4, 8]
    out = a.reconstruct(2e-2)

    spec = importlib.util.spec_from_file_location(
        "gen_mdrx3_field", os.path.join(GOLD, "gen_mdrx3_field.py"))
    gen = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(gen)
    v = gen.make_field3()
    assert float(np.max(np.abs(out.astype(np.float64)
                               - v.astype(np.float64)))) <= 2e-2

    with open(os.path.join(GOLD, "mdrx3_rec_2e-02.bin.zz"), "rb") as f:
        ref_prefix = np.frombuffer(zlib.decompress(f.read()), np.float32)
    np.testing.assert_allclose(
        out.ravel()[: ref_prefix.size].astype(np.float64),
        ref_prefix.astype(np.float64), rtol=0, atol=1e-6)

    # decoded-group caching: a second tolerance on the same archive must
    # agree with a fresh one-shot read
    out2 = a.reconstruct(2e-1)
    np.testing.assert_array_equal(out2, reconstruct_mdrx(archive, 2e-1))


def test_mdrx_singledim_rejected():
    """A SingleDim-decomposition archive (reference-written header) must
    raise FormatError, not silently recompose MultiDim."""
    from mgard_tpu.formats.metadata import FormatError

    with pytest.raises(FormatError, match="singledim"):
        reconstruct_mdrx(os.path.join(GOLD, "mdrx_sd"), 1e-2)


def test_mdrx_domain_decomposed_rejected():
    """A domain-decomposed archive (reference-written header+metadata,
    4 MaxDim subdomains) is rejected cleanly. Investigation pinned in
    the golden: the reference's OWN dd MDR path is broken in SERIAL —
    the refactor writes garbage level bounds (6e16 at level 1 of every
    subdomain, golden mdrx_dd/metadata), its requests blow up to all 32
    planes, and its own reconstruction returns L_inf ~1e10 — so there is
    no valid dd archive to cross-read (reproduce: gen_mdrx refactor_dd /
    reconstruct_dd)."""
    from mgard_tpu.formats.metadata import FormatError
    from mgard_tpu.formats.mdrx_stream import read_metadata

    archive = os.path.join(GOLD, "mdrx_dd")
    mds = read_metadata(archive)
    assert len(mds) == 4
    # the reference-written garbage bound, pinned as evidence
    assert float(mds[0].level_error_bounds[1]) > 1e15
    with pytest.raises(FormatError, match="one.*subdomain|subdomain"):
        reconstruct_mdrx(archive, 1e-1)


def test_mdrx_truncated_metadata_fails_cleanly(tmp_path):
    import shutil

    from mgard_tpu.formats.metadata import FormatError

    bad = tmp_path / "mdrx"
    shutil.copytree(ARCHIVE, bad)
    meta = bad / "metadata"
    meta.write_bytes(meta.read_bytes()[:40])
    with pytest.raises(FormatError):
        reconstruct_mdrx(str(bad), 1e-3)


def test_mdrx_write_reference_reads(tmp_path):
    """write_mdrx emits a reference-format directory archive the
    REFERENCE build itself progressively reconstructs (goldens
    mdrxw_rec_* are the reference's own reconstructions of the committed
    mdrxw/ archive, generated by generate_mdrxw.sh): our writer must
    reproduce the committed archive byte-for-byte, our reader must agree
    with the reference's reconstruction of it, and the bound must hold."""
    import zlib

    from mgard_tpu.formats.mdrx_stream import MDRXArchive, write_mdrx

    committed = os.path.join(GOLD, "mdrxw")
    v = _input()
    out_dir = str(tmp_path / "mdrxw")
    write_mdrx(out_dir, v)
    names = sorted(os.listdir(committed))
    assert sorted(os.listdir(out_dir)) == names
    for name in names:
        with open(os.path.join(out_dir, name), "rb") as f:
            ours = f.read()
        with open(os.path.join(committed, name), "rb") as f:
            gold = f.read()
        assert ours == gold, f"write_mdrx drifted from golden in {name}"

    a = MDRXArchive(committed)
    for tol, name in ((1e-1, "mdrxw_rec_1e-01.bin.zz"),
                      (1e-3, "mdrxw_rec_1e-03.bin.zz")):
        out = a.reconstruct(tol)
        err = float(np.max(np.abs(out.astype(np.float64) - v)))
        assert err <= tol
        with open(os.path.join(GOLD, name), "rb") as f:
            ref = np.frombuffer(zlib.decompress(f.read()), np.float32)
        np.testing.assert_allclose(out.ravel().astype(np.float64),
                                   ref.astype(np.float64), rtol=0, atol=1e-6)


def test_mdrx_finite_s_requests():
    """Finite-s (L2) requests on our written archive reproduce the
    reference's own GenerateRequest exactly (L2ErrorEstimator_HB over
    the honest squared-error tables; requests pinned from the reference
    SERIAL build running `gen_mdrx reconstruct <tol> 0` on mdrxw/, whose
    reconstructions agree with ours to 1 ulp), while reference-written
    archives — whose shipped refactor leaves the tables uninitialized —
    are rejected with a clear error instead of silently missing the
    bound like the reference does."""
    from mgard_tpu.formats.metadata import FormatError
    from mgard_tpu.formats.mdrx_stream import MDRXArchive

    a = MDRXArchive(os.path.join(GOLD, "mdrxw"))
    assert a.request(1e-1, s=0.0) == [12, 16, 16, 16, 12, 12]
    assert a.request(1e-3, s=0.0) == [20, 32, 32, 32, 32, 32]
    v = _input()
    out = a.reconstruct(1e-1, s=0.0)
    l2 = float(np.sqrt(np.mean((out.astype(np.float64) - v) ** 2)))
    assert l2 <= 1e-1

    with pytest.raises(FormatError, match="squared-error tables"):
        reconstruct_mdrx(ARCHIVE, 1e-1, s=0.0)


def test_mdrx_write_tiny_magnitudes(tmp_path):
    """Levels whose bound is far below 1 need the f64 scaling path (the
    2^(B-exp) factor alone overflows f32): a ~1e-30 field must still
    round-trip within a relative tolerance."""
    from mgard_tpu.formats.mdrx_stream import MDRXArchive, write_mdrx

    v = (_make_field((17, 17, 17)) * np.float32(1e-30)).astype(np.float32)
    d = str(tmp_path / "tiny")
    write_mdrx(d, v)
    out = MDRXArchive(d).reconstruct(1e-33)
    assert float(np.max(np.abs(out.astype(np.float64) - v))) <= 1e-33


def test_mdrx_write_cli(tmp_path):
    """mdr-tpu -z --ref-format writes a reference directory archive that
    round-trips through the -x directory branch."""
    from mgard_tpu.mdr.cli import main as mdr_main

    inp = os.path.join(GOLD, "mdrx_input.bin")
    arch = str(tmp_path / "arch")
    mdr_main(["-z", "--ref-format", "-i", inp, "-o", arch,
              "-dt", "s", "-dim", "3", "33", "33", "33"])
    out_path = str(tmp_path / "out.raw")
    mdr_main(["-x", "-i", arch, "-o", out_path, "-e", "1e-2", "-g", inp])
    out = np.fromfile(out_path, np.float32).reshape(33, 33, 33)
    assert float(np.max(np.abs(out - _input()))) <= 1e-2


def test_mdrx_group_payload_rle_roundtrip():
    """Hand-built MGXRLEC container (RunLengthEncoding.hpp layout) decodes
    through the group dispatcher."""
    import struct

    from mgard_tpu.formats.mdrx_stream import _decode_group

    runs = [(5, 0), (3, 7), (8, 0), (4, 255), (12, 1)]
    expected = b"".join(bytes([s]) * c for c, s in runs)
    blob = (b"MGXRLEC\x00"
            + struct.pack("<QQ", len(runs), len(expected))
            + b"".join(struct.pack("<I", c) for c, _ in runs)
            + bytes(s for _, s in runs))
    assert _decode_group(blob, len(expected)) == expected


def test_mdrx_corrupt_fails_cleanly(tmp_path):
    """A truncated component must raise FormatError, not crash."""
    import shutil

    from mgard_tpu.formats.metadata import FormatError

    bad = tmp_path / "mdrx"
    shutil.copytree(ARCHIVE, bad)
    comp = bad / "component_0_5_0"
    comp.write_bytes(comp.read_bytes()[:100])
    with pytest.raises(FormatError):
        reconstruct_mdrx(str(bad), 1e-3)
