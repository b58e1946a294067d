"""CLI round-trip tests (reference: mgard-x / mdr-x executable flows)."""

import numpy as np
import pytest

from mgard_tpu.cli import main as cli_main
from mgard_tpu.mdr.cli import main as mdr_main


@pytest.fixture
def field(tmp_path):
    v = np.fromfunction(
        lambda i, j, k: np.sin(i / 7.0) * np.cos(j / 5.0) + 0.1 * k / 9.0,
        (33, 21, 9),
    ).astype(np.float32)
    p = tmp_path / "data.raw"
    v.tofile(p)
    return v, str(p), tmp_path


@pytest.mark.parametrize("backend", ["bfx", "huffman", "blockdelta"])
def test_cli_compress_decompress(field, backend, capsys):
    v, path, tmp = field
    blob_path = str(tmp / "data.mgard")
    out_path = str(tmp / "out.raw")
    cli_main(["-z", "-i", path, "-o", blob_path, "-dt", "s",
              "-dim", "3", "33", "21", "9", "-em", "abs", "-e", "1e-3",
              "-s", "inf", "-l", backend])
    cli_main(["-x", "-i", blob_path, "-o", out_path, "-g", path, "-v", "1"])
    out = np.fromfile(out_path, np.float32).reshape(v.shape)
    assert np.max(np.abs(out - v)) <= 1e-3
    stats = capsys.readouterr().out
    assert "Satisfied" in stats


def test_cli_ref_format_cpu_roundtrip(field):
    """-z --ref-format-cpu writes an older CPU-generation reference stream
    that -x (via the sniffing cross-decoder) reads back within bound."""
    v, path, tmp = field
    blob_path = str(tmp / "data.mgard")
    out_path = str(tmp / "out.raw")
    cli_main(["-z", "-i", path, "-o", blob_path, "-dt", "s",
              "-dim", "3", "33", "21", "9", "-em", "abs", "-e", "1e-3",
              "-s", "inf", "--ref-format-cpu"])
    blob = open(blob_path, "rb").read()
    assert blob[:5] == b"MGARD" and blob[5:8] != b"TPU"
    cli_main(["-x", "-i", blob_path, "-o", out_path])
    out = np.fromfile(out_path, np.float32).reshape(v.shape)
    assert np.max(np.abs(out - v)) <= 1e-3


def test_cli_finite_s_reports_snorm(field, capsys):
    """Finite-s round trips report the error in the certified s-norm
    (reference mgard-x.cpp prints L_inf/L_2; the s-norm line is the norm
    the finite-s bound actually holds in)."""
    v, path, tmp = field
    blob_path = str(tmp / "data.mgard")
    out_path = str(tmp / "out.raw")
    cli_main(["-z", "-i", path, "-o", blob_path, "-dt", "s",
              "-dim", "3", "33", "21", "9", "-em", "rel", "-e", "1e-2",
              "-s", "0", "-l", "bfx"])
    cli_main(["-x", "-i", blob_path, "-o", out_path, "-g", path, "-v", "1"])
    stats = capsys.readouterr().out
    line = [ln for ln in stats.splitlines() if "s-norm error" in ln]
    assert line, stats
    assert "(s=0)" in line[0]
    assert "NOT satisfied" not in line[0]


def test_cli_zfp_compressor(field):
    v, path, tmp = field
    blob_path = str(tmp / "data.zfp")
    out_path = str(tmp / "out.raw")
    cli_main(["-z", "-i", path, "-o", blob_path, "-dt", "s",
              "-dim", "3", "33", "21", "9", "-e", "1e-3", "-c", "zfp"])
    cli_main(["-x", "-i", blob_path, "-o", out_path])
    out = np.fromfile(out_path, np.float32).reshape(v.shape)
    assert np.max(np.abs(out - v)) <= 1e-3


def test_mdr_cli_progressive(field, capsys):
    v, path, tmp = field
    mdr_path = str(tmp / "data.mdr")
    out_path = str(tmp / "out.raw")
    mdr_main(["-z", "-i", path, "-o", mdr_path, "-dt", "s",
              "-dim", "3", "33", "21", "9"])
    mdr_main(["-x", "-i", mdr_path, "-o", out_path,
              "-e", "1e-1", "1e-2", "-g", path])
    printed = capsys.readouterr().out
    assert printed.count("OK") >= 2
    out = np.fromfile(out_path, np.float32).reshape(v.shape)
    assert np.max(np.abs(out - v)) <= 1e-2


def test_cli_ref_format_roundtrip(tmp_path):
    """-z --ref-format writes a reference-library-compatible stream that -x
    (via the sniffing cross-decoder) reads back within the bound."""
    import numpy as np

    from mgard_tpu.cli import main

    x = np.linspace(0, 1, 33, dtype=np.float32)
    v = (np.sin(2 * np.pi * x)[:, None, None]
         * np.cos(3 * np.pi * x)[None, :, None]
         + x[None, None, :] ** 2).astype(np.float32)
    inp = tmp_path / "in.bin"
    comp = tmp_path / "out.mgard"
    dec = tmp_path / "dec.bin"
    v.tofile(inp)
    main(["-z", "-i", str(inp), "-o", str(comp), "-dt", "s",
          "-dim", "3", "33", "33", "33", "-em", "abs", "-e", "1e-3",
          "--ref-format"])
    blob = comp.read_bytes()
    assert blob[:5] == b"MGARD" and blob[5:8] != b"TPU"
    main(["-x", "-i", str(comp), "-o", str(dec)])
    out = np.fromfile(dec, np.float32).reshape(33, 33, 33)
    assert float(np.max(np.abs(out - v))) <= 1e-3
