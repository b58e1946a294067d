"""Metadata header serialization tests (reference: test_format.cpp analogue)."""

import numpy as np
import pytest

import mgard_tpu  # noqa: F401
from mgard_tpu.dtypes import (
    data_structure_type,
    data_type,
    error_bound_type,
    lossless_type,
)
from mgard_tpu.formats.metadata import FormatError, Metadata


def test_roundtrip_uniform():
    m = Metadata(
        dtype=data_type.Double,
        shape=(100, 200, 300),
        l_target=5,
        ebtype=error_bound_type.REL,
        norm=3.25,
        tol=1e-4,
        s=float("inf"),
        ltype=lossless_type.Huffman_Zstd,
    )
    blob = m.serialize()
    m2, size = Metadata.deserialize(blob + b"PAYLOAD")
    assert size == len(blob)
    assert m2.shape == (100, 200, 300)
    assert m2.dtype == data_type.Double
    assert m2.ebtype == error_bound_type.REL
    assert m2.norm == 3.25 and m2.tol == 1e-4
    assert np.isinf(m2.s)
    assert m2.ltype == lossless_type.Huffman_Zstd


def test_roundtrip_nonuniform_coords():
    coords = [np.linspace(0, 1, 10), np.sort(np.random.default_rng(0).uniform(0, 1, 7))]
    m = Metadata(
        dtype=data_type.Float,
        shape=(10, 7),
        dstype=data_structure_type.Cartesian_Grid_Non_Uniform,
        coords=coords,
    )
    m2, _ = Metadata.deserialize(m.serialize())
    assert m2.dstype == data_structure_type.Cartesian_Grid_Non_Uniform
    for a, b in zip(coords, m2.coords):
        assert np.array_equal(a, b)


def test_crc_detects_corruption():
    blob = bytearray(Metadata(shape=(8, 8)).serialize())
    blob[-3] ^= 0x40
    with pytest.raises(FormatError, match="CRC32"):
        Metadata.deserialize(bytes(blob))


def test_bad_magic():
    with pytest.raises(FormatError, match="signature"):
        Metadata.deserialize(b"NOTMGARD" + b"\x00" * 64)


def test_truncated():
    blob = Metadata(shape=(8, 8)).serialize()
    with pytest.raises(FormatError):
        Metadata.deserialize(blob[: len(blob) - 4])


def test_reference_stream_sniffing():
    """A stream from the reference C++ library (signature "MGARD",
    MGARDConfig.hpp.in:22) gets the explicit interop message; garbage gets
    the generic one; a valid mgard-tpu stream still parses."""
    import numpy as np
    import pytest

    import mgard_tpu
    from mgard_tpu.formats.metadata import FormatError, Metadata

    with pytest.raises(FormatError, match="reference MGARD"):
        Metadata.deserialize(b"MGARD\x08proto" + b"\x00" * 64)
    with pytest.raises(FormatError, match="bad signature"):
        Metadata.deserialize(b"NOTMGARD" + b"\x00" * 64)
    blob, st = mgard_tpu.compress(np.ones((9, 9), np.float32), tol=1e-2)
    assert int(st) == 0
    Metadata.deserialize(bytes(blob))
