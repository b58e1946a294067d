"""Unit tests for the single-copy byte assembler (utils/bytesink.py)."""

import numpy as np
import pytest

from mgard_tpu.utils import bytesink
from mgard_tpu.utils.bytesink import Fill, join, join_into, parts_size


def _oracle(parts):
    out = []
    for p in parts:
        if isinstance(p, Fill):
            buf = np.zeros(p.size, np.uint8)
            p.fn(buf)
            out.append(buf.tobytes())
        elif isinstance(p, np.ndarray):
            a = p
            if a.dtype.byteorder == ">":
                a = a.astype(a.dtype.newbyteorder("<"))
            out.append(np.ascontiguousarray(a).tobytes())
        else:
            out.append(bytes(p))
    return b"".join(out)


def test_join_matches_eager_concat():
    rng = np.random.default_rng(0)
    parts = [
        b"header",
        rng.integers(0, 255, 1000, np.uint16).astype(np.uint16),
        bytearray(b"xy"),
        memoryview(b"zw"),
        rng.integers(0, 2**32, 257, np.uint64).astype("<u4"),
        b"",
        np.zeros(0, np.uint8),
    ]
    got = join(parts)
    assert isinstance(got, bytes)
    assert got == _oracle(parts)
    assert len(got) == parts_size(parts)


def test_join_noncontiguous_and_bigendian():
    rng = np.random.default_rng(1)
    a = rng.integers(0, 2**31, (64, 8), np.int64).astype(np.int32)
    parts = [
        a[:, :3],            # non-contiguous slice: strided destination copy
        a[::2],              # strided rows
        a[:4].astype(">u4"),  # big-endian input must be normalized to LE
    ]
    assert join(parts) == _oracle(parts)


def test_fill_writes_in_place():
    def fn(out):
        out.view("<u4")[:] = np.arange(5, dtype="<u4")

    parts = [b"ab", Fill(20, fn), b"cd"]
    got = join(parts)
    assert got[:2] == b"ab" and got[-2:] == b"cd"
    assert np.frombuffer(got, "<u4", 5, 2).tolist() == [0, 1, 2, 3, 4]


def test_fill_unaligned_destination():
    # 1-byte prefix leaves the Fill region 4-misaligned; the uint32 view
    # must still write correctly (numpy permits unaligned views)
    def fn(out):
        out.view("<u4")[:] = np.full(3, 0xDEADBEEF, "<u4")

    got = join([b"x", Fill(12, fn)])
    assert np.frombuffer(got, "<u4", 3, 1).tolist() == [0xDEADBEEF] * 3


def test_join_empty_and_single():
    assert join([]) == b""
    assert join([b"only"]) == b"only"


def test_memoryview_nonbyte_itemsize():
    # len(memoryview) counts elements; part_nbytes must count bytes
    a = np.arange(6, dtype="<u4")
    mv = memoryview(a)
    assert parts_size([mv]) == 24
    assert join([b"x", mv]) == b"x" + a.tobytes()


def test_join_into_returns_offset():
    buf = np.zeros(10, np.uint8)
    n = join_into(buf, [b"abc", np.array([1, 2], np.uint8)])
    assert n == 5
    assert bytes(buf[:5]) == b"abc\x01\x02"


def test_capi_path_active():
    # the zero-extra-copy allocator must be in use on CPython (the
    # fallback would silently double the serialize cost)
    assert bytesink._HAVE_CAPI


def test_threaded_join_matches_serial():
    """Explicit multi-thread assembly (disjoint regions) must produce the
    same bytes as the serial path — exercised explicitly because this
    rig's cpu_count=1 default never threads."""
    rng = np.random.default_rng(7)
    parts = []
    for i in range(9):
        m = int(rng.integers(1 << 20, 3 << 20))
        if i % 3 == 2:
            data = rng.integers(0, 255, m, np.uint16).astype(np.uint8)

            def fn(out, data=data):
                out[:] = data

            parts.append(Fill(m, fn))
        else:
            parts.append(rng.integers(0, 255, m, np.uint16).astype(np.uint8))
    total = parts_size(parts)
    assert total >= bytesink._MIN_PARALLEL_BYTES
    serial = np.zeros(total, np.uint8)
    join_into(serial, parts, threads=1)
    threaded = np.zeros(total, np.uint8)
    join_into(threaded, parts, threads=4)
    np.testing.assert_array_equal(serial, threaded)


def test_large_random_fuzz():
    rng = np.random.default_rng(2)
    for trial in range(10):
        parts = []
        for _ in range(rng.integers(1, 8)):
            kind = rng.integers(0, 3)
            m = int(rng.integers(0, 5000))
            if kind == 0:
                parts.append(rng.integers(0, 255, m, np.uint16).astype(np.uint8).tobytes())
            elif kind == 1:
                parts.append(rng.integers(0, 2**16, m, np.uint64).astype(np.uint16))
            else:
                data = rng.integers(0, 255, m, np.uint16).astype(np.uint8)

                def fn(out, data=data):
                    out[:] = data

                parts.append(Fill(m, fn))
        assert join(parts) == _oracle(parts), trial
