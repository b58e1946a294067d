"""MDR high-level API: MDRefactor / MDRequest / MDReconstruct.

Mirrors the reference's public MDR surface (reference: include/mdr_x.hpp:16-38,
include/mgard-x/MDRHighLevel/MDRHighLevel.hpp:74-358) and its aggregates
RefactoredMetadata / RefactoredData / ReconstructedData
(reference: MDRHighLevel/MDRDataHighLevel.hpp). The refactor pipeline is one
jitted device program (hierarchical decompose + per-level interleave +
bitplane encode with error collection); retrieval is error-driven and
incremental: MDRequest plans per-level bitplane counts, MDReconstruct
consumes only the requested planes and tracks consumed state for later
refinement rounds (reference: MDRMetadata.hpp prev_used_level_num_bitplanes).
"""

from __future__ import annotations

import dataclasses
import struct
import zlib
from functools import partial
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config
from ..dtypes import data_type, dtype_enum, np_dtype
from ..formats.metadata import FormatError
from ..hierarchy import Hierarchy, get_hierarchy
from ..ops.refactor import decompose, recompose
from . import bitplane
from .components import (
    deinterleave_level,
    estimate_error,
    interleave_level,
    interpret_retrieve_size,
    level_num_elems,
)

_MAGIC = b"MDRTPU1\x00"


@dataclasses.dataclass
class LevelMetadata:
    exp: int
    n: int  # number of coefficients (unpadded)
    plane_sizes: List[int]  # compressed bytes per stored plane (0=sign)
    plane_raw: List[bool]  # True if plane stored uncompressed
    err_max: np.ndarray  # (B+1,)
    err_sq: np.ndarray  # (B+1,)


@dataclasses.dataclass
class RefactoredMetadata:
    dtype: data_type
    shape: tuple
    l_target: int
    number_bitplanes: int
    total_num_elems: int
    levels: List[LevelMetadata]
    # retrieval state
    requested: List[int] = dataclasses.field(default_factory=list)
    prev_used: List[int] = dataclasses.field(default_factory=list)
    coords: Optional[List[np.ndarray]] = None

    def serialize(self) -> bytes:
        body = bytearray()
        body += struct.pack(
            "<BBIQB",
            int(self.dtype),
            len(self.shape),
            self.number_bitplanes,
            self.total_num_elems,
            1 if self.coords is not None else 0,
        )
        for n in self.shape:
            body += struct.pack("<Q", n)
        if self.coords is not None:
            for c in self.coords:
                body += np.asarray(c, "<f8").tobytes()
        body += struct.pack("<I", self.l_target)
        body += struct.pack("<I", len(self.levels))
        for lm in self.levels:
            body += struct.pack("<iQ", lm.exp, lm.n)
            body += struct.pack("<I", len(lm.plane_sizes))
            for sz, raw in zip(lm.plane_sizes, lm.plane_raw):
                body += struct.pack("<IB", sz, 1 if raw else 0)
            body += np.asarray(lm.err_max, "<f8").tobytes()
            body += np.asarray(lm.err_sq, "<f8").tobytes()
        crc = zlib.crc32(bytes(body)) & 0xFFFFFFFF
        return _MAGIC + struct.pack("<II", len(body), crc) + bytes(body)

    @classmethod
    def deserialize(cls, data: bytes) -> tuple["RefactoredMetadata", int]:
        if data[:8] != _MAGIC:
            raise FormatError("not an mdr-tpu stream")
        size, crc = struct.unpack_from("<II", data, 8)
        body = bytes(data[16 : 16 + size])
        if len(body) != size or (zlib.crc32(body) & 0xFFFFFFFF) != crc:
            raise FormatError("corrupted MDR metadata")
        p = 0
        dt, nd, B, total, has_coords = struct.unpack_from("<BBIQB", body, p)
        p += struct.calcsize("<BBIQB")
        shape = []
        for _ in range(nd):
            (n,) = struct.unpack_from("<Q", body, p)
            p += 8
            shape.append(n)
        coords = None
        if has_coords:
            coords = []
            for n in shape:
                coords.append(np.frombuffer(body, "<f8", count=n, offset=p).copy())
                p += 8 * n
        (l_target,) = struct.unpack_from("<I", body, p)
        p += 4
        (nlev,) = struct.unpack_from("<I", body, p)
        p += 4
        levels = []
        for _ in range(nlev):
            exp, n = struct.unpack_from("<iQ", body, p)
            p += struct.calcsize("<iQ")
            (nplanes,) = struct.unpack_from("<I", body, p)
            p += 4
            sizes, raws = [], []
            for _ in range(nplanes):
                sz, raw = struct.unpack_from("<IB", body, p)
                p += 5
                sizes.append(sz)
                raws.append(bool(raw))
            err_max = np.frombuffer(body, "<f8", count=B + 1, offset=p).copy()
            p += 8 * (B + 1)
            err_sq = np.frombuffer(body, "<f8", count=B + 1, offset=p).copy()
            p += 8 * (B + 1)
            levels.append(LevelMetadata(exp, n, sizes, raws, err_max, err_sq))
        meta = cls(
            dtype=data_type(dt),
            shape=tuple(shape),
            l_target=l_target,
            number_bitplanes=B,
            total_num_elems=total,
            levels=levels,
            coords=coords,
        )
        return meta, 16 + size


@dataclasses.dataclass
class RefactoredData:
    # planes[l][p] = compressed bytes of plane p of level l (0 = sign plane)
    planes: List[List[bytes]]


@dataclasses.dataclass
class ReconstructedData:
    data: Optional[np.ndarray] = None
    used: List[int] = dataclasses.field(default_factory=list)


# ----------------------------------------------------------------------
def _refactor_device(hier: Hierarchy, B: int):
    L = hier.l_target

    @jax.jit
    def fn(v):
        dec = decompose(v, hier, orthogonal=False)
        out = []
        for l in range(L + 1):
            stream = interleave_level(dec, hier, l)
            pad = (-stream.shape[0]) % bitplane.LANES
            if pad:
                stream = jnp.concatenate([stream, jnp.zeros((pad,), stream.dtype)])
            out.append(bitplane.encode_kernel(stream, B))
        return out

    return fn


def MDRefactor(
    data,
    config: Optional[Config] = None,
    coords: Optional[Sequence[np.ndarray]] = None,
):
    """Refactor an array into progressive bitplane components.

    Returns (RefactoredMetadata, RefactoredData).
    Reference: MDR::MDRefactor (mdr_x.hpp:16, MDRHighLevel.hpp:74-173)."""
    config = config or Config()
    arr = np.asarray(data) if not isinstance(data, jax.Array) else data
    dt = dtype_enum(arr.dtype)
    shape = tuple(int(s) for s in arr.shape)
    coords_list = [np.asarray(c, np.float64) for c in coords] if coords else None
    hier = get_hierarchy(shape, arr.dtype, coords_list, config)
    B = int(config.total_num_bitplanes)

    results = _refactor_device(hier, B)(jnp.asarray(arr))

    levels = []
    planes_data: List[List[bytes]] = []
    for l, (planes, exp, err_max, err_sq) in enumerate(results):
        planes_h = np.asarray(planes)  # (B+1, m) uint32
        n = level_num_elems(hier, l)
        sizes, raws, blobs = [], [], []
        for p in range(planes_h.shape[0]):
            raw_bytes = planes_h[p].astype("<u4").tobytes()
            z = zlib.compress(raw_bytes, 1)
            if len(z) < len(raw_bytes):
                blobs.append(z)
                sizes.append(len(z))
                raws.append(False)
            else:
                blobs.append(raw_bytes)
                sizes.append(len(raw_bytes))
                raws.append(True)
        levels.append(
            LevelMetadata(int(exp), n, sizes, raws, np.asarray(err_max), np.asarray(err_sq))
        )
        planes_data.append(blobs)

    meta = RefactoredMetadata(
        dtype=dt,
        shape=shape,
        l_target=hier.l_target,
        number_bitplanes=B,
        total_num_elems=hier.total_num_elems,
        levels=levels,
        coords=coords_list,
    )
    return meta, RefactoredData(planes=planes_data)


def MDRequest(meta: RefactoredMetadata, tol: float, s: float = float("inf")) -> List[int]:
    """Plan per-level bitplane counts for a target tolerance.

    Reference: MDR::MDRequest -> GreedyBasedSizeInterpreter
    (MDRHighLevel.hpp:198, GenerateRequest.hpp:14-29)."""
    counts = interpret_retrieve_size(meta, tol, s)
    meta.requested = counts
    return counts


def retrieve_size(meta: RefactoredMetadata, counts: Sequence[int]) -> int:
    """Bytes needed to satisfy a retrieval plan (incremental over prev_used)."""
    prev = meta.prev_used or [0] * len(counts)
    total = 0
    for lm, c, pu in zip(meta.levels, counts, prev):
        if c > 0 and pu == 0:
            total += lm.plane_sizes[0]  # sign plane
        for b in range(pu, c):
            total += lm.plane_sizes[b + 1]
    return total


def MDReconstruct(
    meta: RefactoredMetadata,
    data: RefactoredData,
    counts: Optional[Sequence[int]] = None,
    config: Optional[Config] = None,
    state: Optional[ReconstructedData] = None,
) -> ReconstructedData:
    """Reconstruct using counts[l] magnitude planes per level.

    Reference: MDR::MDReconstruct -> ComposedReconstructor::
    ProgressiveReconstruct (MDRHighLevel.hpp:215-357)."""
    config = config or Config()
    counts = list(counts if counts is not None else meta.requested)
    dtype = np_dtype(meta.dtype)
    hier = get_hierarchy(meta.shape, dtype, meta.coords, config)
    B = meta.number_bitplanes

    dec = np.zeros(meta.shape, np.float64)
    for l, lm in enumerate(meta.levels):
        b = counts[l]
        if b == 0:
            continue
        m = (lm.n + bitplane.LANES - 1) // bitplane.LANES
        rows = np.zeros((1 + b, m), np.uint32)
        for p in range(1 + b):
            blob = data.planes[l][p]
            raw = blob if lm.plane_raw[p] else zlib.decompress(blob)
            rows[p] = np.frombuffer(raw, "<u4", count=m)
        vals = np.asarray(bitplane.decode_level(rows, lm.exp, B, b, lm.n))
        deinterleave_level(dec, vals, hier, l)

    rec = np.asarray(
        _recompose_jit(hier)(jnp.asarray(dec.astype(dtype)))
    )
    out = state or ReconstructedData()
    out.data = rec
    out.used = counts
    meta.prev_used = counts
    return out


@partial(jax.jit, static_argnums=(0,))
def _recompose_jit_inner(hier, v):
    return recompose(v, hier, orthogonal=False)


def _recompose_jit(hier):
    return lambda v: _recompose_jit_inner(hier, v)


# ----------------------------------------------------------------------
# File writer/retriever (reference: ConcatLevelFileWriter /
# ConcatLevelFileRetriever, MDR-X/{Writer,Retriever}/)
# ----------------------------------------------------------------------
def write_mdr(path: str, meta: RefactoredMetadata, data: RefactoredData) -> None:
    header = meta.serialize()
    with open(path, "wb") as f:
        f.write(header)
        for blobs in data.planes:
            for b in blobs:
                f.write(b)


def read_mdr_metadata(path: str) -> tuple[RefactoredMetadata, int]:
    with open(path, "rb") as f:
        head = f.read(16)
        size, _ = struct.unpack_from("<II", head, 8)
        body = f.read(size)
    return RefactoredMetadata.deserialize(head + body)


def read_mdr_planes(
    path: str, meta: RefactoredMetadata, counts: Sequence[int], header_size: int
) -> RefactoredData:
    """Retrieve only the planes a plan needs (byte-ranged reads)."""
    offsets = []
    off = header_size
    for lm in meta.levels:
        lvl = []
        for sz in lm.plane_sizes:
            lvl.append((off, sz))
            off += sz
        offsets.append(lvl)
    planes: List[List[bytes]] = []
    with open(path, "rb") as f:
        for l, lm in enumerate(meta.levels):
            need = 1 + counts[l] if counts[l] > 0 else 0
            lvl = []
            for p in range(len(lm.plane_sizes)):
                if p < need:
                    f.seek(offsets[l][p][0])
                    lvl.append(f.read(offsets[l][p][1]))
                else:
                    lvl.append(b"")
            planes.append(lvl)
    return RefactoredData(planes=planes)
