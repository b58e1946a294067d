"""SymbolRans lossless backend: Huffman's symbol model, rANS entropy coding.

Re-design of the reference SymbolRans
(reference: include/mgard-x/Lossless/SymbolRans/SymbolRans.hpp, 384 LoC):
the same outlier-separated dict_size symbol model as the Huffman stage -
out-of-dictionary symbols are separated into a (delta-coded positions,
values) side stream and replaced by the origin symbol - with the in-dict
stream coded by the device rANS codec (fractional bits: never worse than
Huffman, no code-length cap).
"""

from __future__ import annotations

import struct
import zlib

import jax.numpy as jnp
import numpy as np

from . import rans

_MAGIC = b"SRN1"


def encode(symbols, config) -> bytes:
    dict_size = int(config.huff_dict_size)
    origin = dict_size // 2
    sym_h = np.asarray(symbols).astype(np.int64).ravel()
    n = sym_h.size
    # outlier separation (reference: SymbolRans.hpp separate/restore): any
    # symbol outside [0, dict_size) moves to the side stream
    mask = (sym_h < 0) | (sym_h >= dict_size)
    idx = np.nonzero(mask)[0].astype(np.int64)
    vals = sym_h[idx]
    inner = sym_h.copy()
    inner[idx] = origin
    iz = zlib.compress(np.diff(idx, prepend=np.int64(0)).tobytes(), 3)
    vz = zlib.compress(vals.tobytes(), 3)
    body = rans.encode(
        jnp.asarray(inner.astype(np.int32)), dict_size, int(config.huff_block_size)
    ) if n else b""
    head = struct.pack("<4sQQII", _MAGIC, n, idx.size, len(iz), len(vz))
    return head + iz + vz + body


def decode(data: bytes):
    magic, n, nout, niz, nvz = struct.unpack_from("<4sQQII", data, 0)
    if magic != _MAGIC:
        raise ValueError("bad SymbolRans blob")
    p = struct.calcsize("<4sQQII")
    idx_d = np.frombuffer(zlib.decompress(data[p : p + niz]), np.int64)
    p += niz
    vals = np.frombuffer(zlib.decompress(data[p : p + nvz]), np.int64)
    p += nvz
    if n == 0:
        return jnp.zeros((0,), jnp.int32)
    out = np.asarray(rans.decode(bytes(data[p:]))).astype(np.int64)
    if nout:
        idx = np.cumsum(idx_d)
        out[idx] = vals
    return jnp.asarray(out.astype(np.int32))
