"""ZeroRLE + rANS lossless backend.

Re-design of the reference's ZeroRLE_Rans
(reference: include/mgard-x/Lossless/ParallelRLE/ZeroRunLengthEncoding.hpp +
rANS stage; lossless_type at Utilities/Types.h:44-47): runs of the
zero symbol (the Huffman-shift origin dict_size/2 — by far the most common
quantized value) are extracted and the two residual streams (run lengths,
literal values) are entropy-coded with the device rANS codec. Breaks
Huffman's 1-bit/symbol floor on sparse streams.
"""

from __future__ import annotations

import struct

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.compact import masked_indices
from . import rans
from .huffman import _bucket, device_get_prefix

_MAGIC = b"ZRR1"
# run alphabet [0, MAX_RUN] must fit the rANS table (2^SCALE_BITS = 16384
# distinct symbols): with MAX_RUN+1 == table size the quantizer can never
# overflow, whatever the run-length distribution. Longer runs split into
# synthetic (MAX_RUN, zero) pairs below; decode is independent of the
# constant (run values ride inside the rANS blob).
MAX_RUN = 16383


from functools import lru_cache, partial  # noqa: E402


@lru_cache(maxsize=64)
def _extract_jit(cap: int, n: int):
    """Module-level jit keyed on (cap, n): a fresh closure per encode() call
    would defeat the jit cache and retrace every time."""

    @jax.jit
    def extract(sym, mask):
        idx = masked_indices(mask, cap, n)
        vals = sym[jnp.minimum(idx, n - 1)]
        return idx.astype(jnp.int32), vals

    return extract


def encode(symbols, config) -> bytes:
    dict_size = int(config.huff_dict_size)
    zero = dict_size // 2
    n = int(symbols.shape[0])
    if n == 0:
        return struct.pack("<4sQQII", _MAGIC, 0, 0, dict_size, 0)

    sym = symbols.astype(jnp.int32).ravel()
    mask = sym != zero
    count = int(jnp.sum(mask))
    cap = min(max(_bucket(max(count, 1)), 1), n)
    cap = max(cap, count)
    extract = _extract_jit(cap, n)

    idx, vals = extract(sym, mask)
    idx_h = device_get_prefix(idx, count).astype(np.int64)
    vals_h = device_get_prefix(vals, count).astype(np.int32)

    # runs of zeros before each literal; long runs split with synthetic
    # zero literals so run values stay < MAX_RUN + 1. Fully vectorized:
    # literal i is preceded by k_i = runs_i // (MAX_RUN+1) synthetic
    # (MAX_RUN, zero) pairs and lands at position cumsum(k+1)-1.
    prev = np.concatenate([[-1], idx_h[:-1]])
    runs = (idx_h - prev - 1).astype(np.int64)
    k = runs // (MAX_RUN + 1)
    total = int(count + k.sum())
    out_runs = np.full(total, MAX_RUN, np.int32)
    out_vals = np.full(total, zero, np.int32)
    pos = (np.cumsum(k + 1) - 1).astype(np.int64)
    out_runs[pos] = (runs - k * (MAX_RUN + 1)).astype(np.int32)
    out_vals[pos] = vals_h

    if out_runs.size:
        runs_blob = rans.encode(jnp.asarray(out_runs), MAX_RUN + 1, config.huff_block_size)
        vals_blob = rans.encode(jnp.asarray(out_vals), dict_size, config.huff_block_size)
    else:
        runs_blob = b""
        vals_blob = b""
    head = struct.pack("<4sQQII", _MAGIC, n, out_runs.size, dict_size, len(runs_blob))
    return head + runs_blob + vals_blob


def decode(data: bytes):
    magic, n, nnz, dict_size, runs_len = struct.unpack_from("<4sQQII", data, 0)
    if magic != _MAGIC:
        raise ValueError("bad ZeroRLE blob")
    p = struct.calcsize("<4sQQII")
    zero = dict_size // 2
    if n == 0:
        return jnp.zeros((0,), jnp.int32)
    if nnz == 0:
        return jnp.full((n,), zero, jnp.int32)
    runs = np.asarray(rans.decode(bytes(data[p : p + runs_len])))
    vals = np.asarray(rans.decode(bytes(data[p + runs_len :])))
    positions = np.cumsum(runs.astype(np.int64) + 1) - 1
    out = np.full(n, zero, np.int32)
    out[positions] = vals
    return jnp.asarray(out)
