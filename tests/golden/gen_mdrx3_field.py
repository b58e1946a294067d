"""Deterministic 105^3 f32 field for the compressed-group MDR-X golden.

Engineered so the reference HybridLevelCompressor's BOTH compressed wire
forms fire on the finest level (merged 4-plane group 1,008,768 B > the
1 MB gate; HybridLevelCompressor.hpp:86-115), in an order where the RLE
group is compressed BEFORE any Huffman serialize runs (the reference's
experimental Huffman-group path corrupts its heap at serialize time —
nondeterministically surviving to process exit — so nothing downstream
may depend on post-Huffman state):

  group 0 (planes 0-3 + the sign plane): every value is POSITIVE and all
      |coef| < 2^-6 * abs_max -> the whole group is zero   ->  MGXRLEC
  group 1 (planes 4-7): a subset of finest coefficients (chosen per
      level-linearized index j by a repeating 4-byte pattern over
      j // NF) get magnitudes inside [2^(exp-6), 2^(exp-5)) so their
      plane-5 bits spell the pattern into every u32 word: adjacent
      bytes always differ (RLE runs of length 1 -> CR ~0.5, rejected)
      over a ~5-symbol-dominated alphabet + two random-ish mantissa
      planes  -> byte-Huffman CR ~4 >= 2                    ->  MGXHUFF

A 1.5 spike at an all-odd node pins the finest level's abs_max (and its
frexp exponent) regardless of the band contents. In the hierarchical
(interpolation-subtract) basis a finest coefficient is v(node) minus the
multilinear interpolant of all-even corner nodes, so magnitudes are
controlled by keeping each band well clear of the interpolant range.
The (level-linearized j) -> (physical node) map is read off ONE
hierarchical decompose of a probe field that encodes each finest node's
flat index (all-even nodes zero -> finest coefficients = probe values
exactly; integers < 2^53 are exact in f64).

Everything is integer-hash + integer-exact arithmetic: NO libm, so the
field replicates bit-identically on any platform (unlike make_field's
sin/cos). Run as a script to write mdrx3_input.bin for gen_mdrx.cpp.
"""

import os
import sys

import numpy as np

SHAPE = (105, 105, 105)
PATTERN = (0x96, 0x5A, 0xA5, 0x69)  # adjacent bytes all distinct, none 0
SPIKE = (53, 53, 53)  # all-odd node: a finest-level coefficient


def _hash01(i):
    """splitmix-style u64 hash -> exact 24-bit float in [0, 1)."""
    x = (np.asarray(i, np.uint64) * np.uint64(6364136223846793005)
         + np.uint64(1442695040888963407))
    x ^= x >> np.uint64(33)
    x *= np.uint64(0xFF51AFD7ED558CCD)
    x ^= x >> np.uint64(33)
    return (x >> np.uint64(40)).astype(np.float64) / 16777216.0


def make_field3():
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax.numpy as jnp

    from mgard_tpu.config import Config
    from mgard_tpu.formats.mdrx_stream import _BATCH, level_offsets
    from mgard_tpu.hierarchy import get_hierarchy
    from mgard_tpu.ops.refactor import decompose

    cfg = Config()
    cfg.normalize_coordinates = False
    hier = get_hierarchy(SHAPE, np.float64, None, cfg)
    L = hier.l_target

    # (level-linearized j) -> physical flat index, via one probe decompose
    idx = np.indices(SHAPE)
    any_odd = (idx % 2 == 1).any(axis=0)
    flat = np.arange(np.prod(SHAPE), dtype=np.float64).reshape(SHAPE)
    probe = np.where(any_odd, flat + 1.0, 0.0)  # +1: distinguish node 0
    dec = np.asarray(decompose(jnp.asarray(probe), hier, orthogonal=False))
    offsets = level_offsets(hier)
    j_to_phys = dec.ravel()[offsets[L]]
    n_elems = j_to_phys.size
    assert (j_to_phys > 0).all(), "probe decompose left a finest node empty"
    j_to_phys = (j_to_phys - 1.0).astype(np.int64)

    # all-positive bands: even nodes [0.2, 0.4]e-3 (the interpolant pool),
    # finest nodes [0.5, 0.7]e-3 (> interpolant, so coefficients stay
    # positive and below 2^-7 * abs_max: planes 0-7 and the signs all zero)
    n = int(np.prod(SHAPE))
    u = _hash01(np.arange(n))
    v = np.where(any_odd.ravel(),
                 0.5e-3 * (1.0 + 0.4 * u), 0.2e-3 * (1.0 + u))

    # pattern-selected finest nodes get [0.045, 0.0495] = inside
    # [2^(1-6), 2^(1-5)): their plane-5 bit is set, planes 0-4 clear
    NF = (n_elems + _BATCH - 1) // _BATCH
    data_idx = np.arange(n_elems, dtype=np.int64) // NF
    patt = np.array(PATTERN, np.int64)
    big = ((patt[data_idx // 8] >> (7 - (data_idx % 8))) & 1).astype(bool)
    phys_big = j_to_phys[big]
    v[phys_big] = 0.045 * (1.0 + 0.1 * u[phys_big])

    v = v.astype(np.float32).reshape(SHAPE)
    # 1.5 spike: finest abs_max ~1.5, frexp exp = 1 for any band content
    v[SPIKE] = np.float32(1.5)
    return v


if __name__ == "__main__":
    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.abspath(__file__)), "..", ".."))
    out = sys.argv[1] if len(sys.argv) > 1 else "mdrx3_input.bin"
    make_field3().tofile(out)
    print(f"wrote {out}")
