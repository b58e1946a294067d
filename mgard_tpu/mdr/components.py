"""MDR component kit: interleaver, error estimators, size interpreter.

Re-designs of the reference's pluggable MDR-X components:
  * DirectInterleaver (reference: MDR-X/Interleaver/DirectInterleaver.hpp) —
    level-linearized streams. Our decomposed array is already in nested-box
    layout, so interleaving is slab extraction + ravel.
  * MaxErrorEstimatorOB / SNormErrorEstimator (reference:
    MDR-X/ErrorEstimator/) — map per-level per-bitplane error tables to a
    global bound.
  * GreedyBasedSizeInterpreter (reference:
    MDR-X/SizeInterpreter/GreedyBasedSizeInterpreter.hpp:23-333) — pick per
    level bitplane counts by error-reduction-per-byte until the target
    tolerance is met.
"""

from __future__ import annotations

import heapq
import math
from typing import List, Sequence, Tuple

from ..hierarchy import Hierarchy


def level_regions(hier: Hierarchy, l: int) -> List[Tuple[slice, ...]]:
    """Slab regions of level l in the nested-box layout."""
    D = hier.D
    if l == 0:
        return [tuple(slice(0, s) for s in hier.level_shape[0])]
    fine = hier.level_shape[l]
    coarse = hier.level_shape[l - 1]
    regions = []
    for mask in range(1, 2**D):
        sl = tuple(
            slice(coarse[d], fine[d]) if (mask >> d) & 1 else slice(0, coarse[d])
            for d in range(D)
        )
        if all(s.stop > s.start for s in sl):
            regions.append(sl)
    return regions


# interleaver modes (reference: MDR-X/Interleaver/{Direct,Blocked,SFC}
# Interleaver.hpp). Blocked emits each region in BxBx..xB spatial tiles so
# nearby coefficients share bitplane words — implemented as pure
# reshape/transpose (scatter-free); a region whose dims don't all divide B
# falls back to direct order (deterministic rule shared by both sides).
# SFC emits each region in Morton (Z-order) — the space-filling curve the
# reference's SFCInterleaver targets (its z_order_data_collection /
# skip-one collection, SFCInterleaver.hpp:70-80) — realized scatter-free
# as a bit-axis transpose; dims must all be the same power of two, else
# the region falls back to blocked/direct by the shared deterministic rule.
INTERLEAVE_DIRECT = 0
INTERLEAVE_BLOCKED = 1
INTERLEAVE_SFC = 2
BLOCK_B = 4


def _blocked_ok(shape, B: int = BLOCK_B) -> bool:
    return len(shape) >= 2 and all(s % B == 0 and s >= B for s in shape)


def _sfc_ok(shape) -> bool:
    s0 = shape[0]
    return (
        len(shape) >= 2
        and s0 >= 2
        and (s0 & (s0 - 1)) == 0
        and all(s == s0 for s in shape)
    )


def _morton_fwd(box):
    """Morton-order ravel of a (2^k,)*D box: split every dim into k bit
    axes and transpose to bit-major (MSB first), interleaving dims."""
    shape = tuple(int(s) for s in box.shape)
    D = len(shape)
    k = shape[0].bit_length() - 1
    x = box.reshape((2,) * (k * D))
    # input axis j*k + b = bit b (MSB first) of dim j; Morton output order
    # interleaves dims per bit: (MSB of every dim, next bit of every dim, ...)
    perm = tuple(j * k + b for b in range(k) for j in range(D))
    return x.transpose(perm).ravel()


def _morton_inv(flat, shape):
    shape = tuple(int(s) for s in shape)
    D = len(shape)
    k = shape[0].bit_length() - 1
    x = flat.reshape((2,) * (k * D))
    # inverse permutation of _morton_fwd
    perm = [0] * (k * D)
    for b in range(k):
        for j in range(D):
            perm[j * k + b] = b * D + j
    return x.transpose(perm).reshape(shape)


def region_interleave(box, mode: int):
    """Flatten one region box in the selected interleave order."""
    shape = tuple(int(s) for s in box.shape)
    if mode == INTERLEAVE_SFC:
        if _sfc_ok(shape):
            return _morton_fwd(box)
        mode = INTERLEAVE_BLOCKED  # deterministic fallback chain
    if mode == INTERLEAVE_BLOCKED and _blocked_ok(shape):
        D = len(shape)
        B = BLOCK_B
        split = []
        for s in shape:
            split += [s // B, B]
        x = box.reshape(split)
        perm = tuple(range(0, 2 * D, 2)) + tuple(range(1, 2 * D, 2))
        return x.transpose(perm).ravel()
    return box.ravel()


def region_deinterleave(flat, shape, mode: int):
    """Inverse of region_interleave -> array of `shape`."""
    shape = tuple(int(s) for s in shape)
    if mode == INTERLEAVE_SFC:
        if _sfc_ok(shape):
            return _morton_inv(flat, shape)
        mode = INTERLEAVE_BLOCKED
    if mode == INTERLEAVE_BLOCKED and _blocked_ok(shape):
        D = len(shape)
        B = BLOCK_B
        grid = [s // B for s in shape]
        x = flat.reshape(tuple(grid) + (B,) * D)
        perm = []
        for d in range(D):
            perm += [d, D + d]
        y = x.transpose(perm)
        return y.reshape(shape)
    return flat.reshape(shape)


def interleave_level(dec, hier: Hierarchy, l: int, mode: int = INTERLEAVE_DIRECT):
    """Extract level l's coefficients as one flat stream."""
    import jax.numpy as jnp

    parts = [region_interleave(dec[r], mode) for r in level_regions(hier, l)]
    return jnp.concatenate(parts) if len(parts) > 1 else parts[0]


def deinterleave_level(out, stream, hier: Hierarchy, l: int,
                       mode: int = INTERLEAVE_DIRECT):
    """Write a flat level stream back into the nested-box array `out`
    (a NumPy array, modified in place)."""
    import numpy as np

    off = 0
    for r in level_regions(hier, l):
        shape = tuple(s.stop - s.start for s in r)
        n = int(np.prod(shape))
        out[r] = np.asarray(
            region_deinterleave(stream[off : off + n], shape, mode)
        )
        off += n
    return out


def level_num_elems(hier: Hierarchy, l: int) -> int:
    import numpy as np

    if l == 0:
        return int(np.prod(hier.level_shape[0]))
    return int(np.prod(hier.level_shape[l])) - int(np.prod(hier.level_shape[l - 1]))


# ----------------------------------------------------------------------
# Error estimation + greedy retrieval planning
# ----------------------------------------------------------------------
def estimate_error(meta, counts: Sequence[int], s: float) -> float:
    """Global error bound when using counts[l] magnitude planes per level.

    L-inf (s=inf): sum over levels of per-level max errors (hierarchical
    prolongation is a partition of unity -> amplification <= 1 per level).
    L2 (s finite): triangle inequality over levels, with each level's
    coefficient-domain error amplified by the footprint of its basis
    functions on the finest grid (~2^{D(L-l)} nodes per coefficient) —
    the role of the reference's SNormErrorEstimator
    (MDR-X/ErrorEstimator/SNormErrorEstimator.hpp).
    """
    if math.isinf(s):
        tot = float(sum(m.err_max[c] for m, c in zip(meta.levels, counts)))
        if getattr(meta, "orthogonal", False):
            # L2-orthogonal basis: recomposition routes coefficient errors
            # through the mass-matrix correction as well as the
            # interpolant, so the per-level L-inf amplification exceeds 1
            # (reference distinguishes MaxErrorEstimatorOB from ...HB,
            # MDR-X/ErrorEstimator/). Factor 2 bounds the correction
            # operator's contribution.
            tot *= 2.0
        return tot
    L = len(meta.levels) - 1
    D = len(meta.shape)
    total = 0.0
    for l, (m, c) in enumerate(zip(meta.levels, counts)):
        amp = 2.0 ** (D * (L - l))
        total += math.sqrt(float(m.err_sq[c]) * amp)
    return total / math.sqrt(meta.total_num_elems)


def interpret_retrieve_size(meta, tol: float, s: float) -> List[int]:
    """Greedy (error-reduction / byte) plane selection.

    Returns per-level magnitude-plane counts such that the estimated global
    error is <= tol (or all planes are used)."""
    L = len(meta.levels)
    counts = [0] * L
    B = meta.number_bitplanes

    sr = getattr(meta, "sign_rows", 1)

    def gain(l, b):
        lm = meta.levels[l]
        if math.isinf(s):
            red = float(lm.err_max[b] - lm.err_max[b + 1])
        else:
            red = float(lm.err_sq[b] - lm.err_sq[b + 1])
        cost = lm.plane_sizes[b + sr]  # magnitude plane b's stored row
        if b == 0 and sr:
            cost += lm.plane_sizes[0]  # first plane pulls the sign plane too
        return red / max(cost, 1)

    heap = [(-gain(l, 0), l) for l in range(L)]
    heapq.heapify(heap)
    while heap and estimate_error(meta, counts, s) > tol:
        _, l = heapq.heappop(heap)
        counts[l] += 1
        if counts[l] < B:
            heapq.heappush(heap, (-gain(l, counts[l]), l))
    return counts
