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


def interleave_level(dec, hier: Hierarchy, l: int):
    """Extract level l's coefficients as one flat stream."""
    import jax.numpy as jnp

    parts = [dec[r].ravel() for r in level_regions(hier, l)]
    return jnp.concatenate(parts) if len(parts) > 1 else parts[0]


def deinterleave_level(out, stream, hier: Hierarchy, l: int):
    """Write a flat level stream back into the nested-box array `out`
    (a NumPy array, modified in place)."""
    import numpy as np

    off = 0
    for r in level_regions(hier, l):
        shape = tuple(s.stop - s.start for s in r)
        n = int(np.prod(shape))
        out[r] = np.asarray(stream[off : off + n]).reshape(shape)
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
