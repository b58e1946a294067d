"""Region-of-interest adaptive error bounds.

Re-design of the reference's adaptive ROI machinery (reference:
include/mgard/adaptive_roi.hpp:14-76 and compress_roi in
include/compress.tpp:34-130): regions of interest are quantized with a
finer step (tol/roi_factor) while the background keeps the global bound.

Instead of the reference's histogram-driven u_map of per-region bin widths,
the ROI is an explicit node mask; a multilevel "refinement map" marks every
coefficient whose basis support intersects the (dilated) ROI, level by
level, in the same nested-box layout as the decomposed data — so the
quantizer applies it as one fused per-node multiplier.
"""

from __future__ import annotations

import numpy as np

from ..hierarchy import Hierarchy
from .axis import split_axis


def _dilate1(m: np.ndarray, axis: int) -> np.ndarray:
    """Max of each node and its +-1 neighbors along axis."""
    a = m
    lo = np.concatenate([a.take([0], axis), np.moveaxis(np.moveaxis(a, axis, 0)[:-1], 0, axis)], axis)
    hi = np.concatenate([np.moveaxis(np.moveaxis(a, axis, 0)[1:], 0, axis), a.take([-1], axis)], axis)
    return np.maximum(a, np.maximum(lo, hi))


def roi_map_nested(mask: np.ndarray, hier: Hierarchy) -> np.ndarray:
    """Multilevel refinement map in nested-box layout (uint8, 1 = refine).

    A level-l coefficient is refined iff the dilated ROI reaches its node:
    the coarse carry-down is max over {2j-1, 2j, 2j+1}, exactly covering the
    interpolation dependence of the removed nodes."""
    assert mask.shape == hier.shape
    out = np.zeros(hier.shape, np.uint8)
    m = np.ascontiguousarray(mask.astype(np.uint8))
    for l in range(hier.l_target, 0, -1):
        for d in range(hier.D):
            m = _dilate1(m, d)
        # reorder the current level's mask and write its coefficient slabs
        reo = m
        for d, al in enumerate(hier.axis[l - 1]):
            c_part, x_part = split_axis(reo, d, al.n_fine)
            reo = np.concatenate([c_part, x_part], axis=d)
        box = tuple(slice(0, s) for s in hier.level_shape[l])
        out[box] = reo
        # coarse carry-down
        coarse = m
        for d, al in enumerate(hier.axis[l - 1]):
            coarse, _ = split_axis(coarse, d, al.n_fine)
        m = np.ascontiguousarray(coarse)
    out[tuple(slice(0, s) for s in hier.level_shape[0])] = m
    return out
