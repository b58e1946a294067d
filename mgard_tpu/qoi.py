"""Quantity-of-interest preserving compression.

Re-design of the reference TensorQuantityOfInterest
(reference: include/mgard/TensorQuantityOfInterest.hpp:15-42 — the operator
norm of a linear functional bounds |Q(u) - Q(u~)| by ||Q|| * ||u - u~||_s,
so compressing at tol/||Q|| preserves the QoI to tol).

For a linear functional Q(u) = sum_i w_i u_i the operator norms used here
are exact Hoelder duals of this framework's certified error norms:
  * s = inf  (L_inf bound on u - u~):       ||Q|| = sum_i |w_i|
  * s = 0    (RMS bound on u - u~):          ||Q|| = sqrt(N) * ||w||_2
Both give certifiable |Q(u) - Q(u~)| <= tol guarantees (conservative
relative to the reference's sharper multilevel Riesz-representative norm,
but never wrong).
"""

from __future__ import annotations

import math
from typing import Optional

import numpy as np

from .config import Config
from .dtypes import error_bound_type
from .highlevel import compress


class TensorQuantityOfInterest:
    """Operator norm of a linear functional over a grid."""

    def __init__(self, weights):
        self.weights = np.asarray(weights, np.float64)

    def norm(self, s: float) -> float:
        """||Q|| such that |Q(e)| <= ||Q|| * ||e||_s for the framework's
        certified s-norms (s=inf: pointwise max; s=0: RMS)."""
        w = self.weights
        if math.isinf(s):
            return float(np.sum(np.abs(w)))
        if s == 0.0:
            return float(math.sqrt(w.size) * np.sqrt(np.sum(w * w)))
        raise NotImplementedError("QoI operator norms support s in {inf, 0}")

    def __call__(self, u) -> float:
        return float(np.sum(self.weights * np.asarray(u, np.float64)))


def compress_qoi(
    data,
    qoi: TensorQuantityOfInterest,
    qoi_tol: float,
    s: float = 0.0,
    config: Optional[Config] = None,
    coords=None,
):
    """Compress so that |Q(u) - Q(u~)| <= qoi_tol for the given linear QoI.

    Returns (blob, status, data_tol) where data_tol is the derived
    field-error tolerance (reference: examples/qoi/average.cpp pattern)."""
    data_tol = qoi_tol / qoi.norm(s)
    blob, st = compress(
        data, tol=data_tol, s=s, mode=error_bound_type.ABS, config=config, coords=coords
    )
    return blob, st, data_tol
