"""Error statistics (reference: include/mgard-x/Utilities/ErrorCalculator.h:22-120)."""

from __future__ import annotations

import math

import numpy as np

from ..dtypes import error_bound_type


def L_inf_norm(v) -> float:
    return float(np.max(np.abs(v)))


def L_2_norm(v) -> float:
    return float(np.sqrt(np.sum(np.asarray(v, np.float64) ** 2)))


def L_inf_error(original, decompressed, mode=error_bound_type.ABS) -> float:
    err = float(np.max(np.abs(np.asarray(original, np.float64) - decompressed)))
    if mode == error_bound_type.REL:
        rng = float(np.max(original) - np.min(original))
        return err / rng if rng else err
    return err


def L_2_error(original, decompressed) -> float:
    return float(
        np.sqrt(np.mean((np.asarray(original, np.float64) - decompressed) ** 2))
    )


def MSE(original, decompressed) -> float:
    return float(np.mean((np.asarray(original, np.float64) - decompressed) ** 2))


def PSNR(original, decompressed) -> float:
    mse = MSE(original, decompressed)
    rng = float(np.max(original) - np.min(original))
    if mse == 0 or rng == 0:
        return math.inf
    return 20 * math.log10(rng) - 10 * math.log10(mse)
