"""Quantizer tests: step-size formulas, round-trip error, outlier capture."""

import math

import numpy as np
import pytest

import mgard_tpu  # noqa: F401
from mgard_tpu.dtypes import error_bound_type
from mgard_tpu.hierarchy import Hierarchy
from mgard_tpu.ops import quantize as Q


def test_quantizer_formulas_match_reference():
    """Reference CalcQuantizers (LinearQuantization.hpp:234-298)."""
    hier = Hierarchy((33, 33), np.float64)
    L = hier.l_target
    tol = 1e-2
    # s=inf hierarchical: abs_tol*2/(L+1)
    q = hier.quantizers(tol, math.inf, 0.0, error_bound_type.ABS, orthogonal_projection=False)
    assert np.allclose(q, 2 * tol / (L + 1))
    # s=inf orthogonal: extra 1/(1+3^D)
    q2 = hier.quantizers(tol, math.inf, 0.0, error_bound_type.ABS, orthogonal_projection=True)
    assert np.allclose(q2, 2 * tol / ((L + 1) * (1 + 3.0**2)))
    # REL multiplies by norm
    q3 = hier.quantizers(tol, math.inf, 5.0, error_bound_type.REL, orthogonal_projection=False)
    assert np.allclose(q3, 5.0 * 2 * tol / (L + 1))
    # s finite: abs_tol*2 / (2^{s l} sqrt(dof))
    s = 1.0
    q4 = hier.quantizers(tol, s, 0.0, error_bound_type.ABS)
    dof = hier.total_num_elems
    expect = [2 * tol / (2 ** (s * l) * math.sqrt(dof)) for l in range(L + 1)]
    assert np.allclose(q4, expect)


@pytest.mark.parametrize("s", [math.inf, 0.0])
def test_quantize_dequantize_error_within_half_step(s):
    hier = Hierarchy((17, 17), np.float64)
    rng = np.random.default_rng(0)
    dec = rng.standard_normal((17, 17)) * 0.01
    quant = hier.quantizers(1e-3, s, 0.0, error_bound_type.ABS, orthogonal_projection=not math.isinf(s))
    res = Q.quantize(dec, hier, quant, s, True, 8192, 512)
    assert int(res.outlier_count) == 0
    back = np.asarray(
        Q.dequantize(res.quantized, hier, quant, s, True, 8192, res.outlier_idx, res.outlier_val)
    )
    # error per node <= half its level's step (x volume factor when s finite)
    levels = np.asarray(Q.node_levels(hier))
    if math.isinf(s):
        step = quant[levels]
    else:
        step = quant[levels] / hier.vol_sqrt[levels]
    assert np.all(np.abs(back - dec) <= step / 2 + 1e-15)


def test_outlier_capture_and_restore():
    hier = Hierarchy((33,), np.float64)
    rng = np.random.default_rng(1)
    dec = rng.standard_normal(33) * 1e-3
    dec[5] = 100.0  # monstrous coefficient -> outlier
    dec[20] = -50.0
    quant = hier.quantizers(1e-4, math.inf, 0.0, error_bound_type.ABS, orthogonal_projection=False)
    res = Q.quantize(dec, hier, quant, math.inf, True, 8192, 16)
    assert int(res.outlier_count) == 2
    back = np.asarray(
        Q.dequantize(res.quantized, hier, quant, math.inf, True, 8192, res.outlier_idx, res.outlier_val)
    )
    step = quant[0]
    assert np.all(np.abs(back - dec) <= step / 2 + 1e-12)


def test_outlier_overflow_reports_true_count():
    hier = Hierarchy((33,), np.float64)
    dec = np.full(33, 10.0)
    quant = hier.quantizers(1e-5, math.inf, 0.0, error_bound_type.ABS, orthogonal_projection=False)
    res = Q.quantize(dec, hier, quant, math.inf, True, 8192, 4)
    assert int(res.outlier_count) == 33  # true count even though capacity=4
