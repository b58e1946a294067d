"""Error statistics vs closed-form values (reference:
ErrorCalculator.h:22-120 — same definitions: REL L_inf divides by the data
range; PSNR is 20 log10(range) - 10 log10(MSE))."""

import math

import numpy as np

from mgard_tpu.dtypes import error_bound_type
from mgard_tpu.utils import error_calculator as ec


def test_norms_and_errors_closed_form():
    a = np.array([3.0, -4.0, 0.0], np.float32)
    assert ec.L_inf_norm(a) == 4.0
    assert abs(ec.L_2_norm(a) - 5.0) < 1e-12

    orig = np.array([0.0, 1.0, 2.0, 4.0])
    dec = orig + np.array([0.5, -0.25, 0.0, 0.25])
    assert ec.L_inf_error(orig, dec) == 0.5
    # REL divides by the range (4.0)
    assert ec.L_inf_error(orig, dec, error_bound_type.REL) == 0.125
    mse = (0.5**2 + 0.25**2 + 0 + 0.25**2) / 4
    assert abs(ec.MSE(orig, dec) - mse) < 1e-15
    assert abs(ec.L_2_error(orig, dec) - math.sqrt(mse)) < 1e-15
    assert abs(
        ec.PSNR(orig, dec) - (20 * math.log10(4.0) - 10 * math.log10(mse))
    ) < 1e-12


def test_psnr_degenerate_cases():
    a = np.array([1.0, 2.0])
    assert ec.PSNR(a, a.copy()) == math.inf          # zero error
    c = np.array([5.0, 5.0])
    assert ec.PSNR(c, c + 0.1) == math.inf           # zero range
    # zero-range REL falls back to the absolute error
    assert abs(ec.L_inf_error(c, c + 0.1, error_bound_type.REL) - 0.1) < 1e-12
