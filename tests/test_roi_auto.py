"""Automatic ROI detection (reference: adaptive_roi.hpp hist_blc_coord /
filter_hist_blc / amr_gb driven from compress_roi, compress.tpp:64-130).

The detector must reproduce the reference's selection behavior: on a field
that is smooth background + a localized feature, the kept blocks cover the
feature (high mean |multilevel coefficient|) and exclude most of the
background, and the auto mask drives the existing refinement-map machinery
end-to-end with both bounds certified.
"""

import math

import numpy as np

import mgard_tpu
from mgard_tpu.dtypes import compress_status_type
from mgard_tpu.hierarchy import get_hierarchy
from mgard_tpu.highlevel import compress_roi, decompress
from mgard_tpu.ops.roi import coefficient_magnitude_map, detect_roi


def _feature_field(shape, center, width, amp=1.0, noise=0.0, seed=3):
    axes = np.meshgrid(*[np.linspace(0, 1, n) for n in shape], indexing="ij")
    r2 = sum((a - c) ** 2 for a, c in zip(axes, center))
    smooth = sum(np.sin(2 * np.pi * a) for a in axes) * 0.1
    # sharply-varying localized feature: high multilevel detail inside only
    feature = amp * np.exp(-r2 / width**2) * np.sin(60 * np.pi * axes[0])
    out = smooth + feature
    if noise:
        out += noise * np.random.default_rng(seed).standard_normal(shape)
    return out.astype(np.float64)


def test_detector_selects_the_feature_region():
    shape = (65, 65)
    v = _feature_field(shape, (0.3, 0.7), 0.12)
    hier = get_hierarchy(shape, v.dtype, None, mgard_tpu.Config())
    mask = detect_roi(v, hier, thresh=(0.25, 0.5))
    assert mask.shape == shape and mask.dtype == bool
    # the feature center must be selected
    assert mask[int(0.3 * 64), int(0.7 * 64)]
    # the far corner (pure smooth background) must not be
    assert not mask[60:, :5].any()
    # selection is a region, not the whole domain
    frac = mask.mean()
    assert 0.01 < frac < 0.6


def test_block_scores_rank_feature_over_background():
    # filter_hist_blc parity: mean |coefficient| in feature blocks beats
    # background blocks
    shape = (65, 65)
    v = _feature_field(shape, (0.25, 0.25), 0.1)
    hier = get_hierarchy(shape, v.dtype, None, mgard_tpu.Config())
    mag = coefficient_magnitude_map(v, hier)
    feat = mag[8:24, 8:24].mean()
    bg = mag[48:, 48:].mean()
    assert feat > 10 * bg


def test_detector_respects_depth_and_fraction():
    shape = (65, 65)
    v = _feature_field(shape, (0.5, 0.5), 0.1)
    hier = get_hierarchy(shape, v.dtype, None, mgard_tpu.Config())
    tight = detect_roi(v, hier, thresh=(0.125,), buffer_radius=0)
    loose = detect_roi(v, hier, thresh=(0.5,), buffer_radius=0)
    assert tight.sum() < loose.sum()
    assert (tight & ~loose).sum() == 0 or tight.sum() <= loose.sum()


def test_compress_roi_auto_end_to_end():
    # feature on a noisy background (the reference's target workload:
    # preserve the feature finely, let the background keep the loose
    # bound): uniformly-fine compression must pay for the noise, the
    # auto-ROI stream must not
    shape = (65, 65, 65)
    v = _feature_field(shape, (0.4, 0.6, 0.5), 0.12, noise=5e-3)
    tol, factor = 1e-2, 100.0
    det = {"thresh": (0.125, 0.5), "buffer_radius": 2}
    blob, st = compress_roi(v, tol, roi_factor=factor, roi_detect=det)  # no mask: auto
    assert st == compress_status_type.Success
    out, st2 = decompress(blob)
    assert st2 == compress_status_type.Success
    # global bound everywhere
    assert np.max(np.abs(out - v)) <= tol
    # the fine bound holds where the detector marked (recover the mask the
    # same way the compressor derived it)
    hier = get_hierarchy(shape, v.dtype, None, mgard_tpu.Config())
    mask = detect_roi(v, hier, **det)
    assert mask[int(0.4 * 64), int(0.6 * 64), int(0.5 * 64)]
    assert np.max(np.abs((out - v)[mask])) <= tol / factor
    # cheaper than uniformly-fine compression
    fine, _ = mgard_tpu.compress(v, tol / factor, math.inf)
    assert len(blob) < len(fine)


def test_compress_roi_explicit_mask_still_works():
    v = _feature_field((33, 33), (0.5, 0.5), 0.2)
    mask = np.zeros(v.shape, bool)
    mask[10:20, 10:20] = True
    blob, st = compress_roi(v, 1e-2, mask, roi_factor=50.0)
    assert st == compress_status_type.Success
    out, _ = decompress(blob)
    assert np.max(np.abs((out - v)[mask])) <= 1e-2 / 50.0
