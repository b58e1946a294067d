"""Function-space norms (ops/norms.py) and the reference's canonical
compression property: ||u - decompress(compress(u, s, tol))||_s <= tol
over an (s, tol) grid (reference tests/mgard/src/test_compress.cpp:26-80,
with mgard::norm from include/mgard/TensorNorms.hpp as the oracle)."""

import math

import numpy as np
import pytest

import mgard_tpu
from mgard_tpu.hierarchy import get_hierarchy
from mgard_tpu.ops.norms import (
    norm,
    norm_hier,
    orthogonal_component_square_norms,
)


def _smooth_field(shape, seed=343873, modes=6):
    rng = np.random.default_rng(seed)
    grids = np.meshgrid(
        *[np.linspace(0, 1, n) for n in shape], indexing="ij"
    )
    u = np.zeros(shape)
    for _ in range(modes):
        ks = rng.integers(1, 6, len(shape))
        amp = rng.uniform(0.3, 1.0)
        ph = rng.uniform(0, 2 * np.pi)
        phase = sum(k * g for k, g in zip(ks, grids))
        u += amp * np.sin(2 * np.pi * phase + ph)
    return u


def test_norm_exact_values():
    """Constants and linear functions have closed-form integral norms on
    [0,1]^D; the mass-based s=0 norm must hit them to f64 precision,
    including on even axes (real mesh, no ghost-extension leakage)."""
    for shape in [(33,), (32,), (17, 18), (9, 8, 11)]:
        assert abs(norm(np.ones(shape), 0.0) - 1.0) < 1e-12
    x = np.linspace(0, 1, 32)
    assert abs(norm(x, 0.0) ** 2 - 1.0 / 3.0) < 1e-12  # int x^2 = 1/3
    assert norm(x, np.inf) == 1.0
    assert norm(np.zeros((5, 5)), 0.5) == 0.0


def test_norm_component_orthogonality():
    """A function interpolated from level-l data (built with the norm's
    own geometric prolongation) has zero components above l — pins the
    Galerkin consistency R = P^T, M_c = P^T M_f P on the true mesh."""
    from mgard_tpu.ops.norms import _lerp_t, _level_positions

    for shape, coords in [
        ((33, 33), None),
        ((16, 17), None),
        ((32,), None),
        ((12,), None),
    ]:
        hier = get_hierarchy(shape, np.float64, coords, None)
        rng = np.random.default_rng(1)
        u = rng.standard_normal(hier.level_shape[0])
        # geometric prolongation chain level 0 -> L
        for l in range(1, hier.l_target + 1):
            for d in range(hier.D):
                t = _lerp_t(hier, l, d)
                nf = hier.level_shape[l][d]
                um = np.moveaxis(u, d, 0)
                out_shape = (nf,) + um.shape[1:]
                out = np.zeros(out_shape)
                if nf % 2 == 1:
                    out[0:nf:2] = um
                    left, right = um[:-1], um[1:]
                else:
                    out[0 : nf - 1 : 2] = um[:-1]
                    out[nf - 1] = um[-1]
                    left, right = um[: um.shape[0] - 2], um[1 : um.shape[0] - 1]
                n_coeff = left.shape[0]
                tb = t.reshape((n_coeff,) + (1,) * (um.ndim - 1))
                out[1 : 2 * n_coeff : 2] = (1 - tb) * left + tb * right
                u = np.moveaxis(out, 0, d)
        comp = orthogonal_component_square_norms(u, hier)
        assert comp[0] > 0
        assert (comp[1:] / comp[0]).max() < 1e-12, (shape, comp)


def test_norm_s_weighting():
    comp_shape = (33, 33)
    hier = get_hierarchy(comp_shape, np.float64, None, None)
    rng = np.random.default_rng(2)
    rough = rng.standard_normal(comp_shape)
    # rough data is dominated by fine levels: its s-norm grows with s
    n_m, n_0, n_p = (norm_hier(rough, hier, s) for s in (-1.0, 0.0, 1.0))
    assert n_m < n_0 < n_p
    # norm is a norm: homogeneous and triangle-inequality-ish
    assert abs(norm_hier(2.0 * rough, hier, 0.7) - 2.0 * norm_hier(rough, hier, 0.7)) < 1e-9


@pytest.mark.parametrize("shape", [(33, 34), (34, 34)])
def test_compress_snorm_bound_grid(shape):
    """The reference's canonical integration property
    (test_compress.cpp:26-66): compress/decompress over an (s, tol) grid
    and assert the ERROR BOUND ITSELF, measured in the s-norm, holds.
    Includes negative s on even shapes — the case that requires the
    geometry-true dist routing in highlevel.compress."""
    u = _smooth_field(shape)
    hier = get_hierarchy(shape, np.float64, None, None)
    hier_t = get_hierarchy(
        shape, np.float64, [np.linspace(0, 1, n) for n in shape], None
    )
    for s in [-1.5, -0.5, 0.0, 0.5, 1.5, math.inf]:
        for tol in [0.1, 0.001]:
            blob, st = mgard_tpu.compress(
                u, tol=tol, s=s, mode=mgard_tpu.error_bound_type.ABS
            )
            assert st == mgard_tpu.compress_status_type.Success
            out, st2 = mgard_tpu.decompress(blob)
            assert st2 == mgard_tpu.compress_status_type.Success
            err = np.asarray(out, np.float64) - u
            # negative s streams carry explicit coords; measure on the
            # matching (identical) mesh either way
            h = hier_t if (not math.isinf(s) and s < 0) else hier
            e = norm_hier(err, h, s)
            assert e <= tol, (s, tol, e)


def test_negative_s_even_axes_uses_true_geometry():
    """Regression for the uniform-mode negative-s gap: without the
    geometry-true routing, (34,34) at s=-1.5 overshoots tol by ~3.8x in
    the true s-norm. The compressed stream must carry explicit coords."""
    from mgard_tpu.formats.metadata import Metadata

    u = _smooth_field((34, 34))
    blob, _ = mgard_tpu.compress(
        u, tol=1e-2, s=-1.5, mode=mgard_tpu.error_bound_type.ABS
    )
    meta, _off = Metadata.deserialize(blob)
    assert meta.coords is not None and len(meta.coords) == 2
