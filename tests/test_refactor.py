"""Transform tests: decompose∘recompose ≈ identity and coefficient decay.

Modeled on the reference's test_DataRefactoring (reference:
tests/mgard-x/test_DataRefactoring.cpp.in:20-50 — identity to 1e-10 double /
1e-3 float). The broad shape/dtype matrix runs on the NumPy host oracle
(instant, no XLA compiles — the analogue of the reference's SERIAL backend
being the oracle); JAX/XLA equivalence against the oracle is checked on a
small representative set.
"""

import numpy as np
import pytest

import mgard_tpu  # noqa: F401  (configures jax x64 + compile cache)
from mgard_tpu.hierarchy import Hierarchy
from mgard_tpu.ops.refactor import decompose, recompose

SHAPES = [
    (17,),
    (16,),
    (33,),
    (100,),
    (257,),
    (5, 5),
    (17, 17),
    (16, 20),
    (33, 9),
    (65, 31, 7),
    (17, 16, 5),
    (9, 9, 9, 9),
    (5, 6, 7, 8, 9),
]


def _rng(seed=0):
    return np.random.default_rng(seed)


@pytest.mark.parametrize("shape", SHAPES)
@pytest.mark.parametrize("dtype,tol", [(np.float64, 1e-10), (np.float32, 1e-3)])
@pytest.mark.parametrize("orthogonal", [True, False])
def test_roundtrip_identity_uniform(shape, dtype, tol, orthogonal):
    hier = Hierarchy(shape, dtype)
    v = _rng(abs(hash(shape)) % 2**31).standard_normal(shape).astype(dtype)
    dec = decompose(v, hier, orthogonal)
    rec = recompose(dec, hier, orthogonal)
    err = np.max(np.abs(rec - v)) / max(np.max(np.abs(v)), 1e-30)
    assert err < tol, f"roundtrip rel err {err} for {shape} {dtype}"


@pytest.mark.parametrize("shape", [(33,), (40,), (17, 21), (16, 16, 16)])
@pytest.mark.parametrize("orthogonal", [True, False])
def test_roundtrip_identity_nonuniform(shape, orthogonal):
    rng = _rng(42)
    coords = [np.sort(rng.uniform(0, 1, n)) for n in shape]
    for c in coords:
        c[0], c[-1] = 0.0, 1.0
    hier = Hierarchy(shape, np.float64, coords=coords)
    v = rng.standard_normal(shape)
    dec = decompose(v, hier, orthogonal)
    rec = recompose(dec, hier, orthogonal)
    err = np.max(np.abs(rec - v))
    assert err < 1e-10, f"nonuniform roundtrip err {err}"


def test_jax_matches_numpy_oracle():
    """The XLA path must agree with the host oracle to float roundoff."""
    import jax
    import jax.numpy as jnp

    for shape in [(17,), (16, 20)]:
        hier = Hierarchy(shape, np.float64)
        v = _rng(7).standard_normal(shape)
        dec_np = decompose(v, hier, True)
        dec_jax = np.asarray(jax.jit(lambda x, h=hier: decompose(x, h, True))(jnp.asarray(v)))
        assert np.max(np.abs(dec_np - dec_jax)) < 1e-12
        rec_jax = np.asarray(
            jax.jit(lambda x, h=hier: recompose(x, h, True))(jnp.asarray(dec_jax))
        )
        assert np.max(np.abs(rec_jax - v)) < 1e-12


def test_decompose_layout():
    """Nested-box layout: the level-0 box is the coarsest grid."""
    shape = (33, 33)
    hier = Hierarchy(shape, np.float64)
    v = _rng(1).standard_normal(shape)
    dec = decompose(v, hier)
    assert dec.shape == shape
    assert hier.level_shape[0] == (2, 2)


def test_coefficient_decay_smooth_function():
    """For a smooth function, finest-level coefficients must be much smaller
    than the data scale — the multigrid property that drives compression."""
    n = 129
    x = np.linspace(0, 1, n)
    X, Y = np.meshgrid(x, x, indexing="ij")
    v = np.sin(4 * np.pi * X) * np.cos(3 * np.pi * Y)
    hier = Hierarchy((n, n), np.float64)
    dec = decompose(v, hier)
    nc = hier.level_shape[hier.l_target - 1]
    finest = dec.copy()
    finest[: nc[0], : nc[1]] = 0.0
    assert np.max(np.abs(finest)) < 0.02 * np.max(np.abs(v))


def test_interp_exact_on_multilinear_data():
    """Multilinear data on a dyadic grid has zero hierarchical coefficients."""
    n = 17
    x = np.linspace(0, 1, n)
    X, Y = np.meshgrid(x, x, indexing="ij")
    v = 2.0 * X + 3.0 * Y + 5.0 * X * Y + 1.0
    hier = Hierarchy((n, n), np.float64)
    dec = decompose(v, hier, orthogonal=False)
    nc = hier.level_shape[hier.l_target - 1]
    coeffs = dec.copy()
    coeffs[: nc[0], : nc[1]] = 0.0
    assert np.max(np.abs(coeffs)) < 1e-12
