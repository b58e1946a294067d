"""Hybrid hierarchy refactoring: blockwise 8^3 local decomposition + global
refactor of the coarse remainder.

TPU-native re-design of the reference's InCacheBlock/Hybrid stack
(reference: include/mgard-x/DataRefactoring/InCacheBlock/
Decompose8x8x8.hpp:44-452 - a shared-memory-resident full local
decomposition with 8->5->3->2 index tables - and
CompressionLowLevel/HybridHierarchyCompressor.h:31 /
HybridHierarchyDataRefactor.hpp:21-58, which runs
`num_local_refactoring_level` local passes and a global refactor on the
remainder, with shapes padded to x8).

Instead of per-block shared-memory kernels, the local levels are whole-array
periodic operations: each level's interpolation pass is 1-2 static rolls +
a select with period-8 weight/mask tables, so XLA fuses each level-axis into
~one memory pass and there is no 8^3 blocking structure in the data path at
all. The local chain per axis is 8 -> 5 -> 3 -> 2 over positions
{0..7} -> {0,2,4,6,7} -> {0,4,7} -> {0,7} (the reference's index tables),
with geometric lerp weights. The per-block 2^d corner remainder is gathered
into a compact array (static column slices) and decomposed with the regular
MultiDim transform.

For s=inf the hierarchical quantizer step is level-independent
(reference: LinearQuantization.hpp s=inf rule), so the local coefficient
field quantizes with one scalar and needs no level-reorder at all - the
coefficients stay in physical (interleaved) positions, which is exactly the
layout the BFX codec wants.
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np

from ..hierarchy import Hierarchy, get_hierarchy

# local coarse position chains within an 8-block (reference: IndexTable8x8x8
# / 5x5x5 / 3x3x3, DataRefactoring/InCacheBlock/)
_CHAINS = [
    (0, 1, 2, 3, 4, 5, 6, 7),
    (0, 2, 4, 6, 7),
    (0, 4, 7),
    (0, 7),
]

# per local level: list of (coeff position, left nbr, right nbr, t)
# where value = (1-t)*v[left] + t*v[right]
_LEVEL_CLASSES: List[List[Tuple[int, int, int, float]]] = []
for _lvl in range(3):
    fine = _CHAINS[_lvl]
    coarse = set(_CHAINS[_lvl + 1])
    classes = []
    for i, p in enumerate(fine):
        if p in coarse:
            continue
        # nearest coarse neighbors within the chain
        li = i - 1
        while fine[li] not in coarse:
            li -= 1
        ri = i + 1
        while fine[ri] not in coarse:
            ri += 1
        lp, rp = fine[li], fine[ri]
        t = (p - lp) / (rp - lp)
        classes.append((p, lp, rp, t))
    _LEVEL_CLASSES.append(classes)

# group positions sharing (offsets, weight) into one roll-pair class
_LEVEL_GROUPS: List[List[Tuple[int, int, float, Tuple[int, ...]]]] = []
for _classes in _LEVEL_CLASSES:
    groups: dict = {}
    for p, lp, rp, t in _classes:
        key = (p - lp, rp - p, t)
        groups.setdefault(key, []).append(p)
    _LEVEL_GROUPS.append(
        [(k[0], k[1], k[2], tuple(ps)) for k, ps in groups.items()]
    )


def _axis_tables(n: int, lvl: int, dtype):
    """Full-length periodic weight/mask tables for one local level, one
    entry per (offset, weight) class (positions sharing a stencil share one
    roll pair)."""
    out = []
    for off_l, off_r, t, positions in _LEVEL_GROUPS[lvl]:
        mask = np.zeros(n, bool)
        for p in positions:
            mask[p::8] = True
        out.append((off_l, off_r, float(1.0 - t), float(t), mask))
    return out


def _grid_mask(n: int, lvl: int):
    """Positions present in the local level-lvl grid (period 8)."""
    m = np.zeros(n, bool)
    for p in _CHAINS[lvl]:
        m[p::8] = True
    return m


def _bshape(ndim, axis, n):
    s = [1] * ndim
    s[axis] = n
    return tuple(s)


def _interp_pass(x, axis, lvl, dtype):
    import jax.numpy as jnp

    n = x.shape[axis]
    for off_l, off_r, wl, wr, mask in _axis_tables(n, lvl, dtype):
        bs = _bshape(x.ndim, axis, n)
        cand = jnp.asarray(np.asarray(wl, dtype)) * jnp.roll(x, off_l, axis) + \
            jnp.asarray(np.asarray(wr, dtype)) * jnp.roll(x, -off_r, axis)
        x = jnp.where(jnp.asarray(mask).reshape(bs), cand, x)
    return x


def _coeff_mask3d(shape, lvl):
    """Level-lvl coefficient mask: in the level grid on every axis and fine
    on at least one axis."""
    import jax.numpy as jnp

    D = len(shape)
    in_grid = None
    any_fine = None
    for d, n in enumerate(shape):
        g = _grid_mask(n, lvl)
        f = np.zeros(n, bool)
        for p, _, _, _ in _LEVEL_CLASSES[lvl]:
            f[p::8] = True
        gb = jnp.asarray(g).reshape(_bshape(D, d, n))
        fb = jnp.asarray(f).reshape(_bshape(D, d, n))
        in_grid = gb if in_grid is None else (in_grid & gb)
        any_fine = fb if any_fine is None else (any_fine | fb)
    return in_grid & any_fine


def local_decompose(v, num_levels: int = 3):
    """In-place-style local decomposition: after level l, the level-l fine
    positions hold multilinear-interpolation coefficients; the level-l
    coarse positions keep their original values. All dims must be
    multiples of 8."""
    D = v.ndim
    for lvl in range(num_levels):
        w = v
        for d in range(D):
            w = _interp_pass(w, d, lvl, v.dtype)
        v = jnp_where_sub(v, w, _coeff_mask3d(v.shape, lvl))
    return v


def jnp_where_sub(v, w, mask):
    import jax.numpy as jnp

    return jnp.where(mask, v - w, v)


def local_recompose(x, num_levels: int = 3):
    """Inverse of local_decompose (coarsest local level first)."""
    import jax.numpy as jnp

    D = x.ndim
    for lvl in range(num_levels - 1, -1, -1):
        mask = _coeff_mask3d(x.shape, lvl)
        y = jnp.where(mask, jnp.zeros((), x.dtype), x)
        for d in range(D):
            y = _interp_pass(y, d, lvl, x.dtype)
        x = jnp.where(mask, x + y, x)
    return x


def _rem_cols(num_levels: int):
    return _CHAINS[num_levels]


def extract_remainder(v, num_levels: int = 3):
    """Gather each 8-block's local-coarse corner grid into a compact array
    (static column slices, no gathers)."""
    import jax.numpy as jnp

    cols = _rem_cols(num_levels)
    D = v.ndim
    x = v
    for d in range(D):
        n = x.shape[d]
        g = n // 8
        shp = x.shape[:d] + (g, 8) + x.shape[d + 1 :]
        xr = x.reshape(shp)
        sel = jnp.stack(
            [xr[(slice(None),) * (d + 1) + (c,)] for c in cols], axis=d + 1
        )
        x = sel.reshape(x.shape[:d] + (g * len(cols),) + x.shape[d + 1 :])
    return x


def insert_remainder(coeff_field, rem, num_levels: int = 3):
    """Place remainder values back at their corner positions (zeros
    elsewhere are preserved from coeff_field)."""
    import jax.numpy as jnp

    cols = _rem_cols(num_levels)
    D = coeff_field.ndim
    x = rem
    for d in range(D):
        m = x.shape[d]
        g = m // len(cols)
        shp = x.shape[:d] + (g, len(cols)) + x.shape[d + 1 :]
        xr = x.reshape(shp)
        pieces = []
        prev = -1
        for i, c in enumerate(cols):
            gap = c - prev - 1
            if gap > 0:
                zshp = xr.shape[: d + 1] + (gap,) + xr.shape[d + 2 :]
                pieces.append(jnp.zeros(zshp, xr.dtype))
            pieces.append(
                xr[(slice(None),) * (d + 1) + (slice(i, i + 1),)]
            )
            prev = c
        tail = 7 - cols[-1]
        if tail > 0:
            zshp = xr.shape[: d + 1] + (tail,) + xr.shape[d + 2 :]
            pieces.append(jnp.zeros(zshp, xr.dtype))
        full = jnp.concatenate(pieces, axis=d + 1)
        x = full.reshape(x.shape[:d] + (g * 8,) + x.shape[d + 1 :])
    mask = corner_mask(coeff_field.shape, num_levels)
    return jnp.where(mask, x, coeff_field)


def corner_mask(shape, num_levels: int = 3):
    """Boolean mask of the remainder (local-coarse-in-all-axes) positions."""
    import jax.numpy as jnp

    cols = _rem_cols(num_levels)
    D = len(shape)
    m = None
    for d, n in enumerate(shape):
        md = np.zeros(n, bool)
        for c in cols:
            md[c::8] = True
        mb = jnp.asarray(md).reshape(_bshape(D, d, n))
        m = mb if m is None else (m & mb)
    return m


def hybrid_l_total(shape, num_levels: int, rem_hier: Hierarchy) -> int:
    """Total number of coarsening levels of the hybrid hierarchy."""
    return num_levels + rem_hier.l_target


def remainder_shape(shape, num_levels: int):
    k = len(_rem_cols(num_levels))
    return tuple(s // 8 * k for s in shape)


def pad_to8(shape):
    return tuple((s + 7) // 8 * 8 for s in shape)
