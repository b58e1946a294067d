"""Visualization-coupled adaptive resolution on progressively recalled data.

Runnable counterpart of the reference's adaptive-resolution examples
(reference: examples/mgard-x/AdaptiveResolution/{FlyingEdges.hpp,
SparseFlyingCells.hpp, TestAdaptiveResolution.cu} — isosurface extraction
on partially reconstructed MDR data, refining retrieval only until the
surface stabilizes). Here the feature is an isosurface cell count +
crossing set of a 3D scalar field: reconstruct from a byte-minimal MDR
prefix, extract, fetch more bitplanes only while the extracted feature
still changes.

Run: PYTHONPATH=. python examples/adaptive_resolution.py
"""

import numpy as np

import mgard_tpu
from mgard_tpu.mdr import MDReconstruct, MDRefactor, MDRequest, retrieve_size


def isosurface_cells(v, iso):
    """Boolean mask of grid cells crossed by the isosurface (the cell set
    FlyingEdges would triangulate)."""
    lo = v[:-1, :-1, :-1]
    mark = np.zeros(lo.shape, bool)
    for dx in (0, 1):
        for dy in (0, 1):
            for dz in (0, 1):
                c = v[dx : dx + lo.shape[0], dy : dy + lo.shape[1],
                      dz : dz + lo.shape[2]]
                mark |= (lo <= iso) != (c <= iso)
    return mark


def main():
    n = 48
    x = np.linspace(-1, 1, n)
    X, Y, Z = np.meshgrid(x, x, x, indexing="ij")
    v = (np.sqrt(X**2 + Y**2 + Z**2) + 0.15 * np.sin(6 * X) * np.cos(5 * Y)
         ).astype(np.float32)
    iso = 0.8
    truth = isosurface_cells(v, iso)

    meta, data = MDRefactor(v)
    full_bytes = sum(sum(lm.plane_sizes) for lm in meta.levels)

    prev_cells = None
    fetched = 0
    print(f"isosurface {iso}: {truth.sum()} cells in the full-precision field")
    for tol in (3e-1, 1e-1, 3e-2, 1e-2, 3e-3, 1e-3):
        counts = MDRequest(meta, tol)
        prev = list(meta.prev_used) if meta.prev_used else [0] * len(counts)
        counts = [max(c, p) for c, p in zip(counts, prev)]
        fetched += retrieve_size(meta, counts)
        rec = MDReconstruct(meta, data, counts)
        cells = isosurface_cells(rec.data, iso)
        changed = (
            "n/a" if prev_cells is None else int(np.sum(cells ^ prev_cells))
        )
        match = int(np.sum(cells ^ truth))
        print(f"  tol={tol:.0e}: {fetched:7d}/{full_bytes} B fetched, "
              f"{cells.sum():6d} cells, diff-from-prev {changed}, "
              f"diff-from-truth {match}")
        if prev_cells is not None and np.array_equal(cells, prev_cells):
            print("  surface stable -> stop refining "
                  f"({fetched/full_bytes:.0%} of refactored bytes used)")
            break
        prev_cells = cells


if __name__ == "__main__":
    main()
