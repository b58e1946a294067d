"""Progressive refactor / retrieval (reference: mdr-x executable flow):
one refactor, multiple error-targeted retrieval rounds, incremental bytes.
"""
import numpy as np

from mgard_tpu.mdr.api import (MDReconstruct, MDRefactor, MDRequest,
                               retrieve_size)

v = np.random.default_rng(3).standard_normal((65, 65)).astype(np.float32)
meta, data = MDRefactor(v)
for tol in (1e-1, 1e-2, 1e-3):
    counts = MDRequest(meta, tol)
    inc = retrieve_size(meta, counts)
    out = MDReconstruct(meta, data, counts)
    err = float(np.max(np.abs(out.data - v)))
    print(f"tol {tol:g}: +{inc} bytes, actual Linf {err:.2e}")
