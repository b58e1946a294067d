"""Region-of-interest example (reference: examples/roi/mgard_roi.cpp):
a finer error bound inside a marked region."""
import numpy as np

import mgard_tpu

v = np.random.default_rng(1).standard_normal((65, 65)).astype(np.float32)
mask = np.zeros_like(v, bool)
mask[16:48, 16:48] = True

from mgard_tpu.highlevel import compress_roi

blob, st = compress_roi(v, tol=1e-1, roi_mask=mask,
                                            roi_factor=16.0, s=np.inf)
out, _ = mgard_tpu.decompress(blob)
err_in = np.max(np.abs((out - v))[mask])
err_out = np.max(np.abs((out - v))[~mask])
print(f"ROI err {err_in:.2e} (bound 6.3e-03)  outside {err_out:.2e} (bound 1e-1)")
