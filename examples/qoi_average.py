"""QoI-preserving compression of the average functional
(reference: examples/qoi/average.cpp)."""
import numpy as np

import mgard_tpu
from mgard_tpu.qoi import TensorQuantityOfInterest, compress_qoi

v = np.random.default_rng(2).standard_normal((65, 65)).astype(np.float32)
w = np.full(v.shape, 1.0 / v.size)
qoi = TensorQuantityOfInterest(w)

blob, st, data_tol = compress_qoi(v, qoi, qoi_tol=1e-5, s=0.0)
out, _ = mgard_tpu.decompress(blob)
print(f"derived field tol {data_tol:.3e}, "
      f"QoI err {abs(qoi(out)-qoi(v)):.2e} <= 1e-05, "
      f"ratio {v.nbytes/len(blob):.1f}")
