"""High-level API example (reference: examples/mgard-x/HighLevelAPIs).

Compress / decompress a 3D field under ABS and REL error bounds.
"""
import numpy as np

import mgard_tpu

x = np.linspace(0, 1, 129)
X, Y, Z = np.meshgrid(x, x, x, indexing="ij")
v = (np.sin(4 * np.pi * X) * np.cos(3 * np.pi * Y) * np.exp(Z)).astype(np.float32)

blob, st = mgard_tpu.compress(v, tol=1e-3, s=np.inf,
                              mode=mgard_tpu.error_bound_type.ABS)
out, st2 = mgard_tpu.decompress(blob)
print(f"ABS:  ratio {v.nbytes/len(blob):6.1f}  Linf err {np.max(np.abs(out-v)):.2e}")

blob, st = mgard_tpu.compress(v, tol=1e-3, s=0.0,
                              mode=mgard_tpu.error_bound_type.REL)
out, st2 = mgard_tpu.decompress(blob)
l2 = np.sqrt(np.mean((out - v) ** 2)) / np.sqrt(np.mean(v**2))
print(f"REL/L2: ratio {v.nbytes/len(blob):6.1f}  rel L2 err {l2:.2e}")
