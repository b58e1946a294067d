"""Device-buffer (jax.Array in) example
(reference: examples/mgard-x/HighLevelAPIsGPUBuffer): compress directly
from an accelerator-resident array with no host staging of the input.
"""
import jax.numpy as jnp
import numpy as np

import mgard_tpu

v_dev = jnp.asarray(np.random.default_rng(0).standard_normal((65, 65, 65)),
                    dtype=jnp.float32)
blob, st = mgard_tpu.compress(v_dev, tol=1e-2, s=np.inf)
out, _ = mgard_tpu.decompress(blob)
print("device-buffer compress ok:",
      float(np.max(np.abs(out - np.asarray(v_dev)))) <= 1e-2)
