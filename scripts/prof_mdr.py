"""MDR refactor/reconstruct throughput at 384^3 f32 (VERDICT r2 #7)."""

import sys
import time

import numpy as np


def main(n=384):
    import jax
    import jax.numpy as jnp

    import mgard_tpu
    from mgard_tpu import mdr
    from mgard_tpu.hierarchy import get_hierarchy
    from mgard_tpu.mdr.api import _refactor_device, _reconstruct_device
    from bench import make_field

    cfg = mgard_tpu.Config()
    B = 24
    cfg.total_num_bitplanes = B
    v = np.asarray(make_field(n)).astype(np.float32)
    nbytes = v.nbytes
    hier = get_hierarchy(v.shape, v.dtype, None, cfg)

    noop = jax.jit(lambda x: x[0, 0, 0] * 1.0)
    vj = jnp.asarray(v)
    float(noop(vj))
    floor = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        float(noop(vj))
        floor = min(floor, time.perf_counter() - t0)
    print(f"# floor {floor*1e3:.1f} ms, B={B}")

    fn = _refactor_device(hier, B, False, True)
    out = fn(vj)
    np.asarray(out[0][0].ravel()[:1])

    # K_INNER executions inside one XLA program (bench.py's method) so
    # the ~21 ms relay sync floor is amortized instead of subtracted
    # rep-by-rep from a same-order signal
    K_INNER = 8

    @jax.jit
    def ref_k(vj):
        def body(i, s):
            f = jnp.where(s >= jnp.float32(-1e30), jnp.float32(1),
                          jnp.float32(2))
            o = fn(vj * f)
            acc = jnp.float32(0)
            for leaf in jax.tree_util.tree_leaves(o):
                fl = leaf.ravel()
                st = max(1, fl.size // 64)
                acc = acc + fl[::st].astype(jnp.float32).max()
            return acc
        return jax.lax.fori_loop(0, K_INNER, body, jnp.float32(0))

    float(ref_k(vj))
    best = float("inf")
    for _ in range(4):
        t0 = time.perf_counter()
        float(ref_k(vj))
        best = min(best, time.perf_counter() - t0)
    t = max((best - floor) / K_INNER, 1e-6)
    print(f"refactor device  {t*1e3:8.2f} ms  {nbytes/t/1e9:6.2f} GB/s")

    # full MDRefactor wall (incl. host level compression)
    t0 = time.perf_counter()
    meta, data = mdr.MDRefactor(v, cfg)
    t_full = time.perf_counter() - t0
    print(f"MDRefactor wall  {t_full*1e3:8.2f} ms  {nbytes/t_full/1e9:6.2f} GB/s")

    # reconstruct at tol
    counts = mdr.MDRequest(meta, 1e-3)
    t0 = time.perf_counter()
    rec = mdr.MDReconstruct(meta, data, counts)
    t_rec = time.perf_counter() - t0
    err = float(np.max(np.abs(rec.data - v)))
    print(f"MDReconstruct    {t_rec*1e3:8.2f} ms  {nbytes/t_rec/1e9:6.2f} GB/s  "
          f"Linf {err:.2e} ok={err <= 1e-3}")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 384)
