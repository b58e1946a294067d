"""XGC fusion case study on synthetic ion f-data.

Runnable counterpart of the reference's examples/xgc-casestudy tree
(reference: TestXGCBasic.cpp, TestXGC4DNonuniform.cpp,
TestXGC5DTemporal.cpp, CalcSnormDensity.cpp, TestXGCDensity.cpp). The
real dataset is an external download there; here a synthetic ion
distribution function f(t, phi, node, vx, vy) with XGC-like structure
(Maxwellian bulk + drift + turbulence modes) exercises the same five
demonstrations:

 1. baseline compression 2D-4D at several tolerances (TestXGCBasic)
 2. non-uniform velocity grids (TestXGC4DNonuniform)
 3. space-time (5D temporal batching) gain over per-step 4D
    (TestXGC5DTemporal)
 4. operator-norm calculation for the density QoI (CalcSnormDensity ->
    TensorQuantityOfInterest.multilevel_factor)
 5. density-QoI-bounded compression (TestXGCDensity)

Run: PYTHONPATH=. python examples/xgc_casestudy.py
"""

import math

import numpy as np

import mgard_tpu
from mgard_tpu.qoi import TensorQuantityOfInterest, compress_qoi


def make_xgc_like(t_steps=4, planes=4, nodes=16, nvx=17, nvy=17, seed=3):
    """Synthetic f-data: Maxwellian in (vx, vy) with node-dependent
    temperature/drift and slowly-evolving turbulence modes."""
    rng = np.random.default_rng(seed)
    vx = np.linspace(-3, 3, nvx)
    vy = np.linspace(-3, 3, nvy)
    VX, VY = np.meshgrid(vx, vy, indexing="ij")
    f = np.empty((t_steps, planes, nodes, nvx, nvy))
    phases = rng.uniform(0, 2 * np.pi, 5)
    for t in range(t_steps):
        for p in range(planes):
            for n in range(nodes):
                T = 1.0 + 0.3 * np.sin(2 * np.pi * n / nodes + phases[0])
                drift = 0.4 * np.sin(2 * np.pi * (n / nodes + p / planes) + phases[1])
                turb = 0.05 * np.sin(
                    2 * np.pi * (3 * n / nodes + 0.1 * t) + phases[2]
                )
                f[t, p, n] = (1 + turb) * np.exp(
                    -((VX - drift) ** 2 + VY**2) / (2 * T)
                )
    return f.astype(np.float64), vx, vy


def main():
    f5d, vx, vy = make_xgc_like()
    T, P, N, NVX, NVY = f5d.shape

    print("== 1. baseline (TestXGCBasic): dims 2-4, tol sweep")
    for dims, data in ((2, f5d[0, 0, 0]), (3, f5d[0, 0]), (4, f5d[0])):
        for tol in (1e-2, 1e-4):
            blob, st = mgard_tpu.compress(data, tol=tol, s=math.inf)
            out, _ = mgard_tpu.decompress(blob)
            err = np.max(np.abs(out - data))
            print(f"  {dims}D tol={tol:.0e}: ratio {data.nbytes/len(blob):6.1f} "
                  f"Linf {err:.2e} {'OK' if err <= tol else 'VIOLATED'}")

    print("== 2. non-uniform velocity grids (TestXGC4DNonuniform)")
    # XGC velocity grids are non-uniform: stretch the tails
    vx_nu = np.sign(vx) * np.abs(vx) ** 1.5
    vy_nu = np.sign(vy) * np.abs(vy) ** 1.5
    coords = [np.arange(P, dtype=float), np.arange(N, dtype=float), vx_nu, vy_nu]
    data4 = f5d[0]
    blob, st = mgard_tpu.compress(data4, tol=1e-3, coords=coords)
    out, _ = mgard_tpu.decompress(blob)
    err = np.max(np.abs(out - data4))
    print(f"  4D non-uniform tol=1e-3: ratio {data4.nbytes/len(blob):6.1f} "
          f"Linf {err:.2e} {'OK' if err <= 1e-3 else 'VIOLATED'}")

    print("== 3. space-time batching (TestXGC5DTemporal)")
    tol = 1e-3
    per_step = sum(
        len(mgard_tpu.compress(f5d[t], tol=tol)[0]) for t in range(T)
    )
    blob5, _ = mgard_tpu.compress(f5d, tol=tol)
    out5, _ = mgard_tpu.decompress(blob5)
    err5 = np.max(np.abs(out5 - f5d))
    print(f"  per-step 4D total: {per_step} B (ratio {f5d.nbytes/per_step:.1f})")
    print(f"  batched 5D:        {len(blob5)} B (ratio {f5d.nbytes/len(blob5):.1f}) "
          f"Linf {err5:.2e} {'OK' if err5 <= tol else 'VIOLATED'}")

    print("== 4+5. density QoI (CalcSnormDensity + TestXGCDensity)")
    # density at each (plane, node) = velocity-space integral of f:
    # a linear functional per cell; preserve the WORST one by bounding the
    # shared weight pattern's operator norm (reference computes the s-norm
    # of the functional once per grid; here the multilevel Riesz factor)
    data4 = f5d[0]
    w = np.zeros_like(data4)
    w[0, 0] = 1.0 / (NVX * NVY)  # density functional of cell (0, 0)
    qoi = TensorQuantityOfInterest(w)
    qtol = 1e-6
    for s in (0.0, 0.5):
        blob, st, data_tol = compress_qoi(data4, qoi, qtol, s=s)
        out, _ = mgard_tpu.decompress(blob)
        d_err = abs(qoi(out) - qoi(data4))
        print(f"  s={s}: operator-derived data tol {data_tol:.3e}, "
              f"ratio {data4.nbytes/len(blob):6.1f}, density err {d_err:.2e} "
              f"{'OK' if d_err <= qtol else 'VIOLATED'}")


if __name__ == "__main__":
    main()
