"""Microbenchmark TPU primitive costs relevant to the compression pipeline.

On this rig the axon relay makes block_until_ready return early, so every
timed op is folded into a jitted fn that ends in a scalar reduction; the
D2H of that one scalar is the sync point. The scalar-readback latency floor
is measured and subtracted.

Run: python scripts/prof_prims.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

FLOOR = 0.0


def timeit(fn, *args, reps=5):
    float(fn(*args))  # compile + warm
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(fn(*args))
        ts.append(time.perf_counter() - t0)
    return max(min(ts) - FLOOR, 1e-9)


def report(name, t, nbytes):
    print(f"{name:45s} {t*1e3:9.2f} ms   {nbytes/t/1e9:8.1f} GB/s-effective", flush=True)


def main():
    global FLOOR
    n = 512
    N = n * n * n
    x = jnp.asarray(np.random.default_rng(0).standard_normal((n, n, n)).astype(np.float32))
    xi = jnp.asarray(np.random.default_rng(0).integers(0, 8192, N).astype(np.int32))
    B = 4 * N

    noop = jax.jit(lambda v: v[0, 0, 0])
    float(noop(x))
    ts = [0.0] * 5
    for i in range(5):
        t0 = time.perf_counter()
        float(noop(x))
        ts[i] = time.perf_counter() - t0
    FLOOR = min(ts)
    print(f"scalar readback floor: {FLOOR*1e3:.2f} ms", flush=True)

    s = jax.jit(lambda v: jnp.sum(v * 2.0 + 1.0))
    report("elementwise fma (+sum)", timeit(s, x), 2 * B)

    f = jax.jit(lambda v: jnp.sum(jnp.transpose(v, (1, 2, 0)) * 1.00001))
    report("transpose (1,2,0)", timeit(f, x), 2 * B)

    f = jax.jit(lambda v: jnp.sum(jnp.transpose(v, (2, 0, 1)) * 1.00001))
    report("transpose (2,0,1)", timeit(f, x), 2 * B)

    f = jax.jit(lambda v: jnp.sum(v[::2] * 1.5))
    report("strided slice axis0", timeit(f, x), 1.5 * B)

    f = jax.jit(lambda v: jnp.sum(v[:, :, ::2] * 1.5))
    report("strided slice axis2 (lanes)", timeit(f, x), 1.5 * B)

    f = jax.jit(lambda v: jnp.sum(jnp.concatenate([v[::2] * 1.1, v[1::2]], axis=0) * 1.1))
    report("split+concat axis0", timeit(f, x), 2 * B)

    f = jax.jit(lambda v: jnp.sum(jnp.concatenate([v[:, :, ::2] * 1.1, v[:, :, 1::2]], axis=2) * 1.1))
    report("split+concat axis2", timeit(f, x), 2 * B)

    f = jax.jit(lambda v: jnp.sum(jnp.cumsum(v.reshape(-1, 1024), axis=1)))
    report("cumsum rows k=1024", timeit(f, x), 2 * B)

    f = jax.jit(lambda v: jnp.sum(jnp.cumsum(v.reshape(-1, 128), axis=1)))
    report("cumsum rows k=128", timeit(f, x), 2 * B)

    f = jax.jit(lambda v: jnp.sum(jnp.cumsum(v, axis=0)))
    report("cumsum axis0 full", timeit(f, x), 2 * B)

    idx = jnp.asarray(np.random.default_rng(1).integers(0, N, N // 8).astype(np.int32))
    f = jax.jit(lambda v, i: jnp.sum(v.ravel()[i]))
    report("gather N/8 random", timeit(f, x, idx), (N // 8) * 8)

    f = jax.jit(lambda v, i: jnp.sum(jnp.zeros(N, jnp.float32).at[i].add(v.ravel()[: N // 8])))
    report("scatter-add N/8 random", timeit(f, x, idx), (N // 8) * 8)

    si = jnp.sort(idx)
    report("gather N/8 sorted", timeit(f, x, si), (N // 8) * 8)

    f = jax.jit(lambda q: jnp.sum(jnp.bincount(q, length=8192)))
    report("bincount 8192", timeit(f, xi), 4 * N)

    def cc(q):
        ln = jnp.ones_like(q)
        for L in range(15):
            ln = ln + (q >= (1 << L)).astype(jnp.int32)
        return jnp.sum(ln)
    report("compare-chain x15", timeit(jax.jit(cc), xi), 2 * 4 * N)

    C = N // 1024
    wi = xi.astype(jnp.uint32)
    def scan_fn(w):
        def step(c, _):
            g = w[jnp.clip(c, 0, N - 1)].astype(jnp.int32)
            return c + (g & 3) + 1, None
        c, _ = jax.lax.scan(step, jnp.zeros(C, jnp.int32), None, length=64)
        return jnp.sum(c)
    report("scan 64 steps, (C,)=131072 gather state", timeit(jax.jit(scan_fn), wi), 64 * C * 8)


if __name__ == "__main__":
    main()
