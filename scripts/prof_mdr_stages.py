"""Stage bisection of the MDR device refactor at 384^3 (VERDICT r3 #7)."""

import sys
import time

import numpy as np


def main(n=384):
    import jax
    import jax.numpy as jnp

    import mgard_tpu
    from mgard_tpu.hierarchy import get_hierarchy
    from mgard_tpu.mdr import bitplane
    from mgard_tpu.mdr.components import interleave_level, level_regions
    from mgard_tpu.ops.refactor import decompose
    from bench import make_field

    cfg = mgard_tpu.Config()
    B = 24
    v = np.asarray(make_field(n)).astype(np.float32)
    nbytes = v.nbytes
    hier = get_hierarchy(v.shape, v.dtype, None, cfg)
    L = hier.l_target
    vj = jnp.asarray(v)

    noop = jax.jit(lambda x: x[0, 0, 0] * 1.0)
    float(noop(vj))
    floor = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        float(noop(vj))
        floor = min(floor, time.perf_counter() - t0)
    print(f"# floor {floor*1e3:.1f} ms, B={B}, L={L}")

    def timed(tag, fn, *a, reps=4):
        out = fn(*a)
        np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[:1])
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            out = fn(*a)
            _ = np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[:1])
            best = min(best, time.perf_counter() - t0)
        t = max(best - floor, 1e-6)
        print(f"{tag:34s} {t*1e3:8.2f} ms  {nbytes/t/1e9:6.2f} GB/s")
        return out

    k_dec = jax.jit(lambda v: decompose(v, hier, orthogonal=True))
    dec = timed("1 decompose", k_dec, vj)

    def inter_all(dec):
        return [interleave_level(dec, hier, l, 0) for l in range(L + 1)]

    k_int = jax.jit(inter_all)
    streams = timed("2 interleave all levels", k_int, dec)

    def pad_streams(streams):
        return [bitplane.pad_stream(s) for s in streams]

    padded = jax.jit(pad_streams)(streams)

    def enc_all(streams):
        return [bitplane.encode_kernel(s, B) for s in streams]

    timed("3 bitplane encode all levels", jax.jit(enc_all), padded)

    # encode without the error tables (planes only)
    def enc_planes_only(streams):
        outs = []
        for s in streams:
            planes, exp, _em, _es = bitplane.encode_kernel(s, B)
            outs.append((planes, exp))
        return outs

    timed("3a encode planes+exp only", jax.jit(enc_planes_only), padded)

    def full(v):
        dec = decompose(v, hier, orthogonal=True)
        out = []
        for l in range(L + 1):
            s = bitplane.pad_stream(interleave_level(dec, hier, l, 0))
            out.append(bitplane.encode_kernel(s, B))
        return out

    timed("4 full refactor fn", jax.jit(full), vj)


if __name__ == "__main__":
    n = 384
    for a in sys.argv[1:]:
        if a.startswith("--n="):
            n = int(a.split("=")[1])
    main(n)
