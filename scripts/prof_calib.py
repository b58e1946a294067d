"""Calibrate per-call dispatch overhead + harvest BFX width distribution.

1. Times trivial ops of several sizes to separate fixed per-call overhead
   from true bandwidth.
2. Pulls the per-block width array of the 512^3 bench field's symbols and
   reports the ratio cost of chunked max-widths (C = 4/8/16/32) — the
   design parameter for the shallow merge tree.
"""

import sys
import time

import numpy as np


def main(n=512):
    import jax
    import jax.numpy as jnp

    import mgard_tpu
    import mgard_tpu.highlevel as H
    from mgard_tpu.hierarchy import get_hierarchy
    from mgard_tpu.lossless import bfx
    from mgard_tpu.ops.hybrid import hybrid_l_total, pad_to8, remainder_shape

    from bench import make_field

    v = make_field(n)

    noop = jax.jit(lambda x: x[0, 0, 0] * 1.0)
    float(noop(v))
    floor = min(
        (lambda t0: (float(noop(v)), time.perf_counter() - t0)[1])(time.perf_counter())
        for _ in range(5)
    )
    print(f"# readback floor: {floor*1e3:.1f} ms", file=sys.stderr)

    def timed(name, fn, *args, reps=5):
        out = fn(*args)
        np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[:1])
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            out = fn(*args)
            # ONE sync: the tiny readback (block_until_ready adds a second
            # ~25ms relay round trip on this rig - measured, not device time)
            _ = np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[:1])
            best = min(best, time.perf_counter() - t0)
        print(f"{name:34s} {max(best-floor,1e-6)*1e3:8.2f} ms")
        return out

    # calibration ladder: same op, different sizes -> fixed overhead = intercept
    for m in (64, 128, 256, 512):
        x = v[:m, :m, :m]
        x = jax.jit(lambda a: a + 0)(x)  # materialize contiguous
        timed(f"x*2+1 {m}^3 ({m**3*4/1e6:.0f} MB)", jax.jit(lambda a: a * 2 + 1), x)
    timed("sum(x) 512^3", jax.jit(lambda a: jnp.sum(a)), v)
    # two passes chained in one call: measures marginal pass cost
    timed("x*2 then +1 (2 kernels?) 512^3", jax.jit(lambda a: (a * 2).round() + 1), v)

    # ---- width distribution of the real bench symbols
    shape = (n, n, n)
    nl = 3
    padded = pad_to8(shape)
    cfg = mgard_tpu.Config()
    rem_hier = get_hierarchy(remainder_shape(padded, nl), np.float32, None, cfg)
    q = H._hybrid_quantizer(1e-3, hybrid_l_total(padded, nl, rem_hier))
    fused = H._hybrid_fused_ok(padded, np.float32)
    quant = jnp.asarray(q, jnp.float32)

    from functools import partial

    @partial(jax.jit, static_argnames=("zgroup",))
    def widths_of(v, quant, zgroup):
        sym = H._compress_core_hybrid(v, quant, padded, nl, rem_hier, fused,
                                      zgroup=zgroup)
        npad = (sym.shape[0] + bfx.SB_BLOCKS * 32 - 1) // (bfx.SB_BLOCKS * 32) * (bfx.SB_BLOCKS * 32)
        sym = jnp.concatenate([sym, jnp.zeros(npad - sym.shape[0], jnp.int32)])
        zz = bfx._zigzag(sym)
        zt = zz.reshape(-1, 32).T
        return bfx._widths_from_zt(zt)

    for zg in (False, True):
        w = np.asarray(widths_of(v, quant, zg))
        base = w.mean()
        print(f"zgroup={zg}: mean width {base:.3f}  (ratio {32/ (base + 8/32):.2f} approx)")
        for C in (4, 8, 16, 32):
            wc = w.reshape(-1, C).max(axis=1)
            grown = wc.astype(np.float64).mean()
            print(f"  C={C:2d}: mean chunk-max width {grown:.3f} "
                  f"(+{(grown-base)/base*100:.1f}% words, "
                  f"approx ratio {32/(grown + 8/C/32):.2f})")
        # width histogram (coarse)
        hist = np.bincount(w, minlength=33)
        print("  width hist:", {i: int(c) for i, c in enumerate(hist) if c})


if __name__ == "__main__":
    main()
