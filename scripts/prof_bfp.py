"""BFP vs BFX on the 512^3 bench pipeline symbols (real TPU).

Times encode/decode cores with single-sync reps and reports ratio, using
the same hybrid-transform symbol stream as bench.py.
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
    from mgard_tpu.lossless import bfp, bfx
    from mgard_tpu.ops.hybrid import hybrid_l_total, pad_to8, remainder_shape
    from bench import make_field

    on_tpu = jax.default_backend() == "tpu"
    shape = (n, n, n)
    nl = 3
    padded = pad_to8(shape)
    cfg = mgard_tpu.Config()
    rem_hier = get_hierarchy(remainder_shape(padded, nl), np.float32, None, cfg)
    q = H._hybrid_quantizer(1e-3, hybrid_l_total(padded, nl, rem_hier))
    fused = H._hybrid_fused_ok(padded, np.float32)
    quant = jnp.asarray(q, jnp.float32)
    v = make_field(n)
    nbytes = n**3 * 4

    sym_fn = jax.jit(lambda v, q: H._compress_core_hybrid(
        v, q, padded, nl, rem_hier, fused, zgroup=True))
    sym = sym_fn(v, quant)
    Ntot = int(sym.shape[0])

    noop = jax.jit(lambda x: x[0, 0, 0] * 1.0)
    float(noop(v))
    floor = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        float(noop(v))
        floor = min(floor, time.perf_counter() - t0)
    print(f"# floor {floor*1e3:.1f} ms", file=sys.stderr)

    def timed(name, fn, *args, reps=5):
        out = fn(*args)
        np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[:1])
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            out = fn(*args)
            _ = np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[:1])
            best = min(best, time.perf_counter() - t0)
        t = max(best - floor, 1e-6)
        print(f"{name:32s} {t*1e3:8.2f} ms  {nbytes/t/1e9:7.2f} GB/s")
        return out, t

    # ---- BFX
    sb = bfx.SB_BLOCKS
    npad = bfx._pad_to(Ntot, sb)
    symp = jnp.concatenate([sym, jnp.zeros(npad - Ntot, jnp.int32)])
    (fx, wx, tx), t_bfx_e = timed(
        "BFX encode", lambda s: bfx.encode_core(s, sb, on_tpu, bfx.ALIGN), symp)
    _, t_bfx_d = timed(
        "BFX decode", lambda f, w: bfx.decode_core(f, w, sb, on_tpu, bfx.ALIGN),
        fx, wx)
    bfx_bytes = int(tx) * 4 + npad // 32 + 24
    print(f"# BFX ratio {nbytes/bfx_bytes:.2f}")

    # ---- BFP (auto K)
    hist = np.asarray(bfp._width_hist(symp))
    K = bfp.choose_K(hist, 8)
    exc0 = int(hist[K + 8 + 1 :].sum())
    cap = bfp._exc_bucket(exc0, npad // 32)
    print(f"# BFP K={K} E=8 exc={exc0} cap={cap}")
    use_pallas = on_tpu
    align = 128 if use_pallas else 1
    (out), t_bfp_e = timed(
        "BFP encode",
        lambda s: bfp.encode_core(s, K, 8, bfp.SB_BLOCKS, cap, use_pallas, align),
        symp)
    base, rl, resid2d, total, ids, planes, cnt = out
    NB = npad // 32
    _, t_bfp_d = timed(
        "BFP decode",
        lambda b, r, f, i, p: bfp.decode_core(
            b, r, f, i, p, K, 8, bfp.SB_BLOCKS, use_pallas, align, NB),
        base, rl, resid2d, ids, planes)
    sym2 = bfp.decode_core(base, rl, resid2d, ids, planes, K, 8, bfp.SB_BLOCKS,
                           use_pallas, align, NB)
    ok = bool(jnp.all(sym2[:Ntot] == sym))
    bfp_bytes = (NB + 1) // 2 + K * NB * 4 + int(total) * 4 + int(cnt) * 33 * 4 + 34
    print(f"# BFP ratio {nbytes/bfp_bytes:.2f} lossless_ok={ok}")
    print(f"# speedup: encode {t_bfx_e/t_bfp_e:.2f}x decode {t_bfx_d/t_bfp_d:.2f}x")


if __name__ == "__main__":
    main()
