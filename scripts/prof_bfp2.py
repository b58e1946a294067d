"""BFP sensitivity experiments on TPU: where do encode's ms go?

A: XLA width pre-pass alone.
B: tree-capacity sensitivity (E=2 vs E=8).
C: superblock-size sensitivity (sb 1024 vs 4096).
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
    from mgard_tpu.lossless import bfp
    from mgard_tpu.lossless.bfx import _zigzag
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
        print(f"{name:40s} {t*1e3:8.2f} ms  {nbytes/t/1e9:7.2f} GB/s")
        return out, t

    sb = bfp.SB_BLOCKS
    npad = bfp._pad_to(Ntot, sb)
    symp = jnp.concatenate([sym, jnp.zeros(npad - Ntot, jnp.int32)])
    NB = npad // 32

    # A: width pre-pass alone
    @jax.jit
    def widths_only(s):
        mx = jnp.max(_zigzag(s.reshape(-1, 32)), axis=1)
        w = bfp._widths_from_max(mx)
        rl = jnp.clip(w - 6, 0, 8)
        return jnp.sum(rl.reshape(-1, sb), axis=1, dtype=jnp.int32)
    timed("A width pre-pass (XLA)", widths_only, symp)

    # B/C: full encode at parameter points
    for (K, E, sbv) in ((6, 8, 4096), (12, 2, 4096), (10, 4, 4096),
                        (6, 8, 1024), (6, 8, 8192)):
        npad_v = bfp._pad_to(Ntot, sbv)
        sp = symp if npad_v == npad else jnp.concatenate(
            [sym, jnp.zeros(npad_v - Ntot, jnp.int32)])
        try:
            _, t_e = timed(
                f"B encode K={K} E={E} sb={sbv}",
                lambda s, K=K, E=E, sbv=sbv: bfp.encode_core(
                    s, K, E, sbv, 8192, on_tpu, 128), sp)
            out = bfp.encode_core(sp, K, E, sbv, 8192, on_tpu, 128)
            _, t_d = timed(
                f"B decode K={K} E={E} sb={sbv}",
                lambda b=out[0], r=out[1], f=out[2], i=out[4], p=out[5],
                K=K, E=E, sbv=sbv, NBv=npad_v // 32: bfp.decode_core(
                    b, r, f, i, p, K, E, sbv, on_tpu, 128, NBv),)
        except Exception as e:
            print(f"  K={K} E={E} sb={sbv} failed: {type(e).__name__}: {e}",
                  file=sys.stderr)


if __name__ == "__main__":
    main()
