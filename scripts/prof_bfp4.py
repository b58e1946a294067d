"""BFP3 (sorted-prefix) on-TPU profile at 512^3: stage times + roundtrip.

Stages: width+sort plan (XLA), row gather, full encode_core, decode_core;
plus a correctness check against the natural symbols and the achieved
words/block.
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
    print(f"# floor {floor*1e3:.1f} ms, backend {jax.default_backend()}")

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
    K, E = 6, 8
    npad = bfp._pad_to(Ntot, sb)
    symp = jnp.concatenate([sym, jnp.zeros(npad - Ntot, jnp.int32)])
    NB = npad // 32
    NSB = NB // sb
    PR = sb // 128

    @jax.jit
    def plan_only(s):
        sym2d = s.reshape(NB, 32)
        mx = jnp.max(_zigzag(sym2d), axis=1)
        w = bfp._widths_from_max(mx)
        rl = jnp.clip(w - K, 0, E)
        rank, cnt = bfp._sort_plan(rl.reshape(NSB, sb), E)
        rows, woff, sb_off, rr = bfp._plan_offsets(cnt, PR)
        return rank, woff, sb_off, rr

    (rank, woff, sb_off, rr), _ = timed("A width + sort plan (XLA)", plan_only, symp)

    @jax.jit
    def gather_only(s, rank):
        sym2d = s.reshape(NB, 32)
        rank_g = (rank + jnp.arange(NSB, dtype=jnp.int32)[:, None] * sb).reshape(-1)
        perm = (jnp.zeros((NB,), jnp.int32).at[rank_g]
                .set(jnp.arange(NB, dtype=jnp.int32), unique_indices=True))
        return jnp.take(sym2d, perm, axis=0)

    timed("B invert + row gather", gather_only, symp, rank)

    out, t_e = timed("C encode_core full", lambda s: bfp.encode_core(
        s, K, E, sb, 8192, on_tpu), symp)
    base, rl, resid2d, resid_rows, exc_ids, exc_blocks, exc_count = out
    resid_w = bfp.CHUNK * int(np.asarray(rl, np.int64).sum())  # compacted wire
    wpb = (resid_w + K * NB + NB / 4) / NB
    print(f"# words/block {wpb:.2f} (approx ratio {32/wpb:.2f}), "
          f"exceptions {int(exc_count)}")

    dec, t_d = timed("D decode_core full", lambda: bfp.decode_core(
        base, rl, resid2d, exc_ids, exc_blocks, K, E, sb, on_tpu, NB))
    ok = bool(jnp.all(dec[:Ntot] == sym))
    print(f"# roundtrip OK: {ok}")
    print(f"# combined {2*nbytes/(t_e+t_d)/1e9:.2f} GB/s")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 512)
