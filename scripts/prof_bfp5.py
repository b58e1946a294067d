"""Chunk-BFP3 encode stage bisection on TPU at 512^3."""

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
    from mgard_tpu.ops.compact import masked_indices
    from mgard_tpu.ops.hybrid import hybrid_l_total, pad_to8, remainder_shape
    from bench import make_field

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

    sym = jax.jit(lambda v, q: H._compress_core_hybrid(
        v, q, padded, nl, rem_hier, fused, zgroup=True))(v, quant)
    Ntot = int(sym.shape[0])

    noop = jax.jit(lambda x: x[0, 0, 0] * 1.0)
    float(noop(v))
    floor = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        float(noop(v))
        floor = min(floor, time.perf_counter() - t0)
    print(f"# floor {floor*1e3:.1f} ms")

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
        print(f"{name:44s} {t*1e3:8.2f} ms  {nbytes/t/1e9:7.2f} GB/s")
        return out, t

    sb, K, E = bfp.SB_BLOCKS, 6, 8
    C = bfp.CHUNK
    npad = bfp._pad_to(Ntot, sb)
    symp = jnp.concatenate([sym, jnp.zeros(npad - Ntot, jnp.int32)])
    NB = npad // 32
    NC = NB // C
    NSB = NB // sb
    sbc = sb // C
    PR = sb // 128

    @jax.jit
    def widths_only(s):
        mx = jnp.max(_zigzag(s.reshape(NB, 32)), axis=1)
        w = bfp._widths_from_max(mx)
        rl = jnp.clip(w - K, 0, E)
        return jnp.max(rl.reshape(NC, C), axis=1), w

    (crl, w), _ = timed("A widths+crl", widths_only, symp)

    @jax.jit
    def plan_only(crl):
        rank_c, cnt_c = bfp._sort_plan(crl.reshape(NSB, sbc), E)
        rows, woff, sb_off, rr = bfp._plan_offsets(cnt_c * C, PR)
        return rank_c, woff, sb_off, rr

    (rank_c, woff, sb_off, rr), _ = timed("B sort plan (9 cumsums 1M)", plan_only, crl)

    @jax.jit
    def invert_only(rank_c):
        rank_g = (rank_c + jnp.arange(NSB, dtype=jnp.int32)[:, None] * sbc).reshape(-1)
        return (jnp.zeros((NC,), jnp.int32).at[rank_g]
                .set(jnp.arange(NC, dtype=jnp.int32), unique_indices=True)), rank_g

    (perm, rank_g), _ = timed("C invert scatter (1M)", invert_only, rank_c)

    @jax.jit
    def gather_only(s, perm):
        return jnp.take(s.reshape(NC, C * 32), perm, axis=0).reshape(NB, 32)

    sym_sorted, _ = timed("D chunk row gather (512B rows)", gather_only, symp, perm)

    alloc_rows = (NSB + 1) * E * PR
    kern = jax.jit(lambda ss, woff, sb_off: bfp._encode_pallas(
        ss, woff, sb_off, K, E, sb, alloc_rows))
    timed("E pallas kernel alone", kern, sym_sorted, woff, sb_off)

    @jax.jit
    def exc_only(s, w):
        sym2d = s.reshape(NB, 32)
        mask = w > (K + E)
        exc_count = jnp.sum(mask.astype(jnp.int32))
        exc_ids = masked_indices(mask, 8192, NB)
        exc_blocks = jnp.take(sym2d, jnp.clip(exc_ids, 0, NB - 1), axis=0)
        return exc_count, exc_ids, exc_blocks

    timed("F exceptions", exc_only, symp, w)

    timed("G encode_core full", lambda s: bfp.encode_core(
        s, K, E, sb, 8192, True), symp)
    out = bfp.encode_core(symp, K, E, sb, 8192, True)
    timed("H decode_core full", lambda: bfp.decode_core(
        out[0], out[1], out[2], out[4], out[5], K, E, sb, True, NB))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 512)
