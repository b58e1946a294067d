"""Fused-v3 vs two-stage-v2 device pipeline timing at 512^3 (bench.py's
in-program loop method). Run on the real TPU."""

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
    from mgard_tpu.ops import hybrid as Hy
    from mgard_tpu.ops.hybrid import hybrid_l_total, pad_to8, remainder_shape
    from bench import make_field

    shape = (n, n, n)
    nl = 3
    padded = pad_to8(shape)
    cfg = mgard_tpu.Config()
    rem_hier = get_hierarchy(remainder_shape(padded, nl), np.float32, None, cfg)
    q = H._hybrid_quantizer(1e-3, hybrid_l_total(padded, nl, rem_hier))
    quant = jnp.asarray(q, jnp.float32)
    v = make_field(n)
    nbytes = n ** 3 * 4
    E = bfp.E_DEFAULT
    Z = n
    C = Z // 32
    sb = 32 * Z
    # production K from the v2 front-end histogram
    pay0, cw0, _ = H._compress_core_hybrid_v2(v, quant, padded, nl, rem_hier,
                                              H._pick_v2_chunk(padded, cfg))
    K = bfp.choose_K(np.bincount(np.clip(np.asarray(cw0), 0, 32),
                                 minlength=33), E,
                     H._pick_v2_chunk(padded, cfg))
    print(f"# v3 K={K} E={E} C={C} sb={sb}", file=sys.stderr)
    n_rem = int(np.prod(rem_hier.shape))
    rem_pad = bfp._pad_to(n_rem, bfp.SB_BLOCKS)
    NBr = rem_pad // 32
    Kr_h = 8

    noop = jax.jit(lambda x: x[0, 0, 0] * 1.0)
    float(noop(v))
    floor = 1e9
    for _ in range(5):
        t0 = time.perf_counter()
        float(noop(v))
        floor = min(floor, time.perf_counter() - t0)
    print(f"# floor {floor*1e3:.1f} ms", file=sys.stderr)

    K_INNER = 8

    def _probe(out):
        acc = jnp.float32(0)
        for leaf in jax.tree_util.tree_leaves(out):
            fl = leaf.ravel()
            st = max(1, fl.size // 64)
            acc = acc + fl[::st].astype(jnp.float32).max()
        return acc

    @jax.jit
    def comp_k(v, quant):
        def body(i, s):
            q2 = jnp.where(s >= jnp.float32(-1e30), quant, quant * 2)
            base, resid, cw, rem_sym = H._compress_core_hybrid_v3(
                v, q2, padded, nl, rem_hier, K, E)
            rs = jnp.concatenate([rem_sym,
                                  jnp.zeros(rem_pad - n_rem, jnp.int32)])
            rem = bfp.encode_core(rs, Kr_h, E, bfp.SB_BLOCKS, 8192, True)
            return _probe((base, resid, cw) + rem)
        return jax.lax.fori_loop(0, K_INNER, body, jnp.float32(0))

    base, resid, cw, rem_sym = H._compress_core_hybrid_v3(
        v, quant, padded, nl, rem_hier, K, E)
    crl = jnp.clip(cw - K, 0, E)
    rs = jnp.concatenate([rem_sym, jnp.zeros(rem_pad - n_rem, jnp.int32)])
    remo = bfp.encode_core(rs, Kr_h, E, bfp.SB_BLOCKS, 8192, True)

    @jax.jit
    def decomp_k(base, crl, resid, rbase, rcrl, rresid2d, rexc_ids,
                 rexc_blocks, quant):
        def body(i, s):
            m = jnp.where(s >= jnp.float32(-1e30), jnp.uint32(0),
                          jnp.uint32(1))
            b2 = base ^ m.astype(base.dtype)
            rem_sym = bfp.decode_core(rbase ^ m.astype(rbase.dtype), rcrl,
                                      rresid2d, rexc_ids, rexc_blocks,
                                      Kr_h, E, bfp.SB_BLOCKS, True,
                                      NBr)[:n_rem]
            rec = H._decompress_core_hybrid_v3(
                b2, crl, resid, rem_sym, quant, shape, padded, nl,
                rem_hier, K, E)
            return _probe(rec)
        return jax.lax.fori_loop(0, K_INNER, body, jnp.float32(0))

    def timed_k(fn, *a, reps=4):
        float(fn(*a))
        best = 1e9
        for _ in range(reps):
            t0 = time.perf_counter()
            float(fn(*a))
            best = min(best, time.perf_counter() - t0)
        return max((best - floor) / K_INNER, 1e-6)

    t_c = timed_k(comp_k, v, quant)
    t_d = timed_k(decomp_k, base, crl, resid, remo[0], remo[1], remo[2],
                  remo[4], remo[5], quant)
    # correctness
    rem_dec = bfp.decode_core(remo[0], remo[1], remo[2], remo[4], remo[5],
                              Kr_h, E, bfp.SB_BLOCKS, True, NBr)[:n_rem]
    rec = H._decompress_core_hybrid_v3(base, crl, resid, rem_dec, quant,
                                       shape, padded, nl, rem_hier, K, E)
    err = float(jnp.max(jnp.abs(rec - v)))
    wire = (bfp.resid_wire_words(np.asarray(crl).ravel(), E, C, sb) * 4
            + K * (n ** 3 // 32) * 4 + (n ** 3 // 32 // C) // 2)
    print(f"v3 compress {nbytes/t_c/1e9:.2f} GB/s ({t_c*1e3:.1f} ms), "
          f"decompress {nbytes/t_d/1e9:.2f} GB/s ({t_d*1e3:.1f} ms), "
          f"combined {2*nbytes/(t_c+t_d)/1e9:.2f} GB/s, "
          f"cf-ratio {n**3*4/wire:.2f}, Linf {err:.2e} ok={err <= 1e-3}")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 512)
