"""Hybrid-v2 compress stage bisection on TPU at 512^3.

Stages: (1) fused transform kernel (pay/cw/rem), (2) rem decompose+quant,
(3) encode_core_zz sort-plan+gather+pack, (4) rem BFP encode, (5) whole
compress_fn, (6) whole decompress_fn.
"""

import sys
import time

import numpy as np


def main(n=512, chunk=0):
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
    nbytes = n**3 * 4
    C = chunk or bfp.CHUNK
    E = bfp.E_DEFAULT
    sb = bfp.SB_BLOCKS
    N = n**3
    NB = N // 32
    n_rem = int(np.prod(rem_hier.shape))
    rem_pad = bfp._pad_to(n_rem, sb)
    NBr = rem_pad // 32

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

    inv_q = jnp.float32(1.0 / q)

    # stage 1: fused transform kernel alone
    k1 = jax.jit(lambda v: Hy.local_transform_fused_v2(v, inv_q, nl, C))
    (pay, cw, rem), _ = timed("1 fused transform kernel (pay,cw,rem)", k1, v)

    # stage 2: rem decompose+quantize
    def rem_fn(rem):
        from mgard_tpu.ops.refactor import decompose
        rd = decompose(rem, rem_hier, orthogonal=False)
        t = rd * inv_q
        half = jnp.float32(0.5)
        return jnp.trunc(jnp.where(t < 0, t - half, t + half)).astype(jnp.int32).ravel()
    k2 = jax.jit(rem_fn)
    rem_sym, _ = timed("2 rem decompose+quant", k2, rem)

    hist = np.bincount(np.clip(np.asarray(cw), 0, 32), minlength=33)
    K = bfp.choose_K(hist, E, C)
    print(f"# K={K}")
    crl = jnp.clip(cw - K, 0, E)

    # stage 3: encode_core_zz
    k3 = jax.jit(lambda pay, crl: bfp.encode_core_zz(
        pay.reshape(-1, C * 32), crl, K, E, sb, True, C))
    (base, resid2d, resid_rows), _ = timed("3 encode_core_zz (sort+pack)", k3, pay, crl)

    # stage 3a: just the sort-plan + gather (no pack)
    def gather_only(pay, crl):
        NC = pay.size // (C * 32)
        NSB = (NC * C) // sb
        sbc = sb // C
        rank_c, cnt_c = bfp._sort_plan(crl.reshape(NSB, sbc), E)
        rank_g = (rank_c + jnp.arange(NSB, dtype=jnp.int32)[:, None] * sbc).reshape(-1)
        perm = (jnp.zeros((NC,), jnp.int32).at[rank_g]
                .set(jnp.arange(NC, dtype=jnp.int32), unique_indices=True))
        return jnp.take(pay.reshape(NC, C * 32), perm, axis=0)
    k3a = jax.jit(gather_only)
    timed("3a   sort-plan + row gather only", k3a, pay, crl)

    # stage 4: rem encode
    Kr_h = np.asarray(bfp._width_hist(
        jnp.concatenate([rem_sym, jnp.zeros(rem_pad - n_rem, jnp.int32)])))
    Kr = bfp.choose_K(Kr_h, E)
    k4 = jax.jit(lambda rs: bfp.encode_core(
        jnp.concatenate([rs, jnp.zeros(rem_pad - n_rem, jnp.int32)]),
        Kr, E, sb, 8192, True))
    timed("4 rem encode_core", k4, rem_sym)

    # stage 5/6: whole paths (mirror bench.py)
    @jax.jit
    def compress_fn(v, quant):
        pay, cw, rem_sym = H._compress_core_hybrid_v2(v, quant, padded, nl, rem_hier, C)
        crl = jnp.clip(cw - K, 0, E)
        cf = bfp.encode_core_zz(pay.reshape(-1, C * 32), crl, K, E, sb, True, C)
        rs = jnp.concatenate([rem_sym, jnp.zeros(rem_pad - n_rem, jnp.int32)])
        rem = bfp.encode_core(rs, Kr, E, sb, 8192, True)
        return cf + (crl,) + rem

    out, _ = timed("5 whole compress_fn", compress_fn, v, quant)
    base, resid2d, resid_rows, crl2 = out[0], out[1], out[2], out[3]
    rbase, rcrl, rresid2d = out[4], out[5], out[6]
    rexc_ids, rexc_blocks = out[8], out[9]

    @jax.jit
    def decompress_fn(base, resid2d, crl, rbase, rcrl, rresid2d, rexc_ids,
                      rexc_blocks, quant):
        zz_rows = bfp.decode_core_zz(base, crl, resid2d, K, E, sb, True, NB, C)
        rem_sym = bfp.decode_core(rbase, rcrl, rresid2d, rexc_ids,
                                  rexc_blocks, Kr, E, sb, True, NBr)[:n_rem]
        return H._decompress_core_hybrid_v2(
            zz_rows, rem_sym, quant, shape, padded, nl, rem_hier, C)

    timed("6 whole decompress_fn", decompress_fn, base, resid2d, crl2,
          rbase, rcrl, rresid2d, rexc_ids, rexc_blocks, quant)

    # decode halves
    k7 = jax.jit(lambda base, crl, resid2d: bfp.decode_core_zz(
        base, crl, resid2d, K, E, sb, True, NB, C))
    zz_rows, _ = timed("6a decode_core_zz", k7, base, crl2, resid2d)
    k8 = jax.jit(lambda zz, rs: H._decompress_core_hybrid_v2(
        zz, rs, quant, shape, padded, nl, rem_hier, C))
    rem_sym2 = jax.jit(lambda rb, rc, rr, ri, rbl: bfp.decode_core(
        rb, rc, rr, ri, rbl, Kr, E, sb, True, NBr)[:n_rem])(
        rbase, rcrl, rresid2d, rexc_ids, rexc_blocks)
    timed("6b inverse transform (incl rem recompose)", k8, zz_rows, rem_sym2)


if __name__ == "__main__":
    n = 512
    chunk = 0
    for a in sys.argv[1:]:
        if a.startswith("--n="):
            n = int(a.split("=")[1])
        if a.startswith("--chunk="):
            chunk = int(a.split("=")[1])
    main(n, chunk)
