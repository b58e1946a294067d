"""Stage-level profiler for the 512^3 hybrid+BFX pipeline.

Times each device stage separately (per-rep sync, readback floor
subtracted) so optimization targets the measured bottleneck rather than
the suspected one. Run on the real TPU: python scripts/prof_stages.py
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
    from mgard_tpu.ops import hybrid as Hy
    from mgard_tpu.ops.hybrid import hybrid_l_total, pad_to8, remainder_shape
    from mgard_tpu.ops.refactor import decompose

    on_tpu = jax.default_backend() == "tpu"
    print(f"# backend={jax.default_backend()}", file=sys.stderr)
    shape = (n, n, n)
    nl = 3
    padded = pad_to8(shape)
    cfg = mgard_tpu.Config()
    rem_hier = get_hierarchy(remainder_shape(padded, nl), np.float32, None, cfg)
    q = H._hybrid_quantizer(1e-3, hybrid_l_total(padded, nl, rem_hier))
    fused = H._hybrid_fused_ok(padded, np.float32)
    nbytes = n * n * n * 4
    N = n * n * n
    Ntot = N + int(np.prod(rem_hier.shape))
    sb = bfx.SB_BLOCKS if on_tpu else bfx.SB_BLOCKS_SMALL
    align = bfx.ALIGN if on_tpu else 1
    npad = (Ntot + sb * 32 - 1) // (sb * 32) * (sb * 32)
    quant = jnp.asarray(q, jnp.float32)

    from bench import make_field

    v = make_field(n)

    noop = jax.jit(lambda x: x[0, 0, 0] * 1.0)
    float(noop(v))
    floor = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        float(noop(v))
        floor = min(floor, time.perf_counter() - t0)
    print(f"# readback floor: {floor*1e3:.1f} ms", file=sys.stderr)

    def timed(name, fn, *args, reps=5, bytes_=nbytes):
        t0 = time.time()
        out = fn(*args)
        jax.block_until_ready(out)
        tcomp = time.time() - t0
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            out = fn(*args)
            jax.block_until_ready(out)
            _ = np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[:1])
            best = min(best, time.perf_counter() - t0)
        t = max(best - floor, 1e-6)
        print(f"{name:36s} {t*1e3:8.2f} ms  {bytes_/t/1e9:7.2f} GB/s  "
              f"(compile {tcomp:.1f}s)")
        return out, t

    inv_q = (1.0 / quant).astype(jnp.float32)

    # ---- stage 1: fused hybrid local transform (Pallas)
    f_local = jax.jit(lambda v: Hy.local_transform_fused(v, inv_q, nl))
    (sym_cf, rem), t1 = timed("1 hybrid local_transform_fused", f_local, v)

    # ---- stage 2: remainder global decompose (small)
    f_rem = jax.jit(lambda r: decompose(r, rem_hier, orthogonal=False))
    rem_dec, t2 = timed("2 remainder decompose", f_rem, rem,
                        bytes_=int(np.prod(rem_hier.shape)) * 4)

    # ---- stage 3: concat (the quantized remainder append)
    def f_cat(sym_cf, rem_dec):
        half = jnp.asarray(0.5, jnp.float32)
        t = rem_dec * inv_q
        qr = jnp.trunc(jnp.where(t < 0, t - half, t + half)).astype(jnp.int32)
        s = jnp.concatenate([sym_cf.ravel(), qr.ravel()])
        if npad != Ntot:
            s = jnp.concatenate([s, jnp.zeros(npad - Ntot, jnp.int32)])
        return s
    sym, t3 = timed("3 quant-rem + concat + pad", jax.jit(f_cat), sym_cf, rem_dec)

    # ---- stage 4: zigzag + reshape.T (relayout) + widths
    @jax.jit
    def f_zt(sym):
        zz = bfx._zigzag(sym)
        zt = zz.reshape(npad // 32, 32).T
        w = bfx._widths_from_zt(zt)
        return zt, w
    (zt, w), t4 = timed("4 zigzag + (NB,32)->(32,NB) + widths", f_zt, sym)

    # ---- stage 5: offsets + pallas merge/placement kernel
    NB = npad // 32
    NSB = NB // sb
    cap = sb * 32
    out_rows = (NSB + 1) * cap // 128

    @jax.jit
    def f_pack(zt, w):
        sb_lens = jnp.sum(w.reshape(NSB, sb), axis=1, dtype=jnp.int32)
        sb_alens = (sb_lens + (align - 1)) // align * align
        sb_offs = (jnp.cumsum(sb_alens) - sb_alens).astype(jnp.int32)
        total = (sb_offs[-1] + sb_alens[-1]).astype(jnp.int32)
        if on_tpu:
            flat2d = bfx._encode_pallas(zt, w, sb_offs // 128, sb, out_rows)
        else:
            flat2d = bfx._encode_xla(zt, w, sb_offs, sb, out_rows)
        return flat2d, total
    (flat2d, total), t5 = timed("5 BFX merge-tree pack (pallas)", f_pack, zt, w)

    # ---- whole encode_core for cross-check
    _, t_enc = timed("  [whole bfx.encode_core]",
                     lambda s: bfx.encode_core(s, sb, on_tpu, align), sym)

    # ---- decode stages
    f_dec = jax.jit(lambda f, w: bfx.decode_core(f, w, sb, on_tpu, align))
    sym2, t6 = timed("6 BFX decode_core (split tree)", f_dec, flat2d, w)

    @jax.jit
    def f_inv(sym2):
        s = sym2[:Ntot]
        return H._decompress_core_hybrid(s, quant, shape, padded, nl, rem_hier,
                                         fused)
    _, t7 = timed("7 hybrid inverse (incl slice)", f_inv, sym2)

    # ---- full cores
    @jax.jit
    def full_c(v, quant):
        s = H._compress_core_hybrid(v, quant, padded, nl, rem_hier, fused)
        if npad != Ntot:
            s = jnp.concatenate([s, jnp.zeros(npad - Ntot, jnp.int32)])
        return bfx.encode_core(s, sb, on_tpu, align)
    _, tc = timed("C full compress core", full_c, v, quant)

    print(f"# sum stages 1-5 = {(t1+t2+t3+t4+t5)*1e3:.2f} ms; "
          f"full compress = {tc*1e3:.2f} ms", file=sys.stderr)


if __name__ == "__main__":
    n = 512
    for a in sys.argv[1:]:
        if a.startswith("--n="):
            n = int(a.split("=")[1])
    main(n)
