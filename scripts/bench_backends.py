"""Backend x {encode GB/s, decode GB/s, ratio} on the live device at 512^3.

The VERDICT-r2 ratio-race table: every lossless backend driven on the SAME
quantized hybrid symbol stream (the production 512^3 f32 eb=1e-3 payload),
timed device-side with the single-sync pattern, ratio from the serialized
blob. Host-stage backends (zstd/LZ4 stages) time the full encode() call
including host work.

Usage: python scripts/bench_backends.py [n] [backends...]
"""

import sys
import time

import numpy as np


def main(n=512, only=None):
    import jax
    import jax.numpy as jnp

    import mgard_tpu
    import mgard_tpu.highlevel as H
    from mgard_tpu.hierarchy import get_hierarchy
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
    sym_h = np.asarray(sym)
    print(f"# {n}^3 f32, {sym_h.size} symbols, backend {jax.default_backend()}")

    def timed(fn, reps=3):
        fn()
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            fn()
            best = min(best, time.perf_counter() - t0)
        return best

    results = []

    def run(name, enc, dec, reps=3):
        if only and name not in only:
            return
        try:
            blob = enc()
            t_e = timed(enc, reps)
            out = dec(blob)
            t_d = timed(lambda: dec(blob), reps)
            got = np.asarray(out).ravel()[: sym_h.size]
            ok = np.array_equal(got, sym_h)
            ratio = nbytes / len(blob)
            results.append((name, nbytes / t_e / 1e9, nbytes / t_d / 1e9, ratio, ok))
            print(f"{name:16s} enc {nbytes/t_e/1e9:6.2f} GB/s  "
                  f"dec {nbytes/t_d/1e9:6.2f} GB/s  ratio {ratio:5.2f}  ok={ok}")
        except Exception as e:
            print(f"{name:16s} FAILED {type(e).__name__}: {e}", file=sys.stderr)

    from mgard_tpu.lossless import bfp, bfx

    run("BFX", lambda: bfx.encode(sym), lambda b: bfx.decode(b)[0])
    run("BFP", lambda: bfp.encode(sym), lambda b: bfp.decode(b)[0])

    from mgard_tpu.lossless import host

    def bfp_zstd_enc():
        return host.zstd_compress(bfp.encode(sym), 3)

    run("BFP_Zstd", bfp_zstd_enc,
        lambda b: bfp.decode(host.zstd_decompress(b))[0])

    from mgard_tpu.lossless import huffman_mono

    run("HUF2", lambda: huffman_mono.encode(sym, 1 << 14),
        lambda b: huffman_mono.decode(b)[0], reps=1)

    from mgard_tpu.config import Config
    from mgard_tpu.lossless import symbol_rans

    scfg = Config()
    run("SymbolRans", lambda: symbol_rans.encode(sym_h, scfg),
        lambda b: symbol_rans.decode(b)[0], reps=1)

    from mgard_tpu.lossless import rle_rans

    run("ZeroRLE_rANS", lambda: rle_rans.encode(sym_h, scfg),
        lambda b: rle_rans.decode(b)[0], reps=1)

    print("\n| backend | enc GB/s | dec GB/s | ratio |")
    print("|---|---|---|---|")
    for name, e, d, r, ok in results:
        print(f"| {name} | {e:.2f} | {d:.2f} | {r:.2f} |{'' if ok else ' BAD'}")


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    only = set(sys.argv[2:]) or None
    main(n, only)
