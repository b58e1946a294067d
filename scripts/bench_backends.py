"""Backend x {enc GB/s, dec GB/s, ratio} on the live device at 512^3.

The VERDICT-r2 ratio-race table. Device-phase timing with the single-sync
pattern (full-blob readback rides a ~4 MB/s relay on this rig and would
measure the tunnel, not the codec); ratio from the real serialized blob,
measured once. Backends whose pipeline is host-bound (zstd stage, rANS
host packaging) are timed device-phase-only too, with the host stage
reported separately in the ratio row.

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

    sym = jax.jit(lambda v, q: H._compress_core_hybrid(
        v, q, padded, nl, rem_hier, fused, zgroup=True))(v, quant)
    sym_h = np.asarray(sym)
    Ntot = sym_h.size
    print(f"# {n}^3 f32, {Ntot} symbols, backend {jax.default_backend()}")

    noop = jax.jit(lambda x: x[0, 0, 0] * 1.0)
    float(noop(v))
    floor = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        float(noop(v))
        floor = min(floor, time.perf_counter() - t0)

    def timed(fn, *args, reps=4):
        out = fn(*args)
        np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[:1])
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            out = fn(*args)
            _ = np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[:1])
            best = min(best, time.perf_counter() - t0)
        return out, max(best - floor, 1e-6)

    results = []

    def record(name, t_e, t_d, blob_len, ok, note=""):
        results.append((name, nbytes / t_e / 1e9, nbytes / t_d / 1e9,
                        nbytes / blob_len, ok, note))
        print(f"{name:14s} enc {nbytes/t_e/1e9:6.2f} GB/s  "
              f"dec {nbytes/t_d/1e9:6.2f} GB/s  ratio {nbytes/blob_len:5.2f}"
              f"  ok={ok} {note}")

    def want(name):
        return only is None or name in only

    # ---- BFX (device cores)
    if want("BFX"):
        from mgard_tpu.lossless import bfx

        sb = bfx.SB_BLOCKS if on_tpu else bfx.SB_BLOCKS_SMALL
        align = bfx.ALIGN if on_tpu else 1
        npad = (Ntot + sb * 32 - 1) // (sb * 32) * (sb * 32)
        symp = jnp.concatenate([sym, jnp.zeros(npad - Ntot, jnp.int32)])
        enc = jax.jit(lambda s: bfx.encode_core(s, sb, on_tpu, align))
        out, t_e = timed(enc, symp)
        flat2d, widths, total = out
        dec = jax.jit(lambda f, w: bfx.decode_core(f, w, sb, on_tpu, align))
        dout, t_d = timed(dec, flat2d, widths)
        ok = bool(jnp.all(dout[:Ntot] == sym))
        blob = bfx.serialize_device(("bfx", Ntot, sb, align) + tuple(out))
        record("BFX", t_e, t_d, len(blob), ok)

    # ---- BFP (device cores)
    if want("BFP"):
        from mgard_tpu.lossless import bfp

        sb = bfp.SB_BLOCKS if on_tpu else bfp.SB_BLOCKS_SMALL
        K, E = 6, bfp.E_DEFAULT
        npad = bfp._pad_to(Ntot, sb)
        symp = jnp.concatenate([sym, jnp.zeros(npad - Ntot, jnp.int32)])
        NB = npad // 32
        enc = jax.jit(lambda s: bfp.encode_core(s, K, E, sb, 8192, on_tpu))
        out, t_e = timed(enc, symp)
        dec = jax.jit(lambda b, c, r, i, x: bfp.decode_core(
            b, c, r, i, x, K, E, sb, on_tpu, NB))
        dout, t_d = timed(dec, out[0], out[1], out[2], out[4], out[5])
        ok = bool(jnp.all(dout[:Ntot] == sym))
        blob = bfp.serialize_device(
            ("bfp", Ntot, K, E, sb, 8192, on_tpu, symp, out))
        record("BFP", t_e, t_d, len(blob), ok)
        if want("BFP_Zstd"):
            from mgard_tpu.lossless import host

            t0 = time.perf_counter()
            z = host.zstd_compress(blob, 3)
            tz = time.perf_counter() - t0
            record("BFP_Zstd", t_e, t_d, len(z), ok,
                   f"(+host zstd {tz*1e3:.0f} ms, {len(blob)/tz/1e9:.2f} GB/s)")

    # ---- HUF2 (device kernels; host packaging excluded)
    if want("HUF2"):
        from mgard_tpu.lossless import huffman_mono as hm

        dict_size = 1 << 14
        half = dict_size // 2
        # HUF2 consumes dictionary-shifted symbols in [0, dict)
        clipped = np.clip(sym_h, -half, half - 1) + half
        try:
            hist = np.bincount(
                np.asarray(hm._zigzag(jnp.asarray(clipped, jnp.int32))),
                minlength=dict_size,
            )[:dict_size] + 1
            cb, _ = hm.rank_codebook_from_hist(hist)
            fr_base = jnp.asarray(np.concatenate(
                [cb.first_rank.astype(np.int64), cb.base_code.astype(np.int64)]))
            end_rank = jnp.asarray(cb.len_of_rank_bp.astype(np.int64))
            K = 1024
            npad = (Ntot + K - 1) // K * K
            C = npad // K
            symp = jnp.concatenate(
                [jnp.asarray(clipped, jnp.int32),
                 jnp.full((npad - Ntot,), dict_size // 2, jnp.int32)])
            enc = jax.jit(lambda s: hm.encode_kernel(s, end_rank, fr_base,
                                                     K, dict_size))
            out, t_e = timed(enc, symp)
            words, chunk_bits, total = out
            blob = hm.encode(np.asarray(symp), dict_size, K)
            wcount = (np.asarray(chunk_bits) + 31) >> 5
            starts = jnp.asarray(np.concatenate([[0], np.cumsum(wcount)[:-1]])
                                 .astype(np.int32))
            thr = jnp.asarray(cb.thresholds16.astype(np.int64))
            dec = jax.jit(lambda w, cs: hm.decode_kernel(
                w, cs, thr, fr_base, K, C, dict_size))
            dout, t_d = timed(dec, words, starts)
            ok = bool(jnp.all(dout[:Ntot] == jnp.asarray(clipped)))
            record("HUF2", t_e, t_d, len(blob), ok, "(device kernels)")
        except Exception as e:
            print(f"HUF2 FAILED {type(e).__name__}: {str(e)[:120]}",
                  file=sys.stderr)

    # ---- SymbolRans / ZeroRLE (host-coupled; full encode/decode, 1 rep)
    for name, mod in (("SymbolRans", "symbol_rans"), ("ZeroRLE", "rle_rans")):
        if not want(name):
            continue
        try:
            import importlib

            m = importlib.import_module(f"mgard_tpu.lossless.{mod}")
            shifted = sym_h + cfg.huff_dict_size // 2  # production dict shift
            t0 = time.perf_counter()
            blob = m.encode(shifted, cfg)
            t_e = time.perf_counter() - t0
            t0 = time.perf_counter()
            dout = m.decode(blob)
            t_d = time.perf_counter() - t0
            ok = np.array_equal(np.asarray(dout).ravel()[:Ntot], shifted)
            record(name, t_e, t_d, len(blob), ok, "(incl. host+tunnel)")
        except Exception as e:
            print(f"{name} FAILED {type(e).__name__}: {str(e)[:120]}",
                  file=sys.stderr)

    print("\n| backend | enc GB/s | dec GB/s | ratio | note |")
    print("|---|---|---|---|---|")
    for name, e, d, r, ok, note in results:
        print(f"| {name} | {e:.2f} | {d:.2f} | {r:.2f} | {note}"
              f"{'' if ok else ' BAD'} |")


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    only = set(sys.argv[2:]) or None
    main(n, only)
