"""Price concrete BFP5 layout variants from the real per-block widths.

Harvests the full (NB,) block-width array from the v2 front-end at 512^3
(16 MB readback) and prices, offline:

  A  current:     natural chunks of C=16 consecutive blocks (classes
                  mixed), global K, per-chunk rl = chunk max
  S  superclass:  chunks of 16 blocks of one 128-lane superclass
                  ({0,1},{2,3},{4,5},{6,7}), K_s per superclass,
                  per-chunk rl (Mosaic-friendly: 128-aligned lane slices)
  P  pure class:  chunks of 16 blocks of one 64-lane class, K_c per
                  class, per-chunk rl
  G  subgroup rl: natural C=16 chunks and global K, but rl per 4-block
                  subgroup (sidecar x4)
  C  per-block:   ideal per-band rl (upper bound from probe_classK)

All schemes keep the E-plane residual cap + full-block exceptions.
"""

import sys

import numpy as np


def price(w, K, E, group):
    NBg = w.size // group
    wm = w.reshape(NBg, group).max(1)
    rl = np.clip(wm - K, 0, E)
    exc = wm > K + E
    words = ((K + rl) * group).sum(dtype=np.int64)
    words += int(exc.sum()) * group * (32 - K - E + 1)
    return int(words)


def main(n=512):
    import jax
    import jax.numpy as jnp

    import mgard_tpu
    import mgard_tpu.highlevel as H
    from mgard_tpu.hierarchy import get_hierarchy
    from mgard_tpu.lossless import bfp
    from mgard_tpu.ops.hybrid import hybrid_l_total, pad_to8, remainder_shape
    from bench import make_field

    shape = (n, n, n)
    nl = 3
    padded = pad_to8(shape)
    cfg = mgard_tpu.Config()
    rem_hier = get_hierarchy(remainder_shape(padded, nl), np.float32, None, cfg)
    q = H._hybrid_quantizer(1e-3, hybrid_l_total(padded, nl, rem_hier))
    v = make_field(n)
    quant = jnp.asarray(q, jnp.float32)
    C = H._pick_v2_chunk(padded, cfg)
    E = bfp.E_DEFAULT
    N = n ** 3
    NB = N // 32

    @jax.jit
    def harvest(v, quant):
        pay, cw, rem = H._compress_core_hybrid_v2(v, quant, padded, nl,
                                                  rem_hier, C)
        blk = pay.reshape(NB, 32).astype(jnp.int32)
        mx = jnp.max(blk, axis=1)
        return jnp.where(mx == 0, 0, 32 - jax.lax.clz(mx)).astype(jnp.int8)

    w = np.asarray(harvest(v, quant)).astype(np.int32)  # (NB,)
    raw = N * 4

    def best_K(wv, group, label, sidecar_units):
        best = (None, 1 << 62)
        for K in range(13):
            words = price(wv, K, E, group)
            if words < best[1]:
                best = (K, words)
        return best

    # A: natural order, group=16, global K
    K, wordsA = best_K(w, 16, "A", NB // 16)
    bytesA = wordsA * 4 + (NB // 16) // 2
    print(f"A natural C=16 global K={K}: {bytesA/1e6:.1f} MB  cf-ratio {raw/bytesA:.3f}")

    # class id per block: within each natural chunk of 16, band b class b//2
    cls = (np.arange(NB) % 16) // 2
    sup = cls // 2  # 4 superclasses

    # S: superclass chunks: regroup block stream per superclass, preserve order
    totS = 0
    for s in range(4):
        ws = w[sup == s]
        ws = ws[: ws.size - ws.size % 16]
        Ks, wd = best_K(ws, 16, f"S{s}", 0)
        totS += wd
        print(f"  S sup{s}: K={Ks} words={wd/1e6:.1f}M")
    bytesS = totS * 4 + (NB // 16) // 2
    print(f"S superclass chunks: {bytesS/1e6:.1f} MB  cf-ratio {raw/bytesS:.3f}")

    # P: pure-class chunks
    totP = 0
    for c in range(8):
        wc = w[cls == c]
        wc = wc[: wc.size - wc.size % 16]
        Kc, wd = best_K(wc, 16, f"P{c}", 0)
        totP += wd
    bytesP = totP * 4 + (NB // 16) // 2
    print(f"P pure-class chunks: {bytesP/1e6:.1f} MB  cf-ratio {raw/bytesP:.3f}")

    # G: natural order, global K, rl per 4-block subgroup
    Kg, wordsG = best_K(w, 4, "G", NB // 4)
    bytesG = wordsG * 4 + (NB // 4) // 2
    print(f"G subgroup rl=4 K={Kg}: {bytesG/1e6:.1f} MB  cf-ratio {raw/bytesG:.3f}")

    # G2: subgroup of 2
    K2, words2 = best_K(w, 2, "G2", NB // 2)
    bytes2 = words2 * 4 + (NB // 2) // 2
    print(f"G2 subgroup rl=2 K={K2}: {bytes2/1e6:.1f} MB  cf-ratio {raw/bytes2:.3f}")

    # C: per-block, per-class K
    totC = 0
    for c in range(8):
        wc = w[cls == c]
        Kc, wd = best_K(wc, 1, f"C{c}", 0)
        totC += wd
    bytesC = totC * 4 + NB // 2
    print(f"C per-block/classK: {bytesC/1e6:.1f} MB  cf-ratio {raw/bytesC:.3f}")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 512)
