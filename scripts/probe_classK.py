"""Quantify the ratio headroom of per-zclass plane counts in the v2 cf
stream.

The v2 front-end zclass-groups each Z=512 row, so at C=16 a chunk's 16
bands are class-pure (band b -> class b//2, 64 lanes per class). The
current codec keys ONE K globally and ONE residual length per chunk
(the chunk max), so narrow-class bands ship words up to the widest
class's plane count. This probe harvests per-block (= per-band) widths
on the bench field and prices three schemes from the SAME data:

  A. current:   global K, per-chunk rl (what encode_core_zz ships)
  B. class-K:   per-class K_c, rl still per chunk (cheap retrofit:
                base planes become class-banded, sidecar unchanged)
  C. band-rl:   per-class K_c AND per-band rl (full adaptivity;
                sidecar grows to NB nibbles = NB/2 bytes)

Run on TPU: python scripts/probe_classK.py [n]
"""

import sys

import numpy as np


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
    NC = NB // C
    ncls = 8
    bpc = C // ncls  # bands per class within a chunk

    @jax.jit
    def harvest(v, quant):
        pay, cw, rem = H._compress_core_hybrid_v2(v, quant, padded, nl,
                                                  rem_hier, C)
        blk = pay.reshape(NB, 32).astype(jnp.int32)
        mx = jnp.max(blk, axis=1)
        w = jnp.where(mx == 0, 0, 32 - jax.lax.clz(mx))  # (NB,) block width
        cls = (jnp.arange(NB, dtype=jnp.int32) % C) // bpc
        hist = jnp.zeros((ncls, 33), jnp.int32).at[(cls, w)].add(1)
        # chunk widths for scheme A pricing
        cwh = jnp.zeros(33, jnp.int32).at[jnp.clip(cw, 0, 32)].add(1)
        # per (class, chunkwidth?) for scheme B: rl per chunk but base per
        # class: need joint (class, blockwidth, chunk rl) -> approximate by
        # also harvesting per-class exceedance of chunk rl
        return hist, cwh

    hist, cwh = harvest(v, quant)
    hist = np.asarray(hist)
    cwh = np.asarray(cwh)
    tot = hist.sum(1)

    def opt_K(h, E):
        """Optimal base planes for one class under base-K + rl<=E +
        exception (full 32-bit block) pricing."""
        total = h.sum()
        tail = np.cumsum(h[::-1])[::-1]  # tail[k] = #blocks w >= k
        best = (0, 1e18)
        for K in range(17):
            # words/block: K base + E-capped residual + exceptions at full
            resid = sum(min(max(w - K, 0), E) * h[w] for w in range(33))
            exc = tail[min(K + E + 1, 32)] * (32 - K - E + 1)
            cost = K * total + resid + exc
            if cost < best[1]:
                best = (K, cost)
        return best

    print("# class | blocks | width hist (nonzero) | opt K_c | words/blk")
    costC = 0.0
    for c in range(ncls):
        nz = {w: int(hist[c, w]) for w in range(33) if hist[c, w]}
        Kc, cost = opt_K(hist[c], E)
        costC += cost
        print(f"class {c}: n={tot[c]}  {nz}  K*={Kc} cost/blk={cost/max(tot[c],1):.2f}")

    # scheme A (current): global K + per-chunk rl
    K = bfp.choose_K(cwh, E, C)
    residA = sum(min(max(w - K, 0), E) * cwh[w] for w in range(33)) * C
    costA = K * NB + residA
    nib = NC / 8  # words of nibble sidecar (NC/2 bytes)
    bytesA = (costA + nib) * 4

    # scheme C: per-class K + per-band rl; sidecar NB nibbles
    bytesC = (costC + NB / 8) * 4

    raw = N * 4
    print(f"\nA current  : K={K} words={costA:.3e}  cf-bytes={bytesA/1e6:.1f} MB  cf-ratio={raw/bytesA:.3f}")
    print(f"C band-rl  : words={costC:.3e}  cf-bytes={bytesC/1e6:.1f} MB  cf-ratio={raw/bytesC:.3f}")
    print(f"headroom: {100*(1-bytesC/bytesA):.1f}% fewer cf bytes")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 512)
