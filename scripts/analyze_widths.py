"""Offline analysis of plane-truncation keyings on harvested width arrays.

For each candidate grouping of blocks, computes the optimal per-group plane
count K (cost = K + P(w>K) * (1 + 32 - K) words per block) and reports the
implied mean words/block and compression ratio. Drives the BFP codec's
design choice. Run after scripts/prof_widths.py.
"""

import sys

import numpy as np


def opt_cost(hist):
    """hist: (33,) counts. Returns (K*, mean words/block incl exceptions)."""
    total = hist.sum()
    if total == 0:
        return 0, 0.0
    best = (None, 1e18)
    tail = np.cumsum(hist[::-1])[::-1]  # tail[k] = #blocks with w >= k
    for K in range(33):
        p_exc = (tail[K + 1] if K + 1 <= 32 else 0) / total
        cost = K + p_exc * (1 + 32 - K)
        if cost < best[1]:
            best = (K, cost)
    return best


def analyze(w, n=512):
    NB = w.shape[0]
    mean_w = w.astype(np.float64).mean()
    print(f"  exact widths: mean {mean_w:.3f} w/blk -> ratio "
          f"{32/(mean_w + 0.25):.2f} (current BFX incl width byte)")

    def report(name, groups):
        tot = 0.0
        ks = []
        for g in groups:
            hist = np.bincount(w[g], minlength=33)
            K, c = opt_cost(hist)
            ks.append(K)
            tot += c * g.sum() if g.dtype == bool else c * len(g)
        mean_c = tot / NB
        print(f"  {name:28s} mean {mean_c:.3f} w/blk -> ratio {32/mean_c:.2f} "
              f"Ks={ks[:20]}{'...' if len(ks) > 20 else ''}")

    # global
    report("global K", [np.ones(NB, bool)])

    b = np.arange(NB)
    # 16 structural slabs (b % 16)
    report("16 slabs (b%16)", [b % 16 == i for i in range(16)])

    # semantic 4-level grouping (hybrid nl=3 chains)
    R = NB // 4
    r = b // 4
    g4 = b % 4
    zr = r % 4
    y = (r // 4) % n
    x = r // (4 * n)
    k16 = zr * 4 + g4
    zc = k16 // 2

    def lev_of(c):
        lev = np.full(8, 0)
        lev[[1, 3, 5]] = 0
        lev[[2, 6]] = 1
        lev[4] = 2
        lev[[0, 7]] = 3
        return lev[c]

    lx = lev_of(x % 8)
    ly = lev_of(y % 8)
    lz = lev_of(zc)
    lvl = np.minimum(np.minimum(lx, ly), lz)
    report("4 level groups", [lvl == i for i in range(4)])

    # level x zclass (finer): 4 x 8
    key = lvl * 8 + zc
    report("32 level*zclass groups", [key == i for i in np.unique(key)])

    # full 512 classes
    key512 = ((x % 8) * 8 + (y % 8)) * 8 + zc
    groups = [key512 == i for i in np.unique(key512)]
    tot = 0.0
    for g in groups:
        hist = np.bincount(w[g], minlength=33)
        K, c = opt_cost(hist)
        tot += c * g.sum()
    print(f"  {'512 classes (upper bound)':28s} mean {tot/NB:.3f} w/blk -> "
          f"ratio {32/(tot/NB):.2f}")

    # per-chunk max sidecar variants
    for C in (8, 16):
        wc = w.reshape(-1, C).max(axis=1).astype(np.float64)
        c = wc.mean() + 8 / (32 * C)
        print(f"  {'chunk-max C=%d' % C:28s} mean {c:.3f} w/blk -> ratio {32/c:.2f}")


def main():
    for zg in (0, 1):
        try:
            w = np.load(f"/tmp/widths_zg{zg}.npy")
        except FileNotFoundError:
            print(f"missing /tmp/widths_zg{zg}.npy", file=sys.stderr)
            continue
        print(f"zgroup={zg} (NB={w.shape[0]}):")
        analyze(w)


if __name__ == "__main__":
    main()
