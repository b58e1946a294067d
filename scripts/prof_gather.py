"""Which permutation-application formulation is fast on this TPU?

Candidates for applying a (NB,)-row permutation to (NB, 32) i32:
  A inversion scatter alone (zeros.at[rank].set(iota))
  B row gather with precomputed perm (jnp.take axis=0)
  C row scatter by rank (.at[rank].set(rows))
  D batched per-SB take_along_axis
  E flat word scatter of (NB, E) plane words to computed dests
  F gather of 4x-wider rows (NB/4, 128)
"""

import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    NB = 4096 * 1024  # 4.2M blocks, 512MB payload
    sb = 4096
    NSB = NB // sb
    rng = np.random.default_rng(0)
    sym2d = jnp.asarray(rng.integers(-100, 100, (NB, 32), dtype=np.int64).astype(np.int32))
    rl = jnp.asarray(rng.integers(0, 9, NB).astype(np.int32))

    from mgard_tpu.lossless.bfp import _sort_plan

    rank, cnt = jax.jit(lambda r: _sort_plan(r.reshape(NSB, sb), 8))(rl)

    noop = jax.jit(lambda x: x[0, 0] * 1)
    int(noop(sym2d))
    floor = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        int(noop(sym2d))
        floor = min(floor, time.perf_counter() - t0)
    print(f"# floor {floor*1e3:.1f} ms")

    def timed(name, fn, *args, reps=4):
        try:
            out = fn(*args)
            np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[:1])
        except Exception as e:
            print(f"{name:44s} FAILED {type(e).__name__}: {str(e)[:100]}",
                  file=sys.stderr)
            return None
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            out = fn(*args)
            _ = np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[:1])
            best = min(best, time.perf_counter() - t0)
        t = max(best - floor, 1e-6)
        print(f"{name:44s} {t*1e3:8.2f} ms  {NB*32*4/t/1e9:7.2f} GB/s")
        return out

    rank_g = jax.jit(
        lambda r: (r + jnp.arange(NSB, dtype=jnp.int32)[:, None] * sb).reshape(-1)
    )(rank)

    @jax.jit
    def invert(rank_g):
        return (jnp.zeros((NB,), jnp.int32).at[rank_g]
                .set(jnp.arange(NB, dtype=jnp.int32), unique_indices=True))

    perm = timed("A invert scatter (4.2M i32)", invert, rank_g)

    timed("B row gather take(perm, axis=0)",
          jax.jit(lambda s, p: jnp.take(s, p, axis=0)), sym2d, perm)

    timed("C row scatter .at[rank].set(rows)",
          jax.jit(lambda s, r: jnp.zeros_like(s).at[r]
                  .set(s, unique_indices=True)), sym2d, rank_g)

    @jax.jit
    def batched_gather(s, p):
        s3 = s.reshape(NSB, sb, 32)
        pl = (p.reshape(NSB, sb) - jnp.arange(NSB, dtype=jnp.int32)[:, None] * sb)
        return jnp.take_along_axis(s3, pl[:, :, None], axis=1)

    timed("D batched per-SB take_along_axis", batched_gather, sym2d, perm)

    E = 8
    planes = jnp.asarray(rng.integers(0, 1 << 30, (NB, E), dtype=np.int64).astype(np.uint32))

    @jax.jit
    def word_scatter(pl_words, rank_g, rl):
        # dest word offset for (b, j): j*NB + rank_b if j < rl_b else OOB
        j = jnp.arange(E, dtype=jnp.int32)[None, :]
        dest = j * NB + rank_g[:, None]
        dest = jnp.where(j < rl[:, None], dest, NB * E)
        return (jnp.zeros((NB * E,), jnp.uint32).at[dest.reshape(-1)]
                .set(pl_words.reshape(-1), mode="drop", unique_indices=True))

    timed("E flat word scatter (34M u32)", word_scatter, planes, rank_g, rl)

    wide = sym2d.reshape(NB // 4, 128)
    perm4 = perm.reshape(-1)[::4] // 4 if perm is not None else None

    @jax.jit
    def wide_gather(w, p4):
        return jnp.take(w, p4, axis=0)

    if perm4 is not None:
        timed("F 512B-row gather (1M rows)", wide_gather, wide, perm4)


if __name__ == "__main__":
    main()
