"""Probe Mosaic support for the layout-conversion primitives BFP3 v2 needs.

A: strided sublane slice u[p::32] on (128, 1024)
B: small transpose (4, 1024) -> (1024, 4)
C: (1024, 4) -> (32, 128) via 32 strided sublane slices + lane concat
D: static lane permutation x[:, const_perm] on (1024, 128)
E: lane-butterfly within 32-lane groups (roll-based) == sublane butterfly
"""

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rng = np.random.default_rng(0)

    def run(name, kern, x, out_shape, check):
        try:
            f = pl.pallas_call(
                kern,
                out_shape=jax.ShapeDtypeStruct(out_shape, jnp.uint32),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )
            y = np.asarray(f(x))
            ok = np.array_equal(y, check)
            print(f"{name}: {'OK' if ok else 'WRONG RESULT'}")
        except Exception as e:
            print(f"{name}: FAILED {str(e)[:120]}")

    # A: strided sublane slice
    u = jnp.asarray(rng.integers(0, 1 << 30, (128, 1024), dtype=np.int64).astype(np.uint32))
    run("A sublane stride-32 slice", lambda i, o: o.__setitem__((...,), i[...][5::32]),
        u, (4, 1024), np.asarray(u)[5::32])

    # B: small transpose
    w = jnp.asarray(rng.integers(0, 1 << 30, (4, 1024), dtype=np.int64).astype(np.uint32))
    run("B (4,1024) transpose", lambda i, o: o.__setitem__((...,), i[...].T),
        w, (1024, 4), np.asarray(w).T)

    # C: (1024,4) -> (32,128) strided slices + concat
    v = jnp.asarray(rng.integers(0, 1 << 30, (1024, 4), dtype=np.int64).astype(np.uint32))

    def kern_c(i_ref, o_ref):
        vv = i_ref[...]
        pieces = [vv[q::32] for q in range(32)]  # each (32, 4)
        o_ref[...] = jnp.concatenate(pieces, axis=1)

    exp = np.concatenate([np.asarray(v)[q::32] for q in range(32)], axis=1)
    run("C strided+concat (1024,4)->(32,128)", kern_c, v, (32, 128), exp)

    # D: static lane permutation
    x = jnp.asarray(rng.integers(0, 1 << 30, (1024, 128), dtype=np.int64).astype(np.uint32))
    perm = np.arange(128).reshape(4, 32).T.reshape(-1)  # 32g+j -> 4j+g

    def kern_d(i_ref, o_ref):
        o_ref[...] = i_ref[...][:, jnp.asarray(perm)]

    run("D static lane perm", kern_d, x, (1024, 128), np.asarray(x)[:, perm])

    # E: lane butterfly within 32-lane groups == sublane butterfly on (32, M)
    from mgard_tpu.lossless.bfx import _BF_MASKS, _BF_SHIFTS, _bit_transpose32

    def kern_e(i_ref, o_ref):
        zt = i_ref[...]
        lane = jax.lax.broadcasted_iota(jnp.int32, zt.shape, 1)
        for s, m in zip(_BF_SHIFTS, _BF_MASKS):
            is_a = (lane & s) == 0
            xs = pltpu.roll(zt, -s, 1)   # lane k <- x[k+s]
            t_a = ((zt >> s) ^ xs) & jnp.uint32(m)
            t_b = pltpu.roll(t_a, s, 1)
            new_a = zt ^ (t_a << s)
            new_b = zt ^ t_b
            zt = jnp.where(is_a, new_a, new_b)
        o_ref[...] = zt

    xe = jnp.asarray(rng.integers(0, 1 << 32, (256, 128), dtype=np.int64).astype(np.uint32))
    # reference: per 32-lane group, sublane butterfly of the transposed group
    xn = np.asarray(xe)
    exp = np.empty_like(xn)
    import jax.numpy as jnp2
    for g in range(4):
        grp = xn[:, 32 * g : 32 * (g + 1)]  # (256, 32) rows=chunks, lanes=symbols
        zt = jnp2.asarray(grp.T)  # (32, 256) rows = symbols
        out = np.asarray(_bit_transpose32(zt))  # rows = planes
        exp[:, 32 * g : 32 * (g + 1)] = out.T
    run("E lane butterfly (pltpu.roll)", kern_e, xe, (256, 128), exp)


if __name__ == "__main__":
    main()
