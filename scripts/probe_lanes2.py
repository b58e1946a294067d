"""Round 2 of Mosaic primitive probes (corrected formulations).

A2: strided sublane read via jax.lax.slice with strides
A3: strided sublane read via ref[pl.Slice(start, size, stride)]
C2: (1024,4) -> (32,128) via lax.slice strided + concat
D2: lane permutation with perm passed as kernel input (jnp.take axis=1)
E2: lane butterfly with positive pltpu.roll shifts
"""

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rng = np.random.default_rng(0)

    def run(name, kern, xs, out_shape, check, dtype=jnp.uint32):
        try:
            f = pl.pallas_call(
                kern,
                out_shape=jax.ShapeDtypeStruct(out_shape, dtype),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * len(xs),
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )
            y = np.asarray(f(*xs))
            ok = np.array_equal(y, check)
            print(f"{name}: {'OK' if ok else 'WRONG'}")
        except Exception as e:
            print(f"{name}: FAILED {str(e)[:110]}")

    u = jnp.asarray(rng.integers(0, 1 << 30, (128, 1024), dtype=np.int64).astype(np.uint32))

    def kern_a2(i_ref, o_ref):
        o_ref[...] = jax.lax.slice(i_ref[...], (5, 0), (128, 1024), (32, 1))

    run("A2 lax.slice stride", kern_a2, [u], (4, 1024), np.asarray(u)[5::32])

    def kern_a3(i_ref, o_ref):
        o_ref[...] = i_ref[pl.Slice(5, 4, 32), :]

    run("A3 ref pl.Slice stride", kern_a3, [u], (4, 1024), np.asarray(u)[5::32])

    v = jnp.asarray(rng.integers(0, 1 << 30, (1024, 4), dtype=np.int64).astype(np.uint32))

    def kern_c2(i_ref, o_ref):
        vv = i_ref[...]
        pieces = [jax.lax.slice(vv, (q, 0), (1024, 4), (32, 1)) for q in range(32)]
        o_ref[...] = jnp.concatenate(pieces, axis=1)

    exp = np.concatenate([np.asarray(v)[q::32] for q in range(32)], axis=1)
    run("C2 strided+concat", kern_c2, [v], (32, 128), exp)

    x = jnp.asarray(rng.integers(0, 1 << 30, (1024, 128), dtype=np.int64).astype(np.uint32))
    perm = np.arange(128).reshape(4, 32).T.reshape(-1).astype(np.int32)

    def kern_d2(i_ref, p_ref, o_ref):
        o_ref[...] = jnp.take(i_ref[...], p_ref[0], axis=1)

    run("D2 lane perm via input idx", kern_d2,
        [x, jnp.asarray(perm).reshape(1, 128)], (1024, 128), np.asarray(x)[:, perm])

    from mgard_tpu.lossless.bfx import _BF_MASKS, _BF_SHIFTS, _bit_transpose32

    def kern_e2(i_ref, o_ref):
        zt = i_ref[...]
        lane = jax.lax.broadcasted_iota(jnp.int32, zt.shape, 1)
        for s, m in zip(_BF_SHIFTS, _BF_MASKS):
            is_a = (lane & s) == 0
            xs = pltpu.roll(zt, 128 - s, 1)  # lane k <- x[k+s] (cyclic)
            t_a = ((zt >> s) ^ xs) & jnp.uint32(m)
            t_b = pltpu.roll(t_a, s, 1)
            new_a = zt ^ (t_a << s)
            new_b = zt ^ t_b
            zt = jnp.where(is_a, new_a, new_b)
        o_ref[...] = zt

    xe = jnp.asarray(rng.integers(0, 1 << 32, (256, 128), dtype=np.int64).astype(np.uint32))
    xn = np.asarray(xe)
    exp = np.empty_like(xn)
    for g in range(4):
        grp = xn[:, 32 * g : 32 * (g + 1)]
        zt = jnp.asarray(grp.T)
        out = np.asarray(_bit_transpose32(zt))
        exp[:, 32 * g : 32 * (g + 1)] = out.T
    run("E2 lane butterfly", kern_e2, [xe], (256, 128), exp)


if __name__ == "__main__":
    main()
