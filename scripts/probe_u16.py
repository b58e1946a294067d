"""Probe: u16 tiles in a Pallas kernel — load (S,32) u16, transpose,
16-bit butterfly halves, combine to u32 plane words. If this compiles and
round-trips, the i16 BFP path is viable."""

import numpy as np

_BF16_SHIFTS = (8, 4, 2, 1)
_BF16_MASKS = (0x00FF, 0x0F0F, 0x3333, 0x5555)


def bt16(zt, jnp):
    """(16, M) u16 bit-matrix transpose (4-step butterfly)."""
    for s, m in zip(_BF16_SHIFTS, _BF16_MASKS):
        g = 16 // (2 * s)
        x = zt.reshape((g, 2, s) + zt.shape[1:])
        a = x[:, 0]
        b = x[:, 1]
        t = ((a >> s) ^ b) & jnp.uint16(m)
        a = a ^ (t << s)
        b = b ^ t
        zt = jnp.stack([a, b], axis=1).reshape(zt.shape)
    return zt


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    S = 4096
    rng = np.random.default_rng(0)
    zz = rng.integers(0, 1 << 14, (S, 32), dtype=np.int64).astype(np.uint16)

    def kern(x_ref, o_ref):
        x = x_ref[...]           # (S, 32) u16 zigzag
        xt = x.T                 # (32, S) u16: row k = symbol k
        lo = bt16(xt[:16], jnp)  # planes of symbols 0..15 (16, S) u16
        hi = bt16(xt[16:], jnp)  # planes of symbols 16..31
        o_ref[...] = lo.astype(jnp.uint32) | (hi.astype(jnp.uint32) << 16)

    f = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((16, S), jnp.uint32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    try:
        y = np.asarray(f(jnp.asarray(zz)))
    except Exception as e:
        print("u16 kernel FAILED:", str(e)[:200])
        return
    # reference: plane j word of block b = bits j of the 32 symbols
    Z = zz.astype(np.uint32)
    exp = np.zeros((16, S), np.uint32)
    for j in range(16):
        for k in range(32):
            exp[j] |= (((Z[:, k] >> j) & 1) << k).astype(np.uint32)
    print("u16 plane kernel:", "OK" if np.array_equal(y, exp) else "WRONG")


if __name__ == "__main__":
    main()
