"""Probe: strided-destination / lane-sliced DMAs for free layout change.

Goal: load a (sbc, 128) HBM region as a (sbc*4, 32) VMEM tile where tile
row 4c+g = lanes [32g, 32g+32) of HBM row c — i.e. the (NC,128)->(NB,32)
chunk-row relayout — using 4 DMAs: src = lane-sliced HBM window, dst =
sublane-strided VMEM window (pl.Slice(g, sbc, 4)).
"""

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    sbc = 256
    S = sbc * 4

    rng = np.random.default_rng(0)
    x = rng.integers(0, 1 << 30, (sbc, 128), dtype=np.int64).astype(np.int32)

    def kern(x_ref, o_ref, tile, sems):
        for g in range(4):
            dma = pltpu.make_async_copy(
                x_ref.at[:, pl.ds(32 * g, 32)],
                tile.at[pl.Slice(g, sbc, 4), :],
                sems.at[g],
            )
            dma.start()
        for g in range(4):
            pltpu.make_async_copy(
                x_ref.at[:, pl.ds(32 * g, 32)],
                tile.at[pl.Slice(g, sbc, 4), :],
                sems.at[g],
            ).wait()
        o_ref[...] = tile[...] * 2

    f = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((S, 32), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((S, 32), jnp.int32),
            pltpu.SemaphoreType.DMA((4,)),
        ],
    )
    try:
        y = np.asarray(f(jnp.asarray(x)))
        exp = x.reshape(sbc, 4, 32).reshape(S, 32) * 2
        ok = np.array_equal(y, exp)
        print("strided-dst DMA relayout:", "OK" if ok else "WRONG")
        if not ok:
            bad = np.nonzero(~(y == exp).all(axis=1))[0]
            print("first bad rows", bad[:8])
    except Exception as e:
        print("strided-dst DMA FAILED:", str(e)[:160])

    # reverse direction: (S,32) VMEM tile -> (sbc,128) via strided-src DMA
    def kern2(x_ref, o_ref, tile, sems):
        tile[...] = x_ref[...]
        for g in range(4):
            dma = pltpu.make_async_copy(
                tile.at[pl.Slice(g, sbc, 4), :],
                o_ref.at[:, pl.ds(32 * g, 32)],
                sems.at[g],
            )
            dma.start()
        for g in range(4):
            pltpu.make_async_copy(
                tile.at[pl.Slice(g, sbc, 4), :],
                o_ref.at[:, pl.ds(32 * g, 32)],
                sems.at[g],
            ).wait()

    f2 = pl.pallas_call(
        kern2,
        out_shape=jax.ShapeDtypeStruct((sbc, 128), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        scratch_shapes=[
            pltpu.VMEM((S, 32), jnp.int32),
            pltpu.SemaphoreType.DMA((4,)),
        ],
    )
    t = rng.integers(0, 1 << 30, (S, 32), dtype=np.int64).astype(np.int32)
    try:
        y2 = np.asarray(f2(jnp.asarray(t)))
        exp2 = t.reshape(sbc, 4, 32).reshape(sbc, 128)
        print("strided-src DMA delayout:",
              "OK" if np.array_equal(y2, exp2) else "WRONG")
    except Exception as e:
        print("strided-src DMA FAILED:", str(e)[:160])


if __name__ == "__main__":
    main()
