"""Probe: Mosaic support for (a) dynamic-offset sublane-window RMW stores
on VMEM scratch, (b) capacity-sized placement DMA with spill chaining.

Kernel per grid step i: zero a (CAP+W, 128) buf, OR E=4 plane tiles into
dynamic row windows, DMA full capacity to out at a content-based row
offset. Later steps overwrite earlier spill. Checks exact placement.
"""

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    NSB, E, W = 8, 4, 4  # W rows per plane window
    CAP = E * W
    S = W * 128

    rng = np.random.default_rng(0)
    planes = rng.integers(1, 1 << 30, size=(NSB, E, W, 128), dtype=np.int64).astype(np.uint32)
    # rows per plane: random 1..W
    rows = rng.integers(1, W + 1, size=(NSB, E)).astype(np.int32)
    # zero plane content beyond its rows (sorted-suffix-zero invariant)
    for i in range(NSB):
        for j in range(E):
            planes[i, j, rows[i, j]:] = 0
    woff = np.zeros((NSB, E), np.int32)
    for i in range(NSB):
        acc = 0
        for j in range(E):
            woff[i, j] = acc
            acc += rows[i, j]
    tot = rows.sum(axis=1)
    sb_off = np.concatenate([[0], np.cumsum(tot)[:-1]]).astype(np.int32)
    out_rows = int(tot.sum()) + CAP

    def kern(woff_ref, sboff_ref, p_ref, out_ref, buf, sem):
        i = pl.program_id(0)
        buf[...] = jnp.zeros_like(buf)
        for j in range(E):
            o = woff_ref[i, j]
            cur = buf[pl.ds(o, W)]
            buf[pl.ds(o, W)] = cur | p_ref[0, j]
        dma = pltpu.make_async_copy(
            buf.at[pl.ds(0, CAP)], out_ref.at[pl.ds(sboff_ref[i], CAP)], sem)
        dma.start()
        dma.wait()

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(NSB,),
        in_specs=[pl.BlockSpec((1, E, W, 128), lambda i, w, s: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        scratch_shapes=[pltpu.VMEM((CAP + W, 128), jnp.uint32),
                        pltpu.SemaphoreType.DMA],
    )
    f = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((out_rows, 128), jnp.uint32),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )
    out = np.asarray(f(jnp.asarray(woff), jnp.asarray(sb_off), jnp.asarray(planes)))

    # expected: concatenated content rows
    exp = []
    for i in range(NSB):
        for j in range(E):
            exp.append(planes[i, j, :rows[i, j]])
    exp = np.concatenate(exp, axis=0)
    got = out[: exp.shape[0]]
    ok = np.array_equal(got, exp)
    print("placement OK:", ok)
    if not ok:
        bad = np.nonzero(~(got == exp).all(axis=1))[0]
        print("first bad rows:", bad[:10])


if __name__ == "__main__":
    main()
