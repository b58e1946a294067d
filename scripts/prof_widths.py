"""Save the 512^3 bench field's per-block width array for offline analysis
of plane-truncation keyings (the BFP codec design parameter)."""

import sys

import numpy as np


def main(n=512):
    import jax
    import jax.numpy as jnp
    from functools import partial

    import mgard_tpu
    import mgard_tpu.highlevel as H
    from mgard_tpu.hierarchy import get_hierarchy
    from mgard_tpu.lossless import bfx
    from mgard_tpu.ops.hybrid import hybrid_l_total, pad_to8, remainder_shape
    from bench import make_field

    shape = (n, n, n)
    nl = 3
    padded = pad_to8(shape)
    cfg = mgard_tpu.Config()
    rem_hier = get_hierarchy(remainder_shape(padded, nl), np.float32, None, cfg)
    q = H._hybrid_quantizer(1e-3, hybrid_l_total(padded, nl, rem_hier))
    fused = H._hybrid_fused_ok(padded, np.float32)
    quant = jnp.asarray(q, jnp.float32)
    v = make_field(n)

    @partial(jax.jit, static_argnames=("zgroup",))
    def widths_of(v, quant, zgroup):
        sym = H._compress_core_hybrid(v, quant, padded, nl, rem_hier, fused,
                                      zgroup=zgroup)
        nb = sym.shape[0] // 32
        zz = bfx._zigzag(sym[: nb * 32])
        zt = zz.reshape(-1, 32).T
        return bfx._widths_from_zt(zt)

    for zg in (False, True):
        w = np.asarray(widths_of(v, quant, zg)).astype(np.uint8)
        np.save(f"/tmp/widths_zg{int(zg)}.npy", w)
        print(f"saved /tmp/widths_zg{int(zg)}.npy {w.shape}", file=sys.stderr)


if __name__ == "__main__":
    main()
