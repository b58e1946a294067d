"""Benchmark: end-to-end device compression+decompression throughput.

Config: 512^3 float32 smooth field, abs eb=1e-3, s=inf, Hybrid transform
(blockwise 8^3 local levels fused in one Pallas pass + global remainder;
reference HybridHierarchyCompressor), BFP lossless (the TPU-native
width-sorted prefix codec, lossless/bfp.py).
Matches the reference's own throughput-timer semantics (Timer around
Compressor::Compress/Decompress, device arrays in and out —
reference: CompressionLowLevel/Compressor.hpp:205-289): the timed region is
the full device pipeline (decompose -> levelwise quantize -> BFP pack, and
BFP unpack -> dequantize -> recompose). Host<->device bulk staging is
excluded: on this rig the accelerator is behind a ~4 MB/s relay tunnel that
would measure the tunnel, not the compressor.

Timing method: each rep is synced by exactly ONE relay round trip (a
one-element readback of the output — block_until_ready returns early
through this rig's relay AND costs its own ~25 ms round trip, so it is
not used in the timed loop; measured in scripts/prof_calib.py: a trivial
537 MB elementwise op times at 2.8 ms with one sync vs 27.6 ms with two).
The separately-measured readback floor (~25 ms of pure tunnel latency,
not device time) is subtracted. Dispatching reps back-to-back without
syncing is NOT used: queued whole-pipeline executions hold their output
buffers and the resulting HBM pressure stalls the device.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "GB/s", "vs_baseline": N}
vs_baseline is against the 50 GB/s/chip north star from BASELINE.md.
"""

import json
import math
import sys
import time

import numpy as np


def make_field(n: int):
    """Smooth multi-mode 3D field, generated on device."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def gen():
        x = jnp.linspace(0.0, 1.0, n, dtype=jnp.float32)
        X = x[:, None, None]
        Y = x[None, :, None]
        Z = x[None, None, :]
        rng = np.random.default_rng(42)
        v = jnp.zeros((n, n, n), jnp.float32)
        for _ in range(6):
            kx, ky, kz = rng.integers(1, 9, 3)
            amp = float(rng.uniform(0.3, 1.0))
            ph = float(rng.uniform(0, 2 * np.pi))
            v = v + amp * jnp.sin(2 * np.pi * (kx * X + ky * Y + kz * Z) + ph)
        return v

    return gen()


def run(n: int = 512, tol: float = 1e-3, reps: int = 8):
    import jax
    import jax.numpy as jnp

    import mgard_tpu
    import mgard_tpu.highlevel as H
    from mgard_tpu.hierarchy import get_hierarchy
    from mgard_tpu.lossless import bfp
    from mgard_tpu.ops.hybrid import hybrid_l_total, pad_to8, remainder_shape

    on_tpu = jax.default_backend() == "tpu"
    shape = (n, n, n)
    nl = 3
    padded = pad_to8(shape)
    cfg = mgard_tpu.Config()
    rem_hier = get_hierarchy(remainder_shape(padded, nl), np.float32, None, cfg)
    q = H._hybrid_quantizer(tol, hybrid_l_total(padded, nl, rem_hier))
    fused = H._hybrid_fused_ok(padded, np.float32)
    v = make_field(n)
    nbytes = n * n * n * 4
    N = n * n * n
    Ntot = N + int(np.prod(rem_hier.shape))
    sb = bfp.SB_BLOCKS if on_tpu else bfp.SB_BLOCKS_SMALL
    npad = bfp._pad_to(Ntot, sb)
    NB = npad // 32
    NC = NB // bfp.CHUNK
    K, E = 6, bfp.E_DEFAULT
    exc_cap = 8192

    quant = jnp.asarray(q, jnp.float32)

    @jax.jit
    def compress_fn(v, quant):
        sym = H._compress_core_hybrid(v, quant, padded, nl, rem_hier, fused,
                                      zgroup=True)
        if npad != Ntot:
            sym = jnp.concatenate([sym, jnp.zeros(npad - Ntot, jnp.int32)])
        return bfp.encode_core(sym, K, E, sb, exc_cap, on_tpu)

    @jax.jit
    def decompress_fn(base, crl, resid2d, exc_ids, exc_blocks, quant):
        sym = bfp.decode_core(base, crl, resid2d, exc_ids, exc_blocks,
                              K, E, sb, on_tpu, NB)[:Ntot]
        return H._decompress_core_hybrid(
            sym, quant, shape, padded, nl, rem_hier, fused, zgroup=True
        )

    # ---- compile + correctness
    t0 = time.time()
    out = compress_fn(v, quant)
    base, crl, resid2d, resid_rows, exc_ids, exc_blocks, exc_count = out
    total_i = int(resid_rows) * 128
    tc_compile = time.time() - t0
    print(f"# compile+first compress: {tc_compile:.1f}s", file=sys.stderr)

    t0 = time.time()
    rec = decompress_fn(base, crl, resid2d, exc_ids, exc_blocks, quant)
    err = float(jax.jit(lambda a, b: jnp.max(jnp.abs(a - b)))(rec, v))
    td_compile = time.time() - t0
    print(f"# compile+first decompress: {td_compile:.1f}s", file=sys.stderr)

    ok = err <= tol
    import struct as _struct

    comp_bytes = (total_i * 4 + K * NB * 4 + NC // 2
                  + int(exc_count) * (4 + bfp.CHUNK * 32 * 4)
                  + _struct.calcsize(bfp._HDR))
    ratio = nbytes / comp_bytes
    print(f"# n={n} err={err:.3e} bound_ok={ok} ratio={ratio:.2f}",
          file=sys.stderr)

    # ---- timed (per-rep sync; subtract the pure readback-latency floor)
    noop = jax.jit(lambda x: x[0, 0, 0] * 1.0)
    float(noop(v))
    floor = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        float(noop(v))
        floor = min(floor, time.perf_counter() - t0)
    print(f"# readback floor: {floor*1e3:.1f} ms", file=sys.stderr)

    def timed(fn, *args):
        out = fn(*args)
        np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[:1])
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            out = fn(*args)
            # ONE sync: the tiny readback (see module docstring)
            _ = np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[:1])
            best = min(best, time.perf_counter() - t0)
        return max(best - floor, 1e-6)

    t_c = timed(compress_fn, v, quant)
    t_d = timed(decompress_fn, base, crl, resid2d, exc_ids, exc_blocks, quant)
    print(
        f"# compress {t_c*1e3:.1f} ms ({nbytes/t_c/1e9:.2f} GB/s), "
        f"decompress {t_d*1e3:.1f} ms ({nbytes/t_d/1e9:.2f} GB/s)",
        file=sys.stderr,
    )

    value = 2 * nbytes / (t_c + t_d) / 1e9
    result = {
        "metric": f"device compress+decompress throughput, {n}^3 f32, eb=1e-3, Hybrid+BFP",
        "value": round(value, 3),
        "unit": "GB/s",
        "vs_baseline": round(value / 50.0, 4),
        "compress_GBps": round(nbytes / t_c / 1e9, 3),
        "decompress_GBps": round(nbytes / t_d / 1e9, 3),
        "ratio": round(ratio, 2),
        "error_bound_ok": bool(ok),
        "compile_s": round(tc_compile + td_compile, 1),
    }
    print(json.dumps(result))
    return result


if __name__ == "__main__":
    n = 512
    for a in sys.argv[1:]:
        if a.startswith("--n="):
            n = int(a.split("=")[1])
    run(n)
