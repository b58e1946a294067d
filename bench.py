"""Benchmark: end-to-end device compression+decompression throughput.

Config: 512^3 float32 smooth field, abs eb=1e-3, s=inf, MultiDim transform,
Huffman lossless (the reference's defaults: Config.cpp:33-68). Matches the
reference's own throughput-timer semantics (Timer around
Compressor::Compress/Decompress, device arrays in and out —
reference: CompressionLowLevel/Compressor.hpp:205-289): timed region covers
the full device pipeline (decompose -> quantize -> Huffman encode, and
decode -> dequantize -> recompose) including the host codebook round trips,
excluding host<->device bulk staging (this rig's TPU tunnel moves D2H at
~4 MB/s, which would measure the tunnel, not the compressor).

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
            v = v + amp * jnp.sin(
                2 * np.pi * (kx * X + ky * Y + kz * Z) + ph
            )
        return v

    return gen()


def run(n: int = 512, tol: float = 1e-3, reps: int = 3):
    import jax
    import jax.numpy as jnp

    import mgard_tpu
    from mgard_tpu.config import Config
    from mgard_tpu.dtypes import error_bound_type
    from mgard_tpu.hierarchy import get_hierarchy
    from mgard_tpu.lossless import huffman as H
    from mgard_tpu.ops import quantize as Q
    from mgard_tpu.ops.refactor import decompose, recompose

    cfg = Config()
    hier = get_hierarchy((n, n, n), np.float32)
    v = make_field(n)
    v.block_until_ready()
    nbytes = n * n * n * 4
    dict_size = cfg.huff_dict_size
    K = cfg.huff_block_size

    quant = jnp.asarray(
        hier.quantizers(tol, math.inf, 0.0, error_bound_type.ABS, orthogonal_projection=False)
    )
    cap = max(4096, hier.total_num_elems // 64)

    @jax.jit
    def stage1(v, quant):
        dec = decompose(v, hier, orthogonal=False)
        res = Q.quantize_with_scales(dec, hier, quant, True, True, dict_size, cap)
        hist = jnp.bincount(res.quantized.ravel(), length=dict_size)
        return res, hist

    @jax.jit
    def stage2_decode(words, chunk_starts, quant, lut, out_idx, out_val):
        C = (hier.total_num_elems + K - 1) // K
        syms = H.decode_kernel(words, chunk_starts, K, C, lut=lut)
        syms = syms[: hier.total_num_elems]
        dec = Q.dequantize_with_scales(
            syms, hier, quant, True, True, dict_size, out_idx, out_val
        )
        return recompose(dec, hier, orthogonal=False)

    def compress_device():
        res, hist = stage1(v, quant)
        hist_h = np.array(hist)  # small D2H: codebook input (reference builds
        # its codebook on-device; host build is our idiomatic substitute)
        lens = H.package_merge_lengths(hist_h)
        codes = H.canonical_codes(lens)
        pad = (K - hier.total_num_elems % K) % K
        symf = res.quantized.ravel()
        if pad:
            symf = jnp.concatenate([symf, jnp.full((pad,), int(np.argmax(hist_h)), jnp.int32)])
        words, chunk_bits, total = H.encode_kernel(
            symf, jnp.asarray(lens.astype(np.int32)), jnp.asarray(codes), K
        )
        total_i = int(total)  # small D2H sync
        return res, lens, codes, words, chunk_bits, total_i

    # ---- warmup / compile
    t0 = time.time()
    res, lens, codes, words, chunk_bits, total = compress_device()
    print(f"# compile+first compress: {time.time()-t0:.1f}s", file=sys.stderr)

    lut = jnp.asarray(H.decode_lut(lens, codes))
    wc = (np.asarray(chunk_bits) + 31) >> 5
    starts = jnp.asarray((np.cumsum(wc) - wc).astype(np.int32))
    t0 = time.time()
    rec = stage2_decode(words, starts, quant, lut, res.outlier_idx, res.outlier_val)
    rec.block_until_ready()
    print(f"# compile+first decompress: {time.time()-t0:.1f}s", file=sys.stderr)

    # correctness: error bound (computed on device; D2H is one scalar)
    err = float(jax.jit(lambda a, b: jnp.max(jnp.abs(a - b)))(rec, v))
    ok = err <= tol
    n_out = int(res.outlier_count)
    comp_bytes = total * 4 + n_out * 16 + int((np.asarray(lens) > 0).sum()) * 2
    ratio = nbytes / comp_bytes
    print(
        f"# n={n} err={err:.3e} bound_ok={ok} ratio={ratio:.2f} outliers={n_out}",
        file=sys.stderr,
    )

    # ---- timed
    tc = []
    for _ in range(reps):
        t0 = time.time()
        out = compress_device()
        tc.append(time.time() - t0)
    td = []
    for _ in range(reps):
        t0 = time.time()
        rec = stage2_decode(words, starts, quant, lut, res.outlier_idx, res.outlier_val)
        rec.block_until_ready()
        td.append(time.time() - t0)
    t_c, t_d = min(tc), min(td)
    print(f"# compress {t_c*1e3:.1f} ms ({nbytes/t_c/1e9:.2f} GB/s), "
          f"decompress {t_d*1e3:.1f} ms ({nbytes/t_d/1e9:.2f} GB/s)", file=sys.stderr)

    value = 2 * nbytes / (t_c + t_d) / 1e9
    result = {
        "metric": f"device compress+decompress throughput, {n}^3 f32, eb=1e-3, Huffman",
        "value": round(value, 3),
        "unit": "GB/s",
        "vs_baseline": round(value / 50.0, 4),
        "compress_GBps": round(nbytes / t_c / 1e9, 3),
        "decompress_GBps": round(nbytes / t_d / 1e9, 3),
        "ratio": round(ratio, 2),
        "error_bound_ok": bool(ok),
    }
    print(json.dumps(result))
    return result


if __name__ == "__main__":
    n = 512
    for a in sys.argv[1:]:
        if a.startswith("--n="):
            n = int(a.split("=")[1])
    run(n)
