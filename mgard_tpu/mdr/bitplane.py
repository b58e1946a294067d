"""Device bitplane encoder/decoder with error collection.

TPU-native re-design of the reference BPEncoderRegisterBlock
(reference: include/mgard-x/MDR-X/BitplaneEncoder/BPEncoderRegisterBlock.hpp:15-470
— per-thread register bit-transpose of 32-element batches) and the
Max/Squared error collectors (reference: MDR-X/ErrorCollector/).

Here the bit transpose is a whole-array vectorized op: coefficients are
scaled to fixed point against the level exponent, and each of the B
magnitude bitplanes (MSB first) plus the sign plane is packed 32 symbols per
uint32 word via a shift/mask/weighted-sum — the same plane machinery as the
BlockDelta backend. Reconstruction at b planes uses midpoint correction
(+half step on truncated nonzero magnitudes), and the collected per-plane
error tables use the identical rule, so the error estimates are exact.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..lossless.bfx import _bit_transpose32

LANES = 32


# conservative inflation of the fast-path (f32 intermediate) error tables:
# covers the <= 2^-23 relative representation error of the scaled-integer
# residues so the tables stay true upper bounds for retrieval planning
_F32_SLACK = 1.0 + 1e-5
_F32_SLACK_SQ = 1.0 + 1e-4


def _two_stage_sq_sum(d):
    """Sum of squares with bounded f32 accumulation error: f32 squares,
    128-term inner sums, f64 outer sum (inner relative error <= 128*2^-24,
    covered by _F32_SLACK_SQ)."""
    pad = (-d.shape[0]) % 128
    if pad:
        d = jnp.concatenate([d, jnp.zeros((pad,), d.dtype)])
    inner = jnp.sum((d * d).reshape(-1, 128), axis=1, dtype=jnp.float32)
    return jnp.sum(inner.astype(jnp.float64))


@partial(jax.jit, static_argnums=(1,))
def encode_kernel(coeff, B: int):
    """Encode one level's flat coefficients into sign+magnitude bitplanes.

    coeff: (n,) float (n multiple of 32; pad with zeros).
    Returns (planes (B+1, n//32) uint32 [row 0 = signs, rows 1.. = MSB..LSB],
             exp int32 scalar,
             err_max (B+1,), err_sq (B+1,) float64: reconstruction errors
             when using b = 0..B magnitude planes).

    float64 input takes the exact f64 path (error tables bit-match the
    decoder, tested at rtol 1e-12). float32 input takes the TPU fast path:
    ONE widening f64 pass produces (fixed, residue); every per-plane table
    entry is then scaled-integer i32/f32 math — on TPU the f64 b-loop was
    ~30 emulated full-array passes and dominated MDR refactor time.
    The f32 tables carry a +1e-5 relative inflation so they remain true
    upper bounds (matching the reference's data-precision collectors,
    MDR-X/ErrorCollector/ with T = data type)."""
    n = coeff.shape[0]
    exact = coeff.dtype == jnp.float64
    v = coeff.astype(jnp.float64)
    amax = jnp.max(jnp.abs(v))
    # level exponent: 2^exp >= amax (reference uses frexp-style exponents)
    exp = jnp.where(amax > 0, jnp.ceil(jnp.log2(jnp.maximum(amax, 1e-300))), 0.0)
    exp = exp.astype(jnp.int32)
    scale = jnp.exp2((B - 1) - exp.astype(jnp.float64))
    p = jnp.abs(v) * scale
    fixed = jnp.minimum(jnp.round(p), jnp.float64(2 ** (B - 1) - 1)).astype(
        jnp.uint32
    )
    sign = (coeff < 0).astype(jnp.uint32)

    # ALL planes in one 32x32 bit-transpose butterfly (5 passes) instead of
    # B+1 separate shift/mask/weighted-sum passes: pack the sign into bit B
    # of the fixed word, transpose, and reorder rows (B <= 31 always: the
    # magnitude uses B-1 bits)
    m = n // LANES
    combined = (fixed | (sign << jnp.uint32(min(B, 31)))).reshape(m, LANES)
    zt = _bit_transpose32(combined.T)  # (32, m): row j = bit j across words
    if B >= 32:
        # bit 31 carries the sign (magnitude tops out at 2^31 - 1, so the
        # true bit-31 magnitude plane is identically zero)
        planes = jnp.concatenate(
            [zt[31][None], jnp.zeros((1, m), jnp.uint32), zt[30::-1]], axis=0
        )
    else:
        planes = jnp.concatenate(
            [zt[B][None], zt[B - 1 :: -1][:B]], axis=0
        )  # (B+1, m): row 0 = signs, rows 1.. = MSB..LSB

    inv_scale = 1.0 / scale
    err_max = []
    err_sq = []
    if exact:
        signf = jnp.where(sign == 1, -1.0, 1.0)
        for b in range(B + 1):
            if b == 0:
                rec = jnp.zeros_like(v)
            else:
                keep = jnp.uint32(0xFFFFFFFF) << jnp.uint32(B - b)
                mag = fixed & keep
                half = jnp.where(
                    (b < B) & (mag > 0),
                    jnp.uint32(1) << jnp.uint32(max(B - b - 1, 0)), 0
                ).astype(jnp.float64)
                rec = signf * (mag.astype(jnp.float64) + half) * inv_scale
            diff = v - rec
            err_max.append(jnp.max(jnp.abs(diff)))
            err_sq.append(jnp.sum(diff * diff))
    else:
        # |v|*scale = fixed + r  =>  |v - rec| = |low_b - half_b + r| / scale
        r = (p - fixed.astype(jnp.float64)).astype(jnp.float32)
        fxi = fixed.astype(jnp.int32)
        for b in range(B + 1):
            if b == 0:
                d = fxi.astype(jnp.float32) + r
            else:
                low = fxi & jnp.int32((1 << (B - b)) - 1)
                mag = fxi - low
                half = jnp.where(
                    (b < B) & (mag > 0), jnp.int32(1 << max(B - b - 1, 0)), 0
                )
                d = (low - half).astype(jnp.float32) + r
            err_max.append(
                jnp.max(jnp.abs(d)).astype(jnp.float64) * inv_scale * _F32_SLACK
            )
            err_sq.append(
                _two_stage_sq_sum(d) * inv_scale * inv_scale * _F32_SLACK_SQ
            )
    return planes, exp, jnp.stack(err_max), jnp.stack(err_sq)


@partial(jax.jit, static_argnums=(2, 3, 4))
def decode_kernel(planes, exp, B: int, b: int, out_dtype=jnp.float64):
    """Reconstruct coefficients from the sign plane + the b leading
    magnitude planes. planes: (1+b, m) uint32. Returns (m*32,) out_dtype
    (f32 output computes in f32 — reconstruction precision beyond the data
    dtype is unobservable, and f64 is emulated on TPU)."""
    m = planes.shape[1]
    ft = jnp.dtype(out_dtype)
    lanes = jnp.arange(LANES, dtype=jnp.uint32)[None, :]
    sign_bits = (planes[0][:, None] >> lanes) & jnp.uint32(1)
    mag = jnp.zeros((m, LANES), jnp.uint32)
    for i in range(b):
        bit = (planes[1 + i][:, None] >> lanes) & jnp.uint32(1)
        mag = mag | (bit << jnp.uint32(B - 1 - i))
    half = jnp.where(
        (mag > 0) & (b < B), jnp.uint32(1) << jnp.uint32(max(B - b - 1, 0)), 0
    )
    signf = jnp.where(sign_bits == 1, ft.type(-1.0), ft.type(1.0))
    inv_scale = jnp.exp2(exp.astype(ft) - (B - 1))
    vals = signf * (mag + half).astype(ft) * inv_scale
    return vals.reshape(m * LANES)


# ----------------------------------------------------------------------
# NegaBinary encoding (reference: NegaBinaryBPEncoder, MDR/BitplaneEncoder/
# and the EncodeNegaBinary path of BPEncoderRegisterBlock.hpp:183): signed
# fixed-point values are mapped to base(-2) digits, removing the separate
# sign plane; truncating trailing planes still yields a signed value.
# ----------------------------------------------------------------------
def _nb_mask(B: int) -> int:
    """0b1010...10 over B bits (weights of the odd, negative, positions)."""
    m = 0
    for j in range(1, B, 2):
        m |= 1 << j
    return m


@partial(jax.jit, static_argnums=(1,))
def encode_kernel_negabinary(coeff, B: int):
    """NegaBinary variant of encode_kernel.

    Returns (planes (B, n//32) uint32 [rows = MSB..LSB, no sign plane],
    exp, err_max (B+1,), err_sq (B+1,)). The fixed-point scale uses B-2
    fraction bits so both signs fit the B-bit negabinary range
    [-(2/3)2^B, (1/3)2^B).

    Same dtype split as encode_kernel: f64 input -> exact f64 tables; f32
    input (and B <= 30 so the digit arithmetic fits i32) -> one widening
    pass + scaled-integer per-plane tables with +1e-5 inflation."""
    n = coeff.shape[0]
    exact = coeff.dtype == jnp.float64 or B > 30
    v = coeff.astype(jnp.float64)
    amax = jnp.max(jnp.abs(v))
    exp = jnp.where(amax > 0, jnp.ceil(jnp.log2(jnp.maximum(amax, 1e-300))), 0.0)
    exp = exp.astype(jnp.int32)
    scale = jnp.exp2((B - 2) - exp.astype(jnp.float64))
    lim = float(2 ** (B - 2) - 1)
    p = v * scale
    fixed = jnp.clip(jnp.round(p), -lim, lim).astype(jnp.int64)
    M = _nb_mask(B)
    u = ((fixed + M) ^ M).astype(jnp.uint32)  # B-bit negabinary digits

    # all B planes in one 32x32 bit-transpose butterfly (see encode_kernel)
    m = n // LANES
    zt = _bit_transpose32(u.reshape(m, LANES).T)  # (32, m)
    planes = zt[B - 1 :: -1][:B]  # (B, m): MSB first

    inv_scale = 1.0 / scale
    err_max = []
    err_sq = []
    if exact:
        for b in range(B + 1):
            if b == 0:
                rec = jnp.zeros_like(v)
            else:
                keep = jnp.uint32(((1 << B) - 1) & ~((1 << (B - b)) - 1))
                ut = u & keep
                xt = (ut.astype(jnp.int64) ^ M) - M
                rec = xt.astype(jnp.float64) * inv_scale
            diff = v - rec
            err_max.append(jnp.max(jnp.abs(diff)))
            err_sq.append(jnp.sum(diff * diff))
    else:
        # v*scale = fixed + r (signed) => |v - xt/scale| = |fixed - xt + r|/scale
        r = (p - fixed.astype(jnp.float64)).astype(jnp.float32)
        fxi = fixed.astype(jnp.int32)
        Mi = jnp.int32(M)
        for b in range(B + 1):
            if b == 0:
                d = fxi.astype(jnp.float32) + r
            else:
                keep = jnp.int32(((1 << B) - 1) & ~((1 << (B - b)) - 1))
                ut = jnp.bitwise_and(u.astype(jnp.int32), keep)
                xt = jnp.bitwise_xor(ut, Mi) - Mi
                d = (fxi - xt).astype(jnp.float32) + r
            err_max.append(
                jnp.max(jnp.abs(d)).astype(jnp.float64) * inv_scale * _F32_SLACK
            )
            err_sq.append(
                _two_stage_sq_sum(d) * inv_scale * inv_scale * _F32_SLACK_SQ
            )
    return planes, exp, jnp.stack(err_max), jnp.stack(err_sq)


@partial(jax.jit, static_argnums=(2, 3, 4))
def decode_kernel_negabinary(planes, exp, B: int, b: int, out_dtype=jnp.float64):
    """Reconstruct from the b leading negabinary planes.
    planes: (b, m) uint32. Returns (m*32,) out_dtype."""
    m = planes.shape[1]
    ft = jnp.dtype(out_dtype)
    lanes = jnp.arange(LANES, dtype=jnp.uint32)[None, :]
    u = jnp.zeros((m, LANES), jnp.uint32)
    for i in range(b):
        bit = (planes[i][:, None] >> lanes) & jnp.uint32(1)
        u = u | (bit << jnp.uint32(B - 1 - i))
    M = _nb_mask(B)
    x = (u.astype(jnp.int64) ^ M) - M
    inv_scale = jnp.exp2(exp.astype(ft) - (B - 2))
    return (x.astype(ft) * inv_scale).reshape(m * LANES)


def encode_level(coeff_flat, B: int):
    """Host wrapper: pad to a multiple of 32 and encode."""
    n = int(coeff_flat.shape[0])
    pad = (-n) % LANES
    if pad:
        coeff_flat = jnp.concatenate(
            [coeff_flat, jnp.zeros((pad,), coeff_flat.dtype)]
        )
    planes, exp, err_max, err_sq = encode_kernel(coeff_flat, B)
    return planes, int(exp), np.asarray(err_max), np.asarray(err_sq), n


def decode_level(planes, exp: int, B: int, b: int, n: int):
    """Host wrapper: decode with b magnitude planes, trim padding."""
    vals = decode_kernel(jnp.asarray(planes), jnp.asarray(exp, jnp.int32), B, b)
    return vals[:n]
